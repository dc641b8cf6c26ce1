package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scaling probe for the graph/retrieval operators: PageRank and BM25 on
  * 1×/4×/16× replications of the sf0.1 fact tables (shifted keys). The
  * claims under test: q97's cost is the EDGE CENSUS (fact⋈fact join) —
  * iterations run on the ≤nations² aggregated graph and must stay flat as
  * facts replicate; q95's cost is the corpus scan — one stats exchange,
  * no text shuffle, so time scales with rows. Numbers recorded in
  * SCALING.md.
  */
object GraphScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"))
    val nOrd = ord.agg(max("o_orderkey")).head().getLong(0) + 1
    val docsBase = Tables.documents(spark, sfDir)
    val nD = docsBase.count()
    val reps = sys.env.get("SPARK_GRAFT_SCALE_REPS")
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(1, 4, 16))
    for (r <- reps) {
      // replicate the FACTS (shifted order keys); dims stay fixed — the
      // regime a real warehouse scales in
      val liR = (0 until r).map(i => li.select(
          (col("l_orderkey") + lit(i * nOrd)).as("l_orderkey"), col("l_suppkey")))
        .reduce(_ union _).repartition(32).localCheckpoint(true)
      val ordR = (0 until r).map(i => ord.select(
          (col("o_orderkey") + lit(i * nOrd)).as("o_orderkey"), col("o_custkey")))
        .reduce(_ union _).repartition(32).localCheckpoint(true)
      println(s"[scale] facts ${r}x = ${liR.count()} lineitems, ${ordR.count()} orders")
      val census = time(s"q97 edge census ${r}x (fact⋈fact + dims + partial agg)") {
        val e = liR
          .join(ordR, col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(spark, sfDir)
            .select(col("c_custkey"), col("c_nationkey").as("src")),
            col("o_custkey") === col("c_custkey"))
          .join(Tables.supplier(spark, sfDir)
            .select(col("s_suppkey"), col("s_nationkey").as("dst")),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy("src", "dst").agg(count(lit(1)).cast("double").as("w"))
          .localCheckpoint(true)
        e
      }
      println(s"[scale]   census edges = ${census.count()}")
      time(s"q97 5 PageRank iterations ${r}x (must stay FLAT)") {
        graft.operators.Graph.pageRank(census, "src", "dst", "w", 5).count()
      }
      val docsR = (0 until r).map(i => docsBase.select(
          (col("doc_id") + lit(i * 10L * nD)).as("doc_id"),
          col("text"), col("lang"), col("source"), col("n_chars")))
        .reduce(_ union _).repartition(32).localCheckpoint(true)
      time(s"q95 bm25TopK ${r}x (${docsR.count()} docs, scan-bound)") {
        graft.operators.Retrieval.bm25TopK(docsR,
          Seq("dup", "spark", "merge", "vector"), 20).count()
      }
      time(s"q96 invertedIndex ${r}x") {
        graft.operators.Retrieval.invertedIndex(docsR, 4, 12).count()
      }
    }
    spark.stop()
  }
}
