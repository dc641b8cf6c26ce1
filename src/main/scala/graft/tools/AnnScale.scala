package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Dedup, IvfIndex}

/** Scaling probe for the two at-scale similarity paths the r8 verdict's
  * 64× directive names and no existing tool covers:
  *
  *  - q104 prefix-filtered exact set-similarity join, on doc-shifted
  *    replication of the sf0.1 corpus (adversarial all-duplicates
  *    regime: true pairs grow ∝ r², candidate generation should stay
  *    ∝ r × prefix tokens — the salted token-df census is the claim);
  *  - IVF index build + probed search, on vec-shifted replication of the
  *    embeddings table (identical vectors, distinct ids: assignment and
  *    per-cell layout grow linearly, search cost stays ∝ probed cells,
  *    NOT corpus size — partition pruning is the claim).
  *
  * Reps via SPARK_GRAFT_SCALE_REPS (default "1,16,64"). Numbers recorded
  * in SCALING.md §Round-9.
  */
object AnnScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[annscale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val reps = sys.env.get("SPARK_GRAFT_SCALE_REPS")
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(1, 16, 64))

    val docBase = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val nd = docBase.count()
    val embBase = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val nv = embBase.count()

    for (r <- reps) {
      val docs = (0 until r).map(i =>
          docBase.select((col("doc_id") + lit(i * 10L * nd)).as("doc_id"),
            col("text")))
        .reduce(_ union _).repartition(32).localCheckpoint(true)
      println(s"[annscale] corpus ${r}x = ${docs.count()} docs")
      val pairs = time(s"q104 prefix set-sim pairs ${r}x") {
        Dedup.prefixJaccardPairs(docs, tNum = 4, tDen = 5).count()
      }
      println(s"[annscale]   pairs=$pairs")
      docs.unpersist()

      val embs = (0 until r).map(i =>
          embBase.select((col("vec_id") + lit(i * 10L * nv)).as("vec_id"),
            col("embedding")))
        .reduce(_ union _).repartition(32).localCheckpoint(true)
      println(s"[annscale] vectors ${r}x = ${embs.count()}")
      val dir = java.nio.file.Files.createTempDirectory(s"annscale_$r").toString
      time(s"ivf build ${r}x") { IvfIndex.build(spark, embs, dir, nCells = 16) }
      val queries = embBase.limit(100)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        .localCheckpoint(true)
      val hits = time(s"ivf search 100q ${r}x") {
        IvfIndex.search(spark, dir, queries, k = 5, nProbe = 2).count()
      }
      println(s"[annscale]   hits=$hits")
      embs.unpersist(); queries.unpersist()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
    spark.stop()
  }
}
