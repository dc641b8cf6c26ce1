package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Dedup

/** Scaling probe for the dedup path: runs q46 (LSH pairs) and q66
  * (components) on 1×/4×/16× replications of the sf0.1 corpus with
  * shifted ids. Replication is the ADVERSARIAL duplicate regime: every
  * text exists r times, so true pairs grow ∝ r² — exactly the load that
  * breaks all-pairs designs — while honest corpus growth only adds
  * linear signature work. Numbers recorded in SCALING.md.
  */
object ScaleSmoke {
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
    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val n = base.count()
    // r9 directive: measured axes must extend past 16× — SPARK_GRAFT_SCALE_REPS
    // (comma-separated) overrides the default ladder, e.g. "1,16,64"
    val reps = sys.env.get("SPARK_GRAFT_SCALE_REPS")
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(1, 4, 16))
    for (r <- reps) {
      val docs = (0 until r).map(i =>
          base.select((col("doc_id") + lit(i * 10L * n)).as("doc_id"), col("text")))
        .reduce(_ union _)
        .repartition(32).localCheckpoint(true)
      println(s"[scale] corpus ${r}x = ${docs.count()} docs")
      val pairs = time(s"q46 pairs ${r}x") {
        val p = Dedup.minhashLshPairs(docs, 4, 5).localCheckpoint(true)
        p.count()
      }
      println(s"[scale]   pairs=$pairs")
      val comps = time(s"q66 components ${r}x") {
        Dedup.connectedComponents(
          Dedup.minhashLshPairs(docs, 4, 5).select(col("a_id"), col("b_id")))
          .agg(countDistinct(col("label"))).head().getLong(0)
      }
      println(s"[scale]   clusters=$comps")
      // r9 collapse-aware composition: CC over REP pairs + member labeling
      // through the mapping — the duplication regime never shuffles the
      // quadratic expanded edge set (the q66 row above does, by contract)
      val kept = time(s"dedupCorpus survivors ${r}x") {
        Dedup.dedupCorpus(docs, 4, 5).count()
      }
      println(s"[scale]   kept=$kept")
    }
    spark.stop()
  }
}
