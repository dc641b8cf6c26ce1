package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Fuzzy

/** Scaling probe for the SymSpell edit-distance join (q110's operator):
  * replications (SPARK_GRAFT_SCALE_REPS, default 1,4,16) of the sf0.1
  * title corpus with shifted ids — the adversarial regime where every
  * title exists r times, so true pairs grow ∝ r². Since the r9 identity
  * collapse, neighborhood and candidate work are per DISTINCT key
  * (replication-invariant) and the quadratic output rides narrow id
  * joins — this probe measured the before (1,477 s at 64×) and after
  * (4.7 s). Numbers recorded in SCALING.md.
  */
object FuzzyScale {
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
      println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), substring(col("text"), 1, 24).as("title"))
    val n = base.count()
    val reps = sys.env.get("SPARK_GRAFT_SCALE_REPS")
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(1, 4, 16))
    for (r <- reps) {
      val docs = (0 until r).map(i =>
          base.select((col("doc_id") + lit(i * 10L * n)).as("doc_id"), col("title")))
        .reduce(_ union _)
        .repartition(32).localCheckpoint(true)
      println(s"[scale] corpus ${r}x = ${docs.count()} titles")
      val pairs = time(s"q110 edit pairs ${r}x") {
        Fuzzy.editDistancePairs(docs, "title", "doc_id", maxDist = 2).count()
      }
      println(s"[scale]   pairs=$pairs")
    }
    spark.stop()
  }
}
