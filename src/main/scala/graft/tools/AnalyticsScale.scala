package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Similarity, Sketches, Temporal}

/** Scaling probe for the round-7 second-batch operators: churn hazard
  * (q142), RFM segmentation (q157), HLL audience overlap (q150) on
  * 1×/4×/16× user-shifted replications of the sf0.1 events table, and
  * PCA power iteration (q145) on vec-shifted embeddings. User-shifted
  * replication multiplies the USER population while keeping per-user
  * activity fixed — the axis the three event operators claim to be
  * census-bounded in (day-horizon census / user census / register
  * tables); PCA's covariance build is the one corpus-linear stage, so it
  * should scale ~linearly while the 8 power rounds stay constant.
  * Numbers recorded in SCALING.md.
  */
object AnalyticsScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[analyticsscale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val evBase = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val nu = evBase.agg(max(col("user_id"))).head().getLong(0) + 1
    val embBase = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val nv = embBase.agg(max(col("vec_id"))).head().getLong(0) + 1
    val mainReps = sys.env.get("SPARK_GRAFT_MAIN_REPS")
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(1, 4, 16))
    for (r <- mainReps) {
      val ev = (0 until r).map(i => evBase
          .select(col("event_id"), col("ts"),
            (col("user_id") + lit(i * nu)).as("user_id"),
            col("event_type"), col("value")))
        .reduce(_ union _).repartition(32).localCheckpoint(true)
      val n = ev.count()
      time(s"q142 churn hazard ${r}x ($n events)") {
        Temporal.churnHazard(ev).count()
      }
      time(s"q157 rfm segments ${r}x") {
        Temporal.rfmSegments(ev).count()
      }
      time(s"q150 audience overlap ${r}x") {
        Sketches.audienceOverlap(ev, Sketches.Ov.a, Sketches.Ov.b).count()
      }
      if (r <= 4) { // 16× embeddings = 80k × 4096-fan = 327M cov rows: 4× is the honest point
        val emb = (0 until r).map(i => embBase
            .select((col("vec_id") + lit(i * nv)).as("vec_id"), col("embedding")))
          .reduce(_ union _).repartition(32).localCheckpoint(true)
        time(s"q145 pca power ${r}x (${emb.count()} vectors)") {
          Similarity.pcaPower(emb).count()
        }
      }
      ev.unpersist()
    }
    spark.stop()
  }
}
