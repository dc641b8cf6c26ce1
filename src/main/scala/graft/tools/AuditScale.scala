package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{RelationalExt, Sketches, Temporal, TextAnalysis}

/** Scaling probe for the round-7 third-batch operators: basket rules
  * (q165) on order-shifted lineitem replication, doc keywords (q176) on
  * doc-shifted documents, and the three event audits (q167 attribution,
  * q170 skew audit, q174 value drift) on user-shifted events, at
  * 1×/4×/16×. Key-shifted replication grows the KEY population with
  * per-key activity fixed — the axis each operator claims linearity in
  * (per-order pair fan, per-doc tf census, per-user window state).
  * Numbers recorded in SCALING.md.
  */
object AuditScale {
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
      println(f"[auditscale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val liBase = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
    val no = liBase.agg(max(col("l_orderkey"))).head().getLong(0) + 1
    val docBase = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val nd = docBase.agg(max(col("doc_id"))).head().getLong(0) + 1
    val evBase = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
    val nu = evBase.agg(max(col("user_id"))).head().getLong(0) + 1
    for (r <- Seq(1, 4, 16)) {
      val li = (0 until r).map(i => liBase
          .select((col("l_orderkey") + lit(i * no)).as("l_orderkey"),
            col("l_partkey")))
        .reduce(_ union _).repartition(32).localCheckpoint(true)
      time(s"q165 basket rules ${r}x (${li.count()} lineitems)") {
        RelationalExt.basketRules(li).count()
      }
      li.unpersist()
      val docs = (0 until r).map(i => docBase
          .select((col("doc_id") + lit(i * nd)).as("doc_id"), col("text")))
        .reduce(_ union _).repartition(32).localCheckpoint(true)
      time(s"q176 doc keywords ${r}x (${docs.count()} docs)") {
        TextAnalysis.docKeywords(docs).count()
      }
      docs.unpersist()
      val ev = (0 until r).map(i => evBase
          .select(col("event_id"), col("ts"),
            (col("user_id") + lit(i * nu)).as("user_id"),
            col("event_type"), col("value")))
        .reduce(_ union _).repartition(32).localCheckpoint(true)
      time(s"q167 attribution ${r}x (${ev.count()} events)") {
        Temporal.lastTouchAttribution(ev).count()
      }
      time(s"q170 skew audit ${r}x") {
        Sketches.skewAudit(ev, "user_id").count()
      }
      time(s"q174 value drift ${r}x") {
        Temporal.valueDrift(ev).count()
      }
      ev.unpersist()
    }
    spark.stop()
  }
}
