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

  /** The PRE-round-8 attribution frame, kept here as a measurement foil:
    * collect_list over rowsBetween(unboundedPreceding, -1) + post-filter —
    * the shape the r7 verdict flagged, where per-purchase window state is
    * the user's ENTIRE history. Never used by the library; exists so the
    * bot-skew axis can print a measured before/after pair. */
  private def unboundedMultiTouch(
      events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val horizonUs = 7L * 86400000000L
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
      .withColumn("tl", collect_list(
        when(col("event_type") =!= "purchase",
          struct(col("t").as("tt"), col("event_type").as("ty")))).over(byUser))
      .filter(col("event_type") === "purchase")
      .withColumn("tl2", expr(s"filter(tl, x -> t - x.tt <= ${horizonUs}L)"))
      .withColumn("n", size(col("tl2")).cast("long"))
      .select(col("n"), posexplode_outer(col("tl2")).as(Seq("pos", "x")))
      .select(
        when(col("x").isNull, lit("none")).otherwise(col("x.ty")).as("touch"),
        when(col("x").isNull, lit(1000000L))
          .otherwise(expr("cast(1000000 as bigint) div n")).as("credit"))
      .groupBy(col("touch")).agg(sum(col("credit")).as("credit_micro"))
  }

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
    if (sys.env.get("SPARK_GRAFT_BOT").contains("1")) {
      // Bot-skew axis (r7 verdict task 2): ONE user owns ~10% of all
      // events, and replication extends its HISTORY (time-shifted copies,
      // so in-horizon density stays constant while history length grows
      // r×). The RANGE frame's per-purchase state is the in-horizon touch
      // count — flat in r — while the legacy unbounded frame materializes
      // the full history per purchase: O(r²) total work. Same census
      // math, same input, only the frame differs.
      val base = Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts"),
          when(col("event_id") % 10 === 0, lit(-1L)).otherwise(col("user_id"))
            .as("user_id"),
          col("event_type"), col("value"))
      val Array(tmin, tmax) = base
        .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
        .head().toSeq.map(_.asInstanceOf[Long]).toArray
      val spanUs = tmax - tmin + 8L * 86400000000L
      val ne = base.agg(max(col("event_id"))).head().getLong(0) + 1
      val reps = sys.env.get("SPARK_GRAFT_SCALE_REPS")
        .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(1, 4, 8))
      for (r <- reps) {
        val evB = (0 until r).map(i => base.select(
            (col("event_id") + lit(i * ne)).as("event_id"),
            timestamp_micros(unix_micros(col("ts")) + lit(i * spanUs)).as("ts"),
            when(col("user_id") =!= -1L && lit(i) > 0,
              col("user_id") + lit(i * 1000000L)).otherwise(col("user_id"))
              .as("user_id"),
            col("event_type"), col("value")))
          .reduce(_ union _).repartition(32).localCheckpoint(true)
        val botN = evB.filter(col("user_id") === -1L).count()
        println(s"[auditscale] bot axis ${r}x: ${evB.count()} events, " +
          s"$botN bot-owned")
        time(s"q178 bot-skew ${r}x BOUNDED range frame") {
          Temporal.multiTouchAttribution(evB).count()
        }
        // the legacy foil is O(r²) BY CONSTRUCTION (that's what it
        // demonstrates) — at 64× it would run for hours; the r8 SCALING
        // table already pins its quadratic curve through 8×
        if (r <= 8) time(s"q178 bot-skew ${r}x UNBOUNDED legacy frame") {
          unboundedMultiTouch(evB).count()
        }
        evB.unpersist()
      }
      spark.stop()
      return
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
    val mainReps = sys.env.get("SPARK_GRAFT_MAIN_REPS")
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(1, 4, 16))
    for (r <- mainReps) {
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
      // r8 text-census tier on the same doc axis: sources stay fixed, so
      // the KS/overlap pair frames are census-bounded — the claim under test
      val docsS = (0 until r).map(i => Tables.documents(spark, sfDir)
          .select((col("doc_id") + lit(i * nd)).as("doc_id"), col("text"),
            col("source")))
        .reduce(_ union _).repartition(32).localCheckpoint(true)
      time(s"q200 length KS ${r}x") {
        TextAnalysis.lengthKs(docsS).count()
      }
      time(s"q220 vocab overlap ${r}x") {
        TextAnalysis.vocabOverlap(docsS).count()
      }
      docsS.unpersist()
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
      // r8 analytics tier: user-keyed window ledger, census self-join,
      // distribution-telescoped Gini — the per-user / census bounds are
      // the linearity claim this axis checks
      time(s"q204 growth accounting ${r}x") {
        Temporal.growthAccounting(ev).count()
      }
      time(s"q202 rate correlation ${r}x") {
        Temporal.rateCorrelation(ev).count()
      }
      time(s"q205 engagement gini ${r}x") {
        Temporal.engagementGini(ev).count()
      }
      ev.unpersist()
    }
    spark.stop()
  }
}
