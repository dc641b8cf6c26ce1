package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graftbridge.{AsOfJoinPlan, AsOfJoinStrategy, PlanBridge}

/** User API for the native as-of join ([[org.apache.spark.sql.graftbridge.AsOfJoinExec]]):
  * for each left row, the columns of the latest right row with the same
  * key and `right.<timeR> <= left.<timeL>` (left-outer: no match → nulls).
  *
  * Semantics match DuckDB's `ASOF JOIN` (ties at equal timestamps DO
  * match) — which is exactly how the q67 gate oracle replays it.
  *
  * Column names must be disambiguated by the caller (alias the right side
  * before joining) — like any self-join, both sides' columns survive.
  */
object AsOfJoin {

  /** Idempotently add the planner strategy to the session. (`GraftExtensions`
    * injects it at session build for deployment; this covers ad-hoc
    * sessions.) */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** `broadcastRight`: Some(true) forces the broadcast variant (fact side
    * never shuffles), Some(false) forces the co-partitioned merge, None
    * auto-selects from the right side's stats vs the session's
    * autoBroadcastJoinThreshold. */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      broadcastRight: Option[Boolean] = None): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not in [${plan.output.map(_.name).mkString(", ")}]"))
    val (lk, rk) = (attr(lp, leftKey), attr(rp, rightKey))
    // Floating-point join keys are rejected: Spark's built-in joins
    // normalize -0.0 to 0.0 via NormalizeFloatingNumbers, which only
    // rewrites built-in Join nodes — a custom plan would silently treat
    // -0.0 and 0.0 as distinct keys (and hash them apart). Cast or
    // quantize float keys to an exact type upstream.
    Seq(lk, rk).foreach { a =>
      a.dataType match {
        case org.apache.spark.sql.types.FloatType | org.apache.spark.sql.types.DoubleType =>
          throw new IllegalArgumentException(
            s"asofJoin key '${a.name}' is ${a.dataType.simpleString}: floating-point " +
              "keys are not supported (-0.0 vs 0.0 would not match); cast to an exact type")
        case _ =>
      }
    }
    val (lt, rt) = (attr(lp, leftTime), attr(rp, rightTime))
    // Mismatched sides (e.g. int key vs bigint key) would pass analysis but
    // hash-partition the same logical key to different partitions and then
    // ClassCastException inside the interpreted ordering mid-job. Fail at
    // call time instead; the caller casts upstream.
    def requireSameType(what: String, a: org.apache.spark.sql.catalyst.expressions.Attribute,
        b: org.apache.spark.sql.catalyst.expressions.Attribute): Unit =
      require(a.dataType == b.dataType,
        s"asofJoin $what types must match: left '${a.name}' is ${a.dataType.simpleString}, " +
          s"right '${b.name}' is ${b.dataType.simpleString}; cast one side first")
    requireSameType("key", lk, rk)
    requireSameType("time", lt, rt)
    PlanBridge.ofRows(spark, AsOfJoinPlan(lp, rp, lk, rk, lt, rt, broadcastRight))
  }
}
