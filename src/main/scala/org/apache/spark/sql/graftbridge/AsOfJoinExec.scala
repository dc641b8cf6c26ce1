package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the custom-plan tier of the build ladder (compose
  * built-ins → native `Expression` → custom `LogicalPlan` + `Strategy` +
  * `SparkPlan`): for every left row, append the LATEST right row with the
  * same key and `right.time <= left.time` (left-outer; unmatched → nulls).
  *
  * Lives in the `org.apache.spark.sql` namespace because a physical
  * operator necessarily touches `private[sql]` planner surface
  * (`SparkStrategy.planLater`, interpreted orderings); this file and
  * `ColumnBridge` are the library's only two crossings.
  *
  * Physical contract (what makes it correct AND scale):
  *  - `requiredChildDistribution`: both sides clustered on their key —
  *    EnsureRequirements inserts co-partitioned hash exchanges exactly as
  *    it does for a sort-merge join, so each partition sees every row of
  *    its keys;
  *  - `requiredChildOrdering`: (key, time) ascending on both sides —
  *    Spark inserts the sorts;
  *  - `doExecute`: a single forward merge pass per partition, O(|L|+|R|),
  *    holding ONE candidate right row — never a range product, never a
  *    per-row window buffer (the composed q27 formulation carries a
  *    running window state over the unioned stream instead).
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val nRight = right.output.size
    val leftOut = left.output
    val rightOut = right.output
    // bind as Expression — bindReference[Attribute] would CCE on the
    // returned BoundReference
    val lk = BindReferences.bindReference[Expression](leftKey, leftOut)
    val lt = BindReferences.bindReference[Expression](leftTime, leftOut)
    val rk = BindReferences.bindReference[Expression](rightKey, rightOut)
    val rt = BindReferences.bindReference[Expression](rightTime, rightOut)
    val allOut = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(allOut, allOut)
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      // lookahead right row (copied — execute() reuses row objects)
      var head: InternalRow = null
      var headKey: Any = null
      var headTime: Any = null
      // skip right rows with null key/time: they can never be an as-of
      // match, and the interpreted orderings do not accept nulls.
      // COPY BEFORE EVAL: sort iterators reuse the row wrapper AND (when
      // spilling) recycle the backing pages — object-typed key/time values
      // (e.g. UTF8String) evaluated from the live wrapper would be views
      // into bytes the next next() overwrites, and the saved candKey would
      // then compare against clobbered data.
      def advance(): Unit = {
        head = null
        while (head == null && rIter.hasNext) {
          val r = rIter.next().copy()
          val k = rk.eval(r)
          val t = rt.eval(r)
          if (k != null && t != null) { head = r; headKey = k; headTime = t }
        }
      }
      advance()
      // latest right row consumed so far (candidate), with its key
      var cand: InternalRow = null
      var candKey: Any = null
      lIter.map { lRow =>
        val lKeyV = lk.eval(lRow)
        val lTimeV = lt.eval(lRow)
        // consume right rows that are (key <) or (key ==, time <=) the left
        // row; null left key/time (sorted first) never consumes or matches
        var go = head != null && lKeyV != null && lTimeV != null
        while (go) {
          val c = keyOrd.compare(headKey, lKeyV)
          if (c < 0 || (c == 0 && headTime != null && timeOrd.compare(headTime, lTimeV) <= 0)) {
            cand = head; candKey = headKey
            advance()
            go = head != null
          } else go = false
        }
        val matched = cand != null && lKeyV != null && lTimeV != null &&
          keyOrd.compare(candKey, lKeyV) == 0
        proj(joined(lRow, if (matched) cand else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}

/** Broadcast variant: when the right side is dim-sized, the LEFT (fact)
  * side must not shuffle at all — the defining 100 TB optimization for
  * "enrich events with latest reference data". The right side broadcasts
  * whole; each left partition builds (once) a key → time-sorted-rows map
  * and answers every probe with a binary search. No exchange, no sort on
  * the fact side; `outputPartitioning` is the left child's unchanged. */
case class BroadcastAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val nRight = right.output.size
    val lk = BindReferences.bindReference[Expression](leftKey, left.output)
    val lt = BindReferences.bindReference[Expression](leftTime, left.output)
    val rk = BindReferences.bindReference[Expression](rightKey, right.output)
    val rt = BindReferences.bindReference[Expression](rightTime, right.output)
    val allOut = output
    // The cache key carries the key/time ORDINALS as well as (appId,
    // bcastId): ReuseExchange can hand two as-of joins over the same right
    // side the SAME broadcast, and if they bind different key/time columns
    // their indexes differ — id alone would serve one join the other's.
    val keyOrdinal = right.output.indexWhere(_.exprId == rightKey.exprId)
    val timeOrdinal = right.output.indexWhere(_.exprId == rightTime.exprId)
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions { lIter =>
      // key → (rows, times) sorted by time. Times are evaluated ONCE per
      // row (the sort compares cached keys, not re-evaluated expressions)
      // and the whole built index is memoized per executor, so the build
      // cost is paid once per executor, not once per task. Null key/time
      // rows can never match and are dropped.
      val sorted = BroadcastAsOfJoinExec.indexCache.computeIfAbsent(
        (org.apache.spark.SparkEnv.get.conf.getAppId, bcast.id, keyOrdinal, timeOrdinal), _ => {
        val byKey = new scala.collection.mutable.HashMap[Any, scala.collection.mutable.ArrayBuffer[(Any, InternalRow)]]
        bcast.value.foreach { r =>
          val k = rk.eval(r)
          val t = rt.eval(r)
          if (k != null && t != null)
            byKey.getOrElseUpdate(k, new scala.collection.mutable.ArrayBuffer[(Any, InternalRow)]) += ((t, r))
        }
        byKey.map { case (k, rs) =>
          val arr = rs.sortWith((a, b) => timeOrd.compare(a._1, b._1) < 0).toArray
          k -> (arr.map(_._2), arr.map(_._1): Array[Any])
        }.toMap
      }).asInstanceOf[Map[Any, (Array[InternalRow], Array[Any])]]
      val proj = UnsafeProjection.create(allOut, allOut)
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      lIter.map { lRow =>
        val k = lk.eval(lRow)
        val t = lt.eval(lRow)
        val m = if (k == null || t == null) None else sorted.get(k)
        val matched = m match {
          case Some((rows, times)) =>
            // rightmost index with time <= t
            var lo = 0; var hi = rows.length - 1; var ans = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (timeOrd.compare(times(mid), t) <= 0) { ans = mid; lo = mid + 1 }
              else hi = mid - 1
            }
            if (ans >= 0) rows(ans) else null
          case None => null
        }
        proj(joined(lRow, if (matched != null) matched else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}

object BroadcastAsOfJoinExec {
  private val MaxCachedIndexes = 32

  /** Executor-level built-index memo — the same build-once pattern
    * HashedRelation broadcasts use. Keyed by (appId, broadcastId,
    * keyOrdinal, timeOrdinal): broadcast ids restart from 0 when a new
    * SparkContext starts in the same JVM, so the app id disambiguates a
    * fresh context from a stale one; the ordinals disambiguate two joins
    * that SHARE a reused broadcast exchange but bind different key/time
    * columns. LRU-bounded (access-order LinkedHashMap) so retired
    * broadcasts' indexes — which pin the broadcast rows via their row/time
    * arrays — are dropped instead of accumulating for the executor
    * lifetime. */
  private[graftbridge] val indexCache: java.util.Map[(String, Long, Int, Int), AnyRef] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(String, Long, Int, Int), AnyRef](16, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[(String, Long, Int, Int), AnyRef]): Boolean =
          size() > MaxCachedIndexes
      })
}

/** Logical node: carries resolved child plans + key/time attributes.
  * `broadcastRight`: Some(true/false) forces the physical choice; None
  * auto-selects by the right side's stats vs autoBroadcastJoinThreshold
  * (the same cost rule Spark's own join strategies use). */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    broadcastRight: Option[Boolean] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): LogicalPlan =
    copy(left = l, right = r)
}

/** Planner strategy: broadcast when forced or when the right side's
  * estimated size clears the session's broadcast threshold; co-partitioned
  * merge otherwise. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p @ AsOfJoinPlan(l, r, lk, rk, lt, rt, hint) =>
      val threshold = org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      val useBroadcast = hint.getOrElse(
        threshold > 0 && r.stats.sizeInBytes >= 0 && r.stats.sizeInBytes <= threshold)
      if (useBroadcast)
        BroadcastAsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
      else
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** DataFrame-from-LogicalPlan bridge (Dataset.ofRows is private[sql]). */
object PlanBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
