package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass BPE ENCODE over a compiled merge-rank table — the
  * production-vocabulary replacement for the chained-fold spelling in
  * [[graft.operators.Curation.bpeEncode]]. The fold compiles one
  * interpreted HOF pass PER MERGE into the plan, which is fine for the
  * DSL-sized lists the gate learns (3–5 merges) and hopeless for a real
  * tokenizer vocabulary (10⁴–10⁵ merges ⇒ 10⁴ lambda walks per row and a
  * plan tree 10⁴ projections deep). This expression carries the whole
  * merge list as ONE plan literal — shipped to executors once per stage
  * inside the broadcast task binary, compiled once per task into a
  * pair→rank hash table — and encodes each document in one linked-list
  * sweep, independent of vocabulary size.
  *
  * SEMANTIC CONTRACT — exact parity with the fold (pinned by CurationSpec):
  * merges apply IN LIST ORDER, each as one leftmost-greedy pass over the
  * full token sequence (the original Sennrich-style in-order scheme: a
  * pair created by a LATER-ranked merge is never revisited by an earlier
  * rank). The sweep implements those R passes without R scans:
  *
  *  - tokens live in a doubly-linked list (`next`/`prev` index arrays);
  *  - every adjacency whose pair is in the rank table is queued into a
  *    bucket keyed by the SMALLEST applicable rank; buckets process in
  *    ascending rank order (TreeMap), positions ascending within a bucket
  *    (= leftmost-greedy within the pass);
  *  - a fuse rewrites the left node to `w1 + " " + w2`, unlinks the right
  *    node, and queues the two adjacencies it created with the smallest
  *    rank STRICTLY GREATER than the in-progress pass — created pairs
  *    with earlier ranks are dead by the in-order contract, and a created
  *    pair can never match the in-progress rank itself (the fused token
  *    differs from both w1 and w2);
  *  - queued entries re-verify both tokens at pop time, so entries staled
  *    by earlier fuses drop out — this also realizes the fold's
  *    "a merged token never re-matches w1 in the same pass" rule, because
  *    after a fuse the left token no longer equals w1.
  *
  * Completeness: an adjacency alive when pass r starts was either present
  * initially (queued at the pair's smallest rank; had that been < r it
  * would have been fused then) or created during some pass r' < r (queued
  * at the smallest rank > r', which is r). Either way it sits in bucket r.
  * Duplicate list entries for the same pair are therefore honoured too:
  * occurrences created between the two ranks fuse at the second.
  *
  * Null elements pass through unmatched, mirroring the fold (a null never
  * equals w1/w2 under Spark's `===`, so the fold appends it untouched).
  *
  * Cost: O(n + fuses·log R) per row with no intermediate arrays.
  * CodegenFallback — the linked-list sweep is not worth inlining into
  * generated Java, and unlike the fold it runs once, not R times.
  */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = child.dataType match {
    case ArrayType(_, cn) => ArrayType(StringType, containsNull = cn)
    case _ => ArrayType(StringType, containsNull = true)
  }
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects an array<string> input, got ${t.simpleString}")
    }

  @transient private lazy val w1Of: Array[String] = merges.map(_._1).toArray
  @transient private lazy val w2Of: Array[String] = merges.map(_._2).toArray
  @transient private lazy val fusedOf: Array[String] =
    merges.map { case (a, b) => a + " " + b }.toArray
  /** pair → ascending ranks (a pair MAY appear at several list positions;
    * each is its own pass). Tuple2 key, not a joined string — tokens are
    * arbitrary strings, so no separator char is collision-safe. */
  @transient private lazy val ranksOf: scala.collection.mutable.HashMap[(String, String), Array[Int]] = {
    val m = scala.collection.mutable.HashMap.empty[(String, String), List[Int]]
    var r = merges.length - 1
    while (r >= 0) { // reverse so the built lists come out ascending
      val k = (w1Of(r), w2Of(r))
      m.update(k, r :: m.getOrElse(k, Nil))
      r -= 1
    }
    m.map { case (k, v) => (k, v.toArray) }
  }

  /** Smallest rank of `pair` strictly greater than `after` (-1 = none). */
  private def nextRank(a: String, b: String, after: Int): Int = {
    if (a == null || b == null) return -1
    ranksOf.get((a, b)) match {
      case None => -1
      case Some(rs) =>
        var lo = 0; var hi = rs.length
        while (lo < hi) { // first index with rs(i) > after
          val mid = (lo + hi) >>> 1
          if (rs(mid) > after) hi = mid else lo = mid + 1
        }
        if (lo < rs.length) rs(lo) else -1
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n < 2 || merges.isEmpty) {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) { out(i) = if (v.isNullAt(i)) null else v.getUTF8String(i); i += 1 }
      return new GenericArrayData(out)
    }
    val toks = new Array[String](n)
    var i = 0
    while (i < n) { toks(i) = if (v.isNullAt(i)) null else v.getUTF8String(i).toString; i += 1 }
    val next = new Array[Int](n)
    val prev = new Array[Int](n)
    i = 0
    while (i < n) { next(i) = i + 1; prev(i) = i - 1; i += 1 }
    next(n - 1) = -1

    val buckets = new java.util.TreeMap[Integer, java.util.ArrayList[Integer]]()
    def enqueue(p: Int, after: Int): Unit = {
      val np = next(p)
      if (np != -1) {
        val r = nextRank(toks(p), toks(np), after)
        if (r != -1) {
          var lst = buckets.get(r)
          if (lst == null) { lst = new java.util.ArrayList[Integer](4); buckets.put(r, lst) }
          lst.add(p)
        }
      }
    }
    i = 0
    while (i < n - 1) { enqueue(i, -1); i += 1 }

    var alive = n
    while (!buckets.isEmpty) {
      val e = buckets.pollFirstEntry()
      val r = e.getKey.intValue()
      val lst = e.getValue
      java.util.Collections.sort(lst) // cascaded appends arrive unordered
      val w1 = w1Of(r); val w2 = w2Of(r); val f = fusedOf(r)
      var j = 0
      while (j < lst.size()) {
        val p = lst.get(j).intValue()
        // re-verify: earlier fuses (same or lower rank) may have staled this
        if (toks(p) == w1) {
          val np = next(p)
          if (np != -1 && toks(np) == w2) {
            toks(p) = f
            val nn = next(np)
            next(p) = nn
            if (nn != -1) prev(nn) = p
            toks(np) = null // right node dead (never the list head: p < np)
            alive -= 1
            val pp = prev(p)
            if (pp != -1) enqueue(pp, r)
            enqueue(p, r)
          }
        }
        j += 1
      }
    }

    val out = new Array[Any](alive)
    var at = 0
    var o = 0
    while (at != -1) {
      // dead nodes are unlinked, so a null here is an ORIGINAL null element
      out(o) = if (toks(at) == null) null else UTF8String.fromString(toks(at))
      o += 1
      at = next(at)
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncodeExpr {
  /** Column API: apply `merges` in list order, each leftmost-greedy. */
  def encode(toks: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncodeExpr(ColumnBridge.expression(toks), merges))
}
