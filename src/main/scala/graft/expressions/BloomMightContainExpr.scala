package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom.mightContainLong(key)` as a native codegen'd predicate — the
  * executor-side half of reference-corpus dedup ([[graft.operators.Curation]]
  * q71): a driver-built Bloom filter of the reference corpus' fingerprint
  * hashes is probed with two XXH64 hashes into a local bit array — no join,
  * no shuffle, no per-row allocation.
  *
  * The filter travels as a `Broadcast` HANDLE, not a constructor payload:
  * the expression tree (and thus every task binary, for every plan branch
  * that probes) serializes only the handle; the bit array itself ships once
  * per executor via TorrentBroadcast and is shared by every branch/stage
  * that probes the same filter — at the documented 10⁹-key/1% size that is
  * ~1.2 GB shipped once instead of once per probing branch.
  *
  * Guarantee direction (what makes the enclosing operator EXACT): `false`
  * is definitive — a key the filter was built over can never return false —
  * so "definitely new" rows skip verification entirely; `true` is only
  * "maybe", and callers must verify those few rows with an exact join.
  *
  * Mirrors Spark's internal `BloomFilterMightContain` (the runtime-filter
  * expression), which is not callable from the public Column API.
  */
case class BloomMightContainExpr(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint key (hash the value first), got ${t.simpleString}")
  }

  @transient private lazy val filter: BloomFilter = bloom.value

  override def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomCls = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("bloomBc", bloom, classOf[Broadcast[_]].getName)
    // resolved from the broadcast ONCE per task (generated-class init), not
    // per row and not per plan branch
    val local = ctx.addMutableState(bloomCls, "bloomFilter",
      v => s"$v = ($bloomCls) $bcRef.value();")
    defineCodeGen(ctx, ev, key => s"$local.mightContainLong($key)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContainExpr {
  /** Column API: membership probe of `key` (bigint) against a broadcast
    * Bloom filter (`spark.sparkContext.broadcast(filter)` the built filter
    * first). */
  def mightContain(key: Column, bloom: Broadcast[BloomFilter]): Column =
    ColumnBridge.column(BloomMightContainExpr(ColumnBridge.expression(key), bloom))
}
