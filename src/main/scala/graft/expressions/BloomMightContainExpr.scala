package graft.expressions

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
  * hashes rides the plan's reference array (`BloomFilterImpl` is
  * `Serializable`) to every task, and each incoming row answers membership
  * with two XXH64 probes into a local bit array — no join, no shuffle, no
  * per-row allocation.
  *
  * Guarantee direction (what makes the enclosing operator EXACT): `false`
  * is definitive — a key the filter was built over can never return false —
  * so "definitely new" rows skip verification entirely; `true` is only
  * "maybe", and callers must verify those few rows with an exact join.
  *
  * Mirrors Spark's internal `BloomFilterMightContain` (the runtime-filter
  * expression), which is not callable from the public Column API.
  */
case class BloomMightContainExpr(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint key (hash the value first), got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, key => s"$bloomRef.mightContainLong($key)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContainExpr {
  /** Column API: membership probe of `key` (bigint) against a driver-built
    * Bloom filter. */
  def mightContain(key: Column, bloom: BloomFilter): Column =
    ColumnBridge.column(BloomMightContainExpr(ColumnBridge.expression(key), bloom))
}
