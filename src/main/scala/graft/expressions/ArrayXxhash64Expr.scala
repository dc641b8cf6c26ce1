package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Elementwise `xxhash64` over a string array — the codegen replacement
  * for `transform(arr, x => xxhash64(x))`, whose `transform` layer is
  * CodegenFallback (interpreted lambda dispatch, one boxed array per row)
  * AND evicts the enclosing operator from whole-stage codegen — r13 found
  * it as the last interpreted layer in the q46 signature stage after
  * [[MinHashSigExpr]] fused everything downstream of the token hashes.
  *
  * Bit-compatible by construction (`MinHashSigSpec` pins the q46 pipeline
  * end-to-end): each element hashes with
  * `XxHash64Function.hash(elem, StringType, 42L)` — the exact kernel the
  * `xxhash64(col)` expression folds a single string child with (seed 42) —
  * and a NULL element yields the seed pass-through 42L, exactly as
  * `xxhash64(null)` does. Output element type is non-null bigint, matching
  * `transform`'s output type for a non-nullable lambda. Null array → null.
  */
case class ArrayXxhash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "array_xxhash64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<string>, got ${t.simpleString}")
    }

  /** Public for generated code. */
  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (a.isNullAt(i)) 42L
        else XxHash64Function.hash(a.getUTF8String(i), StringType, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  // keep the enclosing stage inside whole-stage codegen; the loop itself
  // runs as compiled Scala through a reference-object call
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("arrXxh", this,
      classOf[ArrayXxhash64Expr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArrayXxhash64Expr {
  /** Column API: per-element xxhash64 (seed 42) of a string array. */
  def arrayXxhash64(a: Column): Column =
    ColumnBridge.column(ArrayXxhash64Expr(ColumnBridge.expression(a)))
}
