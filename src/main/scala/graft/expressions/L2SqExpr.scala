package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst squared-L2 distance over two `array<float>` /
  * `array<double>` columns — the fused-loop replacement for the HOF form
  * `aggregate(zip_with(a, b, (x, y) => x − y), 0.0, (acc, d) => acc + d·d)`,
  * which allocates a difference array and walks two lambdas per pair, and
  * (the repo's measured HOF hazard) evaluates INTERPRETED. This is the
  * hot inner loop of every centroid assignment: k-means Lloyd rounds
  * (corpus × k per iteration), IVF build/append assignment, and the IVF
  * probe ranking — one codegen'd loop, one scalar accumulator, no
  * allocation.
  *
  * Semantics are IDENTICAL to the HOF form (required: the k-means / IVF /
  * PQ gate oracles replay the distance in DuckDB):
  *  - elements widen to double; (x−y)² accumulates left-to-right, so the
  *    result is bit-equal to the HOF fold;
  *  - null when either array is null, any element is null, or lengths
  *    differ (zip_with's null-pad poisons the HOF fold) — never NaN.
  */
case class L2SqExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_sq"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  @transient private lazy val leftIsDouble = elemIsDouble(left)
  @transient private lazy val rightIsDouble = elemIsDouble(right)

  private def elemIsDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val xd = leftIsDouble; val yd = rightIsDouble
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      val d = xv - yv
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val getX = if (leftIsDouble) s"$a.getDouble($i)" else s"(double) $a.getFloat($i)"
      val getY = if (rightIsDouble) s"$b.getDouble($i)" else s"(double) $b.getFloat($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $getX - $getY;
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object L2SqExpr {
  /** Column API: fused squared-L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    ColumnBridge.column(L2SqExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
