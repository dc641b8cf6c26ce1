package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for ΔR = √(Δη² + wrap(Δφ)²) — the custom-
  * `Expression` tier of the build brief (compose built-ins → native
  * Expression → custom plan). The Column-composition form in
  * [[graft.functions.PhysicsFunctions.deltaR]] stays the default; this
  * variant exists to (a) prove the tier, (b) evaluate η/φ exactly once
  * each (the composed form repeats the Δφ subexpression under `pow` and
  * `atan2`), and (c) participate in whole-stage codegen as ONE fused Java
  * expression with no Column-tree overhead.
  *
  * Semantics identical to the composed form: Δφ wrapped to (−π,π] via
  * atan2(sin Δφ, cos Δφ) (reference phaseII-analysis.py:315,324,334,335).
  */
case class DeltaRExpr(eta1: Expression, phi1: Expression, eta2: Expression, phi2: Expression)
    extends QuaternaryExpression {

  override def first: Expression = eta1
  override def second: Expression = phi1
  override def third: Expression = eta2
  override def fourth: Expression = phi2

  // Inputs are cast to double at construction (Column API and SQL
  // registration both wrap children in Cast), so no ExpectsInputTypes.
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "delta_r"

  override protected def nullSafeEval(e1: Any, p1: Any, e2: Any, p2: Any): Any = {
    val dEta = e1.asInstanceOf[Double] - e2.asInstanceOf[Double]
    val dPhiRaw = p1.asInstanceOf[Double] - p2.asInstanceOf[Double]
    val dPhi = math.atan2(math.sin(dPhiRaw), math.cos(dPhiRaw))
    math.sqrt(dEta * dEta + dPhi * dPhi)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // addNewFunction may qualify or rename the function when the generated
    // class spills into nested private classes — always call through the
    // name it RETURNS, never the one we requested.
    val fn = ctx.addNewFunction("delta_r_compute",
      s"""
         |private double delta_r_compute(double e1, double p1, double e2, double p2) {
         |  double dEta = e1 - e2;
         |  double dPhiRaw = p1 - p2;
         |  double dPhi = java.lang.Math.atan2(java.lang.Math.sin(dPhiRaw), java.lang.Math.cos(dPhiRaw));
         |  return java.lang.Math.sqrt(dEta * dEta + dPhi * dPhi);
         |}
       """.stripMargin)
    defineCodeGen(ctx, ev, (e1, p1, e2, p2) => s"$fn($e1, $p1, $e2, $p2)")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(eta1 = newFirst, phi1 = newSecond, eta2 = newThird, phi2 = newFourth)
}

object DeltaRExpr {

  /** Column API: `delta_r(eta1, phi1, eta2, phi2)`. */
  def deltaR(eta1: Column, phi1: Column, eta2: Column, phi2: Column): Column =
    ColumnBridge.column(DeltaRExpr(
      cast(eta1), cast(phi1), cast(eta2), cast(phi2)))

  private def cast(c: Column): Expression =
    ColumnBridge.expression(c.cast("double"))

  /** SQL registration: `SELECT delta_r(eta1, phi1, eta2, phi2) FROM ...`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "delta_r",
      exprs => DeltaRExpr(
        Cast(exprs(0), DoubleType), Cast(exprs(1), DoubleType),
        Cast(exprs(2), DoubleType), Cast(exprs(3), DoubleType)),
      "scala_udf")
}
