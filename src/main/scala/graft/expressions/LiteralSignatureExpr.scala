package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Fused LSH bucket id from literal ±1 planes — the codegen replacement
  * for the HOF spelling in [[graft.functions.VectorOps.literalSignatureHof]]
  * (per plane: a `zip_with` product array + an `aggregate` left fold,
  * BOTH CodegenFallback — interpreted, boxed, one allocated intermediate
  * array per plane per row). The r11 lesson located that hazard at JOIN
  * fan cardinality; r13 found it at SCAN cardinality: the bucket-index
  * write evaluates the signature once per indexed vector, and a 4.25M-row
  * probe rung sat in `ZipWith.eval` for >20 minutes of single-digit
  * progress (jstack-confirmed, ~300 µs/row) where this expression does
  * planes × dim fused multiply-adds in whole-stage codegen (~0.4 µs/row).
  *
  * Bit-compatible by construction with the HOF form (required: the ANN
  * gate oracles replay the bucketing in DuckDB from the same literal
  * planes; `VectorOpsSpec` pins equality including the edge cases):
  *  - elements widen to double BEFORE the multiply, and each plane's
  *    projection accumulates left-to-right — the same fold order, so the
  *    same floating-point result bit-for-bit;
  *  - bit p is set iff projection ≥ 0 under SPARK's comparison semantics:
  *    NaN is greater than every value in Spark SQL (unlike Java, where
  *    NaN ≥ 0 is false — the one place the Java spelling must diverge
  *    from the literal translation: `proj >= 0.0 || Double.isNaN(proj)`);
  *    −0.0 ≥ 0 is true in both;
  *  - a null vector, a null element, or a length ≠ dim vector yields
  *    bucket 0, NEVER null — in the HOF form zip_with's null-pad poisons
  *    every plane's fold to null and `when(null ≥ 0).otherwise(0)` takes
  *    the otherwise branch for every bit. The expression is therefore
  *    non-nullable, exactly like the `when`/`otherwise` sum it replaces.
  *
  * `signs` is a Seq-of-Seq so case-class equality is VALUE equality —
  * two plans bucketing with the same literal planes stay
  * canonically equal (exchange reuse); a raw Array field would compare
  * by reference and split shared subtrees.
  */
case class LiteralSignatureExpr(child: Expression, signs: Seq[Seq[Double]])
    extends UnaryExpression {

  require(signs.nonEmpty && signs.length <= 63, s"1..63 planes, got ${signs.length}")
  require(signs.map(_.length).distinct.size == 1, "planes must share one dim")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "literal_signature"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float|double>, got ${t.simpleString}")
    }

  @transient private lazy val mat: Array[Array[Double]] =
    signs.map(_.toArray).toArray
  @transient private lazy val elemIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  @transient private lazy val mayHaveNullElements: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  // override eval (not nullSafeEval): a null input must yield 0L, not null
  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) return 0L
    val x = a.asInstanceOf[ArrayData]
    val dim = mat(0).length
    if (x.numElements() != dim) return 0L
    if (mayHaveNullElements) {
      var i = 0
      while (i < dim) { if (x.isNullAt(i)) return 0L; i += 1 }
    }
    var sig = 0L
    var p = 0
    while (p < mat.length) {
      val s = mat(p)
      var proj = 0.0
      var i = 0
      while (i < dim) {
        proj += (if (elemIsDouble) x.getDouble(i) else x.getFloat(i).toDouble) * s(i)
        i += 1
      }
      // Spark comparison semantics: NaN >= 0 is TRUE (NaN sorts greatest)
      if (proj >= 0.0 || java.lang.Double.isNaN(proj)) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val matRef = ctx.addReferenceObj("lsigPlanes", mat, "double[][]")
    val dim = mat(0).length
    val np = mat.length
    val x = ctx.freshName("x")
    val ok = ctx.freshName("ok")
    val sig = ctx.freshName("sig")
    val p = ctx.freshName("p")
    val i = ctx.freshName("i")
    val proj = ctx.freshName("proj")
    val s = ctx.freshName("s")
    val getElem = if (elemIsDouble) s"$x.getDouble($i)" else s"(double) $x.getFloat($i)"
    val childNull = if (child.nullable) c.isNull.toString else "false"
    val nullElemScan =
      if (mayHaveNullElements)
        s"""for (int $i = 0; $i < $dim && $ok; $i++) {
           |  if ($x.isNullAt($i)) $ok = false;
           |}""".stripMargin
      else ""
    ev.copy(code =
      code"""
        ${c.code}
        long $sig = 0L;
        if (!($childNull)) {
          org.apache.spark.sql.catalyst.util.ArrayData $x = ${c.value};
          boolean $ok = ($x.numElements() == $dim);
          $nullElemScan
          if ($ok) {
            double[][] ${s}m = $matRef;
            for (int $p = 0; $p < $np; $p++) {
              double[] $s = ${s}m[$p];
              double $proj = 0.0;
              for (int $i = 0; $i < $dim; $i++) {
                $proj += $getElem * $s[$i];
              }
              if ($proj >= 0.0 || java.lang.Double.isNaN($proj)) $sig |= (1L << $p);
            }
          }
        }
        boolean ${ev.isNull} = false;
        long ${ev.value} = $sig;""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LiteralSignatureExpr {
  /** Column API: fused literal-plane LSH bucket id. */
  def signature(v: Column, signs: Array[Array[Double]]): Column =
    ColumnBridge.column(LiteralSignatureExpr(
      ColumnBridge.expression(v), signs.map(_.toIndexedSeq).toIndexedSeq))
}
