package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native symmetric-int8 quantization of one embedding vector — the fused
  * single-pass replacement for the HOF composition in
  * [[graft.operators.Curation.quantizeInt8]] (cast + abs-transform +
  * array_max + clamp-transform: four lambda walks and two allocated
  * intermediate arrays per row, and SCALING.md measured the lambda path
  * evaluating INTERPRETED — ~2× steady-state cost on a per-vector hot
  * loop). This expression does two scalar loops (max, then quantize) with
  * one output allocation, in whole-stage codegen.
  *
  * Returns `struct(scale double, qvec array<bigint>)`; callers derive
  * `scale_q = floor(scale·1e6 + 0.5)` exactly as before.
  *
  * Semantics are BIT-EQUAL to the HOF spelling (required: gate q74's
  * DuckDB oracle replays the HOF dag, and CurationSpec pins parity):
  *  - elements widen to double before any arithmetic;
  *  - `scale = max|x| == 0 ? 0.0 : 127.0 / max|x|` where the max ignores
  *    null elements (array_max semantics); scale is null when the array
  *    is empty or all-null (127.0 / NULL);
  *  - `qvec[i] = greatest(-127, least(127, floor(x·scale + 0.5)))` — and
  *    because Spark's greatest/least SKIP nulls, a null element comes out
  *    as 127 in the HOF form (floor(null)=null, least(127,null)=127,
  *    greatest(-127,127)=127). Mirrored here verbatim: parity with the
  *    oracle-certified spelling outranks taste, and real embedding
  *    columns carry no null elements;
  *  - floor(x·scale + 0.5) never overflows long: |x·scale| ≤ 127 by
  *    construction, so the ANSI overflow path of floor-to-long is dead.
  */
case class QuantizeInt8Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = QuantizeInt8Expr.OutType
  override def nullable: Boolean = true
  override def prettyName: String = "quantize_int8"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects an array<float|double> input, got ${t.simpleString}")
    }

  @transient private lazy val isDouble = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var mx = 0.0
    var any = false
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val x = if (isDouble) v.getDouble(i) else v.getFloat(i).toDouble
        val a = math.abs(x)
        // Double.compare = array_max's total order (NaN greatest, -0 < 0)
        if (!any || java.lang.Double.compare(a, mx) > 0) mx = a
        any = true
      }
      i += 1
    }
    val scale: java.lang.Double = if (!any) null else if (mx == 0.0) 0.0 else 127.0 / mx
    val q = new Array[Long](n)
    i = 0
    while (i < n) {
      if (v.isNullAt(i) || scale == null) q(i) = 127L
      else {
        val x = if (isDouble) v.getDouble(i) else v.getFloat(i).toDouble
        var e = math.floor(x * scale.doubleValue() + 0.5).toLong
        if (e > 127L) e = 127L
        if (e < -127L) e = -127L
        q(i) = e
      }
      i += 1
    }
    InternalRow(scale, new GenericArrayData(q))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val mx = ctx.freshName("mx")
      val any = ctx.freshName("any")
      val x = ctx.freshName("x")
      val a = ctx.freshName("a")
      val scale = ctx.freshName("scale")
      val hasScale = ctx.freshName("hasScale")
      val q = ctx.freshName("q")
      val e = ctx.freshName("e")
      val vals = ctx.freshName("vals")
      val getX = if (isDouble) s"$v.getDouble($i)" else s"(double) $v.getFloat($i)"
      s"""
         |int $n = $v.numElements();
         |double $mx = 0.0;
         |boolean $any = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$v.isNullAt($i)) {
         |    double $x = $getX;
         |    double $a = java.lang.Math.abs($x);
         |    if (!$any || java.lang.Double.compare($a, $mx) > 0) $mx = $a;
         |    $any = true;
         |  }
         |}
         |boolean $hasScale = $any;
         |double $scale = !$any ? 0.0 : ($mx == 0.0 ? 0.0 : 127.0 / $mx);
         |long[] $q = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($v.isNullAt($i) || !$hasScale) { $q[$i] = 127L; }
         |  else {
         |    long $e = (long) java.lang.Math.floor($getX * $scale + 0.5);
         |    if ($e > 127L) $e = 127L;
         |    if ($e < -127L) $e = -127L;
         |    $q[$i] = $e;
         |  }
         |}
         |Object[] $vals = new Object[2];
         |$vals[0] = $hasScale ? (Object) java.lang.Double.valueOf($scale) : null;
         |$vals[1] = new org.apache.spark.sql.catalyst.util.GenericArrayData($q);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow($vals);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeInt8Expr {
  val OutType: StructType = StructType(Seq(
    StructField("scale", DoubleType, nullable = true),
    StructField("qvec", ArrayType(LongType, containsNull = true), nullable = false)))

  /** Column API: fused `struct(scale, qvec)` int8 quantization. */
  def quantize(v: Column): Column =
    ColumnBridge.column(QuantizeInt8Expr(ColumnBridge.expression(v)))
}
