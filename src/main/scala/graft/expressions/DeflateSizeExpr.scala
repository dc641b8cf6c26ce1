package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed size of a string column — the primitive behind the
  * compression-ratio quality signal (repetitive/boilerplate text
  * compresses far below natural prose; curation pipelines threshold
  * `deflate_size/octet_length` as a cheap repetition detector that
  * catches what token-level ratios miss, e.g. long-range template
  * repetition). Level 6, nowrap, fresh Deflater per value — stateless
  * across rows and task threads.
  *
  * CodegenFallback, deliberately: the work IS the library call (zlib via
  * `java.util.zip`); there is no expression tree to fuse, and a fallback
  * leaf only breaks whole-stage fusion for its own projection. Output is
  * deterministic for a given JDK's zlib; it is a MODEL-LIKE signal
  * (spec-verified, like the sketch recall tiers), not an oracle-replayable
  * value — DuckDB has no DEFLATE — so consumers gate on spec'd behavior,
  * not cross-engine hashes. */
case class DeflateSizeExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_size"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateSizeExpr {
  /** Column API: DEFLATE-compressed byte count. */
  def deflateSize(text: Column): Column =
    ColumnBridge.column(DeflateSizeExpr(ColumnBridge.expression(text)))
}
