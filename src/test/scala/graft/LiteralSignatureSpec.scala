package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Pins the native codegen LSH bucket id
  * ([[graft.expressions.LiteralSignatureExpr]]) bit-identical to the
  * interpreted HOF spelling it replaced (r13) — the cross-engine contract:
  * the ANN gate oracles replay the SAME literal planes in DuckDB, so any
  * drift here breaks q50/q63/q120b-class gates, not just this spec. */
class LiteralSignatureSpec extends SparkSpec {
  import spark.implicits._

  private val signs = VectorOps.rademacherSigns(6, 64, seed = 91)

  test("native signature is bit-identical to the HOF spelling on real embeddings") {
    val e = graft.core.Tables.embeddings(spark, sf0001)
    val both = e.select(
      VectorOps.literalSignature($"embedding", signs).as("native"),
      VectorOps.literalSignatureHof($"embedding", signs).as("hof"))
    assert(both.count() > 100)
    assert(both.filter(!($"native" <=> $"hof")).count() == 0)
    // and on a second, differently-seeded plane set (different dim count)
    val s2 = VectorOps.rademacherSigns(12, 64, seed = 7)
    val b2 = e.select(
      VectorOps.literalSignature($"embedding", s2).as("native"),
      VectorOps.literalSignatureHof($"embedding", s2).as("hof"))
    assert(b2.filter(!($"native" <=> $"hof")).count() == 0)
  }

  test("edge semantics match the HOF form: null / null element / length mismatch / zero / NaN -> same bucket, never null") {
    val s = VectorOps.rademacherSigns(4, 3, seed = 5)
    val rows = Seq(
      Seq[Option[Float]](Some(1.0f), Some(-2.0f), Some(0.5f)),   // sane
      Seq[Option[Float]](Some(0.0f), Some(0.0f), Some(0.0f)),    // zero vector: every proj = 0.0 >= 0 -> all bits set
      Seq[Option[Float]](Some(1.0f), None, Some(0.5f)),          // null element -> bucket 0
      Seq[Option[Float]](Some(1.0f), Some(2.0f)),                // length mismatch -> bucket 0
      Seq[Option[Float]](Some(Float.NaN), Some(1.0f), Some(1.0f)), // NaN proj: Spark's NaN >= 0 is TRUE -> all bits
      null                                                        // null vector -> bucket 0
    ).toDF("v")
    val got = rows.select(
      VectorOps.literalSignature($"v", s).as("native"),
      VectorOps.literalSignatureHof($"v", s).as("hof")).collect()
    got.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(1), s"signature must never be null: $r")
      assert(r.getLong(0) == r.getLong(1), s"native/hof diverge: $r")
    }
    // the zero vector really takes the all-bits branch (proj 0.0 >= 0),
    // and so does the NaN row (Spark SQL: NaN is greater than everything,
    // so when(NaN >= 0) sets every bit — Java's >= would say false; the
    // native expression mirrors Spark, not Java)
    assert(got(1).getLong(0) == 15L)
    assert(got(4).getLong(0) == 15L)
    // the null-poisoned rows really land in bucket 0
    Seq(2, 3, 5).foreach(i => assert(got(i).getLong(0) == 0L))
  }

  test("exchange reuse survives the expression: equal planes -> equal expressions") {
    // value equality on the Seq-of-Seq planes field: two independently
    // constructed (same-seed) plane matrices must compare equal, or every
    // shared-lineage bucketing subtree would split its exchange. Compared
    // on RESOLVED children (a Column wrapper carries per-call-site Origin
    // metadata that is not part of expression equality).
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val a = VectorOps.rademacherSigns(6, 64, seed = 91)
    val b = VectorOps.rademacherSigns(6, 64, seed = 91)
    val child = BoundReference(0, ArrayType(FloatType), nullable = true)
    val ea = graft.expressions.LiteralSignatureExpr(
      child, a.map(_.toIndexedSeq).toIndexedSeq)
    val eb = graft.expressions.LiteralSignatureExpr(
      child, b.map(_.toIndexedSeq).toIndexedSeq)
    assert(ea == eb)
    assert(ea.semanticEquals(eb))
  }
}
