package graft

import org.apache.spark.sql.functions._
import graft.expressions.MinHashSigExpr

class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  private def hofSig(t: org.apache.spark.sql.Column, k: Int) = {
    // the Column formulation the native expression replaces
    val h = transform(t, x => xxhash64(x))
    val m = size(t) - lit(2)
    val ab = zip_with(slice(h, lit(1), m), slice(h, lit(2), m), (x, y) => xxhash64(x, y))
    val g = zip_with(ab, slice(h, lit(3), m), (x, y) => xxhash64(x, y))
    array((0 until k).map(p => array_min(transform(g, x => xxhash64(lit(p), x)))): _*)
  }

  test("native fused signature is bit-identical to the HOF formulation") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select($"doc_id", split($"text", " ").as("t"))
      .filter(size($"t") >= 3)
    val both = docs.select(
      MinHashSigExpr.minhashSig(transform($"t", x => xxhash64(x)), 32).as("native"),
      hofSig($"t", 32).as("hof"))
    assert(both.count() > 100)
    assert(both.filter(!($"native" <=> $"hof")).count() == 0)
  }

  test("arrayXxhash64 ≡ transform(xxhash64): elements, null element, null array (r13)") {
    val df = Seq(
      (1L, Seq("alpha", "beta", "caté-μ", "", "alpha")),
      (2L, Seq.empty[String]),
      (3L, null.asInstanceOf[Seq[String]])).toDF("id", "t")
    val both = df.select(
      graft.expressions.ArrayXxhash64Expr.arrayXxhash64($"t").as("native"),
      transform($"t", x => xxhash64(x)).as("hof"))
    assert(both.filter(!($"native" <=> $"hof")).count() == 0)
    // null ELEMENT: xxhash64(null) passes the seed through — pin 42L parity
    val withNull = spark.sql("SELECT array('a', CAST(NULL AS STRING), 'b') AS t")
    val r = withNull.select(
      graft.expressions.ArrayXxhash64Expr.arrayXxhash64($"t").as("native"),
      transform($"t", x => xxhash64(x)).as("hof")).head()
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    assert(r.getSeq[Long](0)(1) == 42L)
  }

  test("fewer than 3 tokens yields null; empty array yields null") {
    val df = Seq(Seq("a", "b"), Seq.empty[String]).toDF("t")
    val r = df.select(
      MinHashSigExpr.minhashSig(transform($"t", x => xxhash64(x)), 8).as("s")).collect()
    assert(r.forall(_.isNullAt(0)))
  }

  test("null token-hash element poisons the signature to null (matches HOF)") {
    // array(...) of mixed null/non-null yields containsNull = true, the
    // path where the expression must scan instead of reading nulls as 0
    val df = spark.range(1).select(
      array(lit(1L), lit(null).cast("long"), lit(3L), lit(4L)).as("h"),
      array(lit(1L), lit(2L), lit(3L), lit(4L)).as("ok"))
    val r = df.select(
      MinHashSigExpr.minhashSig($"h", 8).as("poisoned"),
      MinHashSigExpr.minhashSig($"ok", 8).as("clean")).head()
    assert(r.isNullAt(0))
    assert(r.getSeq[Long](1).length == 8)
  }

  test("signature length and determinism") {
    val df = Seq(Seq("x", "y", "z", "w")).toDF("t")
    val s1 = df.select(MinHashSigExpr.minhashSig(transform($"t", x => xxhash64(x)), 16))
      .head().getSeq[Long](0)
    val s2 = df.select(MinHashSigExpr.minhashSig(transform($"t", x => xxhash64(x)), 16))
      .head().getSeq[Long](0)
    assert(s1.length == 16 && s1 == s2)
  }
}
