package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps

class CosineSimSpec extends SparkSpec {
  import spark.implicits._

  test("native cosine is bit-identical to the HOF composition on real embeddings") {
    val e = graft.core.Tables.embeddings(spark, sf0001)
    val pairs = e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id" && $"b.vec_id" < 40)
      .select(
        VectorOps.cosine($"a.embedding", $"b.embedding").as("native"),
        VectorOps.cosineHof($"a.embedding", $"b.embedding").as("hof"))
    assert(pairs.count() > 100)
    // bit-identical, not approximately equal: same widening, same fold order
    assert(pairs.filter(!($"native" <=> $"hof")).count() == 0)
  }

  test("null semantics: zero vector, null element, length mismatch -> null (never NaN)") {
    val df = Seq(
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f)),   // zero norm
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f)))   // sane
      .toDF("a", "b")
    val r = df.select(VectorOps.cosine($"a", $"b").as("c")).collect()
    assert(r(0).isNullAt(0))
    assert(math.abs(r(1).getDouble(0) - 1.0) < 1e-12)
    // length mismatch
    val lm = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
      .select(VectorOps.cosine($"a", $"b").as("c")).head()
    assert(lm.isNullAt(0))
    // null element poisons like the HOF zip_with fold
    val ne = Seq((Seq(Some(1.0f), None), Seq(Some(1.0f), Some(2.0f)))).toDF("a", "b")
      .select(VectorOps.cosine($"a", $"b").as("c")).head()
    assert(ne.isNullAt(0))
    // null input array
    val na = Seq((null.asInstanceOf[Array[Float]], Array(1.0f))).toDF("a", "b")
      .select(VectorOps.cosine($"a", $"b").as("c")).head()
    assert(na.isNullAt(0))
  }

  test("array<double> inputs work and match the float path on exact values") {
    val d = Seq((Array(3.0, 4.0), Array(4.0, 3.0))).toDF("a", "b")
      .select(VectorOps.cosine($"a", $"b").as("c")).head().getDouble(0)
    assert(math.abs(d - 24.0 / 25.0) < 1e-15)
  }

  test("cosine_sim is SQL-registered through GraftExtensions' builder") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    // injection must succeed on a fresh container
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // and the same builder evaluates through the active session's registry
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => graft.expressions.CosineSimExpr(exprs(0), exprs(1)),
      "scala_udf")
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c")
      .head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("native l2sq is bit-identical to the HOF fold on real embeddings") {
    val e = graft.core.Tables.embeddings(spark, sf0001)
    val pairs = e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id" && $"b.vec_id" < 40)
      .select(
        VectorOps.l2sq($"a.embedding", $"b.embedding").as("native"),
        VectorOps.l2sqHof($"a.embedding", $"b.embedding").as("hof"))
    assert(pairs.count() > 100)
    assert(pairs.filter(!($"native" <=> $"hof")).count() == 0)
    // and on the pre-cast array<double> shape the assignment dags use
    val dPairs = e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id" && $"b.vec_id" < 40)
      .select(
        VectorOps.l2sq($"a.embedding".cast("array<double>"),
          $"b.embedding".cast("array<double>")).as("native"),
        VectorOps.l2sqHof($"a.embedding".cast("array<double>"),
          $"b.embedding".cast("array<double>")).as("hof"))
    assert(dPairs.filter(!($"native" <=> $"hof")).count() == 0)
  }

  test("l2sq null semantics match zip_with padding: mismatch/null element/null array") {
    val lm = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
      .select(VectorOps.l2sq($"a", $"b").as("c")).head()
    assert(lm.isNullAt(0))
    val ne = Seq((Seq(Some(1.0f), None), Seq(Some(1.0f), Some(2.0f)))).toDF("a", "b")
      .select(VectorOps.l2sq($"a", $"b").as("c")).head()
    assert(ne.isNullAt(0))
    val na = Seq((null.asInstanceOf[Array[Float]], Array(1.0f))).toDF("a", "b")
      .select(VectorOps.l2sq($"a", $"b").as("c")).head()
    assert(na.isNullAt(0))
    val ok = Seq((Array(1.0f, 2.0f), Array(4.0f, 6.0f))).toDF("a", "b")
      .select(VectorOps.l2sq($"a", $"b").as("c")).head().getDouble(0)
    assert(ok == 25.0)
  }
}
