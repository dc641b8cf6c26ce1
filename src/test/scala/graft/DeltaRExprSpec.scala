package graft

import org.apache.spark.sql.functions._
import graft.expressions.DeltaRExpr
import graft.functions.PhysicsFunctions

class DeltaRExprSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1.0, 3.14, 1.0, -3.14),   // φ wrap-around
    (0.5, 1.0, -1.2, 2.5),
    (0.0, 0.0, 0.0, 0.0),
    (2.4, -1.0, -2.4, 1.0)).toDF("e1", "p1", "e2", "p2")

  test("native expression matches the Column-composed deltaR bit-for-bit") {
    val rows = df.select(
      DeltaRExpr.deltaR($"e1", $"p1", $"e2", $"p2").as("native"),
      PhysicsFunctions.deltaR($"e1", $"p1", $"e2", $"p2").as("composed")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"native ${r.getDouble(0)} != composed ${r.getDouble(1)}")
    }
  }

  test("null-safe: null input yields null output") {
    val withNull = Seq((Some(1.0), None: Option[Double], Some(1.0), Some(0.5)))
      .toDF("e1", "p1", "e2", "p2")
    assert(withNull.select(DeltaRExpr.deltaR($"e1", $"p1", $"e2", $"p2")).head().isNullAt(0))
  }

  test("registered SQL function works and codegens inside a filter pipeline") {
    DeltaRExpr.register(spark)
    df.createOrReplaceTempView("drt")
    val n = spark.sql(
      "SELECT count(*) AS n FROM drt WHERE delta_r(e1, p1, e2, p2) < 0.5").head().getLong(0)
    assert(n == 2) // wrap-around pair (~0.006) and the zero row
  }

  test("works element-wise inside collection HOFs (crossClean-shaped usage)") {
    val ev = Seq((Seq((1.0, 3.14)), Seq((1.0, -3.14)))).toDF("a", "b")
    val cleaned = ev.select(
      filter($"a", x => !exists($"b", y =>
        DeltaRExpr.deltaR(x("_1"), x("_2"), y("_1"), y("_2")) < lit(0.3))).as("c"))
      .select(size($"c")).head().getInt(0)
    assert(cleaned == 0)
  }
}
