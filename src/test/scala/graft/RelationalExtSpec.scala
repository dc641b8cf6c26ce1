package graft

import org.apache.spark.sql.functions._

class RelationalExtSpec extends SparkSpec {

  test("sketch twins stay within tolerance of q25's exact columns") {
    import spark.implicits._
    val exact = SparkEntry.queries("q25_distinct_median")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1).toDouble, r.getDouble(2))).toMap
    assert(exact.nonEmpty)
    val approx = graft.core.Tables.lineitem(spark, sf0001)
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_partkey").as("approx_parts"),
        expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("approx_median"))
      .collect().map(r => r.getString(0) -> (r.getLong(1).toDouble, r.getDouble(2))).toMap
    approx.foreach { case (flag, (aParts, aMedian)) =>
      val (eParts, eMedian) = exact(flag)
      assert(math.abs(aParts - eParts) / eParts < 0.05,
        s"$flag: approx_count_distinct $aParts vs exact $eParts")
      assert(math.abs(aMedian - eMedian) / eMedian < 0.05,
        s"$flag: percentile_approx $aMedian vs exact $eMedian")
    }
  }

  test("q23b approx percentiles track q23 exact percentiles per group") {
    val exact = SparkEntry.queries("q23_percentiles")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = SparkEntry.queries("q23b_percentiles_approx")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (flag, (m, p90, q1)) =>
      val (em, ep90, eq1) = exact(flag)
      assert(math.abs(m - em) / em < 0.02, s"$flag median: $m vs $em")
      assert(math.abs(p90 - ep90) / ep90 < 0.02, s"$flag p90: $p90 vs $ep90")
      assert(math.abs(q1 - eq1) / eq1 < 0.02, s"$flag q1: $q1 vs $eq1")
    }
  }

  test("q64 emits SQL NULL (not NaN) for single-element groups") {
    import spark.implicits._
    val out = SparkEntry.queries("q64_typed_mapgroups")(spark, sf0001)
    val nullable = out.filter($"n_items" === 1)
    // every single-element group must have a NULL second_price, never NaN
    assert(nullable.filter($"second_price".isNotNull).count() == 0)
    assert(out.filter(isnan($"second_price")).count() == 0)
  }
}
