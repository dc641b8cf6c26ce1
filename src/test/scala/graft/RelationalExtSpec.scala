package graft

class RelationalExtSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact per group") {
    val rows = SparkEntry.queries("q25_approx_distinct")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }
}
