package graft

import org.apache.spark.sql.functions._
import graft.flow._

class WeightedHistogramSpec extends SparkSpec {
  import spark.implicits._

  test("typed aggregator equals the exploded HistogramPass") {
    val li = graft.core.Tables.lineitem(spark, sf0001)
    val (n, lo, hi) = (40, 0.0, 120000.0)
    val agg = li.agg(WeightedHistogram.column(n, lo, hi, $"l_extendedprice", $"l_quantity").as("h"))
      .select($"h.counts", $"h.sumw", $"h.sumw2").head()
    val counts = agg.getSeq[Long](0)
    val sumw = agg.getSeq[Double](1)

    val root = Selection.root("all", $"l_quantity")
    val pass = HistogramPass.run(li,
      Seq(Plot("h", $"l_extendedprice", root, EquidistantBinning(n, lo, hi))))
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getDouble(3))).toMap

    pass.foreach { case (bucket, (cnt, sw)) =>
      val idx = bucket + 1 // aggregator index 0 = underflow(-1)
      assert(counts(idx) == cnt, s"bucket $bucket count")
      assert(math.abs(sumw(idx) - sw) < 1e-6, s"bucket $bucket sumw")
    }
    assert(counts.sum == li.count())
  }

  test("under/overflow land in the edge slots and merges are exact") {
    val df = Seq((-5.0, 1.0), (0.0, 2.0), (9.99, 3.0), (10.0, 4.0), (25.0, 5.0))
      .toDF("x", "w").repartition(3) // forces partial buffers + merge
    val r = df.agg(WeightedHistogram.column(2, 0.0, 10.0, $"x", $"w").as("h"))
      .select($"h.counts", $"h.sumw").head()
    val counts = r.getSeq[Long](0)
    val sumw = r.getSeq[Double](1)
    assert(counts.toSeq == Seq(1L, 1L, 1L, 2L)) // under, [0,5), [5,10), over
    assert(sumw.toSeq == Seq(1.0, 2.0, 3.0, 9.0))
  }
}
