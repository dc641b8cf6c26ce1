package graft

import org.apache.spark.sql.functions._

/** q112's fold on planted users covering the ordering edge cases the
  * corpus gate can't guarantee to exercise: stages out of order, ties at
  * stage boundaries (strict >), and missing stages. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def funnel(events: Seq[(Long, String, Long)]): (Long, Long, Long) = {
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    // planted times are MILLISECONDS (the Timestamp(ms) constructor's
    // unit), so ordering and deliberate ties survive the µs conversion
    events.map { case (u, ty, tMs) =>
      (u * 1000 + tMs, new java.sql.Timestamp(tMs), u, ty, 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q112_funnel")(spark, dir).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("complete funnel counts once per user; stages must be strictly ordered") {
    // u1: signup(10) → click(20) → purchase(30): full conversion
    // u2: click(5) BEFORE signup(10), purchase(20) with no click after
    //     signup → signup only
    // u3: signup(10), click(10) — tie excluded (strict >) → signup only
    // u4: signup(10), click(20), purchase(15) — purchase BEFORE the click
    //     → no purchase stage
    // u5: no signup at all → not even stage 1
    val (s, c, p) = funnel(Seq(
      (1L, "signup", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "click", 5L), (2L, "signup", 10L), (2L, "purchase", 20L),
      (3L, "signup", 10L), (3L, "click", 10L),
      (4L, "signup", 10L), (4L, "click", 20L), (4L, "purchase", 15L),
      (5L, "click", 10L), (5L, "purchase", 20L)))
    assert((s, c, p) == ((4L, 2L, 1L)),
      s"expected 4 signups, 2 clicks-after, 1 purchase-after; got ($s, $c, $p)")
  }

  test("the FIRST qualifying click gates the purchase, not a later one") {
    // signup(10), click(20), purchase(25), click(30): the purchase at 25
    // follows the FIRST post-signup click (20) → converts. A formulation
    // using the LAST click (30) would miss it.
    val (s, c, p) = funnel(Seq(
      (1L, "signup", 10L), (1L, "click", 20L),
      (1L, "purchase", 25L), (1L, "click", 30L)))
    assert((s, c, p) == ((1L, 1L, 1L)))
  }
}
