package graft

import org.apache.spark.sql.functions._
import graft.plans.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("hand-built cases: latest-at-or-before match, ties, no-match nulls") {
    val trades = Seq(
      (1L, 100L, "t1"), (1L, 205L, "t2"), (2L, 50L, "t3"), (3L, 10L, "t4"))
      .toDF("sym", "t", "trade")
    val quotes = Seq(
      (1L, 90L, 9.0), (1L, 100L, 10.0), (1L, 200L, 20.0), (1L, 300L, 30.0),
      (2L, 60L, 6.0))
      .toDF("q_sym", "q_t", "px")
    val out = AsOfJoin.asofJoin(trades, quotes, "sym", "q_sym", "t", "q_t")
      .select($"trade", $"px").collect().map(r =>
        r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out == Map(
      "t1" -> 10.0, // tie at t=100 matches (ASOF semantics)
      "t2" -> 20.0, // latest at-or-before 205
      "t3" -> null, // only later quotes for sym 2
      "t4" -> null)) // no quotes at all for sym 3
  }

  test("equals the window-composed as-of on real events (same tie rules)") {
    // restrict to strict inequality (gap > 0) where q27's event_id-ordered
    // window and ASOF's time-tie semantics coincide
    val native = SparkEntry.queries("q67_asof_native")(spark, sf0001)
      .filter($"us_since_click" > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val composed = SparkEntry.queries("q27_asof_join")(spark, sf0001)
      .filter($"us_since_click" > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(native.nonEmpty)
    assert(native == composed)
  }

  test("plan: custom exec node with co-partitioned exchanges and merge sorts") {
    val plan = SparkEntry.queries("q67_asof_native")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"native operator missing:\n$plan")
    // EnsureRequirements must have inserted hash exchanges + (key, time) sorts
    assert("Exchange hashpartitioning".r.findAllIn(plan).length >= 2,
      s"both sides should hash-cluster on the key:\n$plan")
    assert("\\bSort\\b".r.findAllIn(plan).nonEmpty, s"merge sorts missing:\n$plan")
  }

  test("null keys/times on either side never match and never crash") {
    val left = Seq(
      (Some(1L), Some(100L), "a"), (None, Some(100L), "b"), (Some(1L), None, "c"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (Some(1L), Some(50L), 5.0), (None, Some(40L), 4.0), (Some(1L), None, 3.0))
      .toDF("rk", "rt", "px")
    val out = AsOfJoin.asofJoin(left, right, "k", "rk", "t", "rt")
      .select($"tag", $"px").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out == Map("a" -> 5.0, "b" -> null, "c" -> null))
  }

  test("unsorted, multi-partition input still yields correct results (both variants)") {
    val left = spark.range(0, 1000)
      .select(($"id" % 7).as("k"), ($"id" * 37 % 1000).as("t"), $"id".as("lid"))
      .repartition(13)
    val right = spark.range(0, 500)
      .select(($"id" % 7).as("rk"), ($"id" * 91 % 1000).as("rt"), $"id".as("rid"))
      .repartition(5)
    // brute-force reference
    val ls = left.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rs = right.collect().map(r => (r.getLong(0), r.getLong(1)))
    for (bc <- Seq(Some(false), Some(true))) {
      val got = AsOfJoin.asofJoin(left, right, "k", "rk", "t", "rt", broadcastRight = bc)
        .select($"lid", $"rt").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      ls.foreach { case (k, t, lid) =>
        val best = rs.filter(p => p._1 == k && p._2 <= t).map(_._2).sorted.lastOption.getOrElse(-1L)
        assert(got(lid) == best, s"variant=$bc lid=$lid k=$k t=$t: got ${got(lid)} want $best")
      }
    }
  }

  test("broadcast variant: fact side keeps its partitioning, no left exchange") {
    val left = spark.range(0, 1000)
      .select(($"id" % 7).as("k"), ($"id" * 37 % 1000).as("t"), $"id".as("lid"))
      .repartition(13)
    val right = spark.range(0, 100)
      .select(($"id" % 7).as("rk"), ($"id" * 91 % 1000).as("rt"))
    val df = AsOfJoin.asofJoin(left, right, "k", "rk", "t", "rt", broadcastRight = Some(true))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsOfJoin"), s"broadcast exec missing:\n$plan")
    assert(plan.contains("BroadcastExchange"), s"right side should broadcast:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(k#"),
      s"fact side must NOT hash-shuffle:\n$plan")
    assert(df.rdd.getNumPartitions == 13, "left partitioning must be preserved")
  }

  test("string (object-backed) keys survive sort-iterator row reuse, both variants") {
    // key/time values evaluated off a reused sort-iterator wrapper would be
    // views into recycled bytes; this pins the copy-before-eval contract on
    // a multi-partition object-keyed join
    val left = spark.range(0, 5000)
      .select(concat(lit("sym_"), format_string("%03d", $"id" % 200)).as("k"),
        ($"id" * 37 % 10000).as("t"), $"id".as("lid"))
      .repartition(7)
    val right = spark.range(0, 2000)
      .select(concat(lit("sym_"), format_string("%03d", $"id" % 200)).as("rk"),
        ($"id" * 91 % 10000).as("rt"), $"id".as("rid"))
      .repartition(5)
    val expected = {
      // brute force oracle via SQL window on the composed formulation
      left.as("l").join(right.as("r"), $"l.k" === $"r.rk" && $"r.rt" <= $"l.t")
        .groupBy($"l.lid").agg(max(struct($"r.rt", $"r.rid")).as("m"))
        .select($"lid", $"m.rid".as("rid"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    for (bc <- Seq(Some(false), Some(true))) {
      val got = AsOfJoin.asofJoin(left, right, "k", "rk", "t", "rt", broadcastRight = bc)
        .filter($"rid".isNotNull)
        .collect().map(r => r.getLong(2) -> r.getLong(5)).toMap
      assert(got.size == expected.size, s"bc=$bc: ${got.size} vs ${expected.size}")
      // ties at (rt) can pick either rid; compare via the right TIME instead
      val rtOf = right.collect().map(r => r.getLong(2) -> r.getLong(1)).toMap
      assert(got.forall { case (lid, rid) => rtOf(rid) == rtOf(expected(lid)) }, s"bc=$bc")
    }
  }

  test("two broadcast as-of joins sharing one exchange, different time columns") {
    // ReuseExchange can hand both joins the SAME broadcast; the executor
    // index cache must key on the bound time column, not just broadcast id
    val left = spark.range(0, 500)
      .select(($"id" % 5).as("k"), ($"id" * 7 % 100).as("t"), $"id".as("lid"))
    val right = spark.range(0, 50)
      .select(($"id" % 5).as("rk"), ($"id" * 3 % 100).as("t1"),
        ($"id" * 11 % 100).as("t2"), $"id".as("rid"))
    def run(bc: Option[Boolean]) = {
      val j1 = AsOfJoin.asofJoin(left, right, "k", "rk", "t", "t1", bc)
        .select($"lid", $"rid", lit(1).as("src"))
      val j2 = AsOfJoin.asofJoin(left, right, "k", "rk", "t", "t2", bc)
        .select($"lid", $"rid", lit(2).as("src"))
      j1.unionByName(j2).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1), r.getInt(2))).toSet
    }
    // merge variant never touches the broadcast index cache → ground truth
    assert(run(Some(true)) == run(Some(false)))
  }

  test("mismatched key or time types are rejected at call time") {
    val l = Seq((1, 10L, "a")).toDF("k", "t", "v")
    val r = Seq((1L, 10L, 1.0)).toDF("rk", "rt", "px")
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(l, r, "k", "rk", "t", "rt")
    }
    assert(e1.getMessage.contains("key types must match"))
    val l2 = Seq((1L, 10, "a")).toDF("k", "t", "v")
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(l2, r, "k", "rk", "t", "rt")
    }
    assert(e2.getMessage.contains("time types must match"))
  }

  test("q88 tolerance: exactly q27's matches nulled where the gap exceeds 30 min") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tolUs = 30L * 60 * 1000000
    val base = SparkEntry.queries("q27_asof_join")(spark, sf0001)
      .select($"user_id", $"event_id", $"us_since_click").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val tol = SparkEntry.queries("q88_asof_tolerance")(spark, sf0001)
      .select($"user_id", $"event_id", $"us_since_click").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(tol.keySet == base.keySet, "tolerance must not drop left rows")
    tol.foreach { case (k, g) =>
      val expected = base(k).filter(_ <= tolUs)
      assert(g == expected, s"$k: $g vs base ${base(k)}")
    }
    // the tolerance must actually bite: some q27 match exceeds 30 min (so
    // q88 nulls it) — no-click purchases alone can't satisfy this
    assert(base.values.exists(v => v.exists(_ > tolUs)))
    assert(tol.values.exists(_.isDefined))
  }
}
