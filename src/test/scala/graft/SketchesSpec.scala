package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val params = Sketches.cmsParams(4, seed = 7)

  test("countMin estimates are one-sided: est >= exact for every key") {
    val keys = (Seq.fill(500)(1L) ++ Seq.fill(30)(2L) ++
      (100L until 400L) ++ (100L until 400L)).toDF("k")
    val sketch = Sketches.countMin(keys, "k", w = 32, params)
    val exact = keys.groupBy($"k").agg(count(lit(1)).as("n"))
    val est = Sketches.cmsEstimate(sketch, keys.distinct(), "k", 32, params)
    val joined = est.join(exact, "k")
      .select($"k", $"est", $"n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(joined.nonEmpty)
    assert(joined.forall { case (_, e, n) => e >= n },
      joined.filter { case (_, e, n) => e < n }.take(5).mkString(","))
    // the overshoot is bounded: est − exact ≤ 2N/w with high probability
    // (deterministic here — fixed params + data; measured overshoot 18)
    val n = joined.map(_._3).sum
    assert(joined.forall { case (_, e, x) => e - x <= 2 * n / 32 },
      joined.maxBy { case (_, e, x) => e - x }.toString)
  }

  test("countMin sketches MERGE: elementwise sum of halves equals the full sketch") {
    val all = (0L until 2000L).map(i => i % 37).toDF("k")
    val h1 = all.filter($"k" % 2 === 0)
    val h2 = all.filter($"k" % 2 =!= 0)
    def cells(df: org.apache.spark.sql.DataFrame) =
      Sketches.countMin(df, "k", w = 16, params).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val (c1, c2) = (cells(h1), cells(h2))
    val merged = (c1.keySet ++ c2.keySet).map { key =>
      key -> (c1.getOrElse(key, 0L) + c2.getOrElse(key, 0L))
    }.toMap
    assert(merged == cells(all))
  }

  test("histogramQuantiles: estimates land within one bin width of exact") {
    val li = graft.core.Tables.lineitem(spark, sf0001)
    val est = Sketches.histogramQuantiles(li, "l_extendedprice", "l_returnflag",
      bins = 1024, qs = Seq(0.5, 0.95)).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val Array(lo, hi) = li.agg(min($"l_extendedprice"), max($"l_extendedprice"))
      .collect().flatMap(r => Array(r.getDouble(0), r.getDouble(1)))
    val width = (hi - lo) / 1024
    // the precise invariant: the estimate is the midpoint of the bin
    // holding the ⌈q·n⌉-th ORDER STATISTIC, so it sits within width/2 of
    // that order stat (interpolated percentiles can straddle bins)
    val byFlag = li.select($"l_returnflag", $"l_extendedprice").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (f, vs) => f -> vs.map(_._2).sorted }
    assert(est.size == byFlag.size * 2)
    for ((flag, vs) <- byFlag; q <- Seq(0.5, 0.95)) {
      val orderStat = vs(math.ceil(q * vs.length).toInt - 1)
      assert(math.abs(est((flag, q)) - orderStat) <= width / 2 + 1e-6,
        s"$flag q=$q: est ${est((flag, q))} vs order stat $orderStat (width $width)")
    }
  }

  test("histogramQuantiles: constant column collapses to the single value") {
    val df = Seq.fill(50)(("g", 42.0)).toDF("grp", "v")
    val got = Sketches.histogramQuantiles(df, "v", "grp", 1024, Seq(0.5))
      .collect()
    assert(got.length == 1 && got(0).getDouble(2) == 42.0)
  }

  test("countMin sketch size is d x w whatever the input cardinality") {
    val wide = (0L until 5000L).toDF("k") // 5000 distinct keys
    val n = Sketches.countMin(wide, "k", w = 8, params).count()
    assert(n <= 4 * 8, s"sketch must stay bounded, got $n cells")
  }

  test("hllRho: halved-threshold geometric rank, exact at boundaries") {
    val R = Sketches.HllR
    val got = Seq(0L, 1L, R >> 22, (R >> 1) - 1, R >> 1, R >> 2, (R >> 2) - 1,
      (R >> 21) - 1, R).toDF("z")
      .select($"z", Sketches.hllRho($"z").as("rho"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // ρ(z) = smallest k with z ≥ R >> k, clamped at 23
    assert(got(R) == 1 && got(R >> 1) == 1 && got((R >> 1) - 1) == 2)
    assert(got(R >> 2) == 2 && got((R >> 2) - 1) == 3)
    assert(got(R >> 22) == 22 && got((R >> 21) - 1) == 22)
    assert(got(1L) == 22 && got(0L) == 23) // R >> 22 == 1
  }

  test("hll registers stay bounded by m and estimates land within 3 sigma") {
    val li = graft.core.Tables.lineitem(spark, sf0001)
      .select($"l_returnflag", $"l_orderkey")
    val regs = Sketches.hllRegisters(li, "l_orderkey", $"l_returnflag",
      Sketches.Hll.a, Sketches.Hll.b)
    val perGroup = regs.groupBy($"grp").count().collect()
    assert(perGroup.forall(_.getLong(1) <= Sketches.HllM),
      perGroup.mkString(","))
    val est = Sketches.hllEstimate(regs).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = li.groupBy($"l_returnflag".as("grp"))
      .agg(countDistinct($"l_orderkey").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // m = 128 ⇒ σ ≈ 1.04/√128 = 9.2%; 3σ = 28% (raw-branch regime: the
    // sf0.001 per-flag cardinalities are ≫ 2.5m)
    for ((g, n) <- exact) {
      assert(n > 2.5 * Sketches.HllM, s"$g: spec assumes raw-branch regime")
      assert(math.abs(est(g) / n - 1.0) < 0.28, s"$g: est ${est(g)} vs $n")
    }
  }

  test("hllEstimateCorrected: linear counting in the small-n zone, raw passthrough above") {
    // n = 200 < 2.5m = 320: the corrected branch must engage and land
    // within ~3σ of exact (raw HLL is meaningless at this load)
    val small = (0L until 200L).toDF("k")
    val sregs = Sketches.hllRegisters(small, "k", lit("s"), Sketches.Hll.a, Sketches.Hll.b)
    val sEst = Sketches.hllEstimateCorrected(sregs).collect().head.getDouble(1)
    assert(math.abs(sEst / 200.0 - 1.0) < 0.25, s"corrected est $sEst vs 200")
    // n = 5000 ≫ 2.5m: correction must NOT engage — corrected == raw
    val big = (0L until 5000L).toDF("k")
    val bregs = Sketches.hllRegisters(big, "k", lit("b"), Sketches.Hll.a, Sketches.Hll.b)
    val raw = Sketches.hllEstimate(bregs).collect().head.getDouble(1)
    val corr = Sketches.hllEstimateCorrected(bregs).collect().head.getDouble(1)
    assert(corr == raw, s"large-n corrected $corr must equal raw $raw")
  }

  test("hll registers MERGE: max of per-half registers equals the full table") {
    val all = (0L until 3000L).map(i => i * 7 % 1001).toDF("k") // 1001 distinct
    def regTable(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(df, "k", lit("g"), Sketches.Hll.a, Sketches.Hll.b)
        .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    val (h1, h2) = (regTable(all.filter($"k" % 2 === 0)),
      regTable(all.filter($"k" % 2 =!= 0)))
    val merged = (h1.keySet ++ h2.keySet).map { reg =>
      reg -> math.max(h1.getOrElse(reg, 0), h2.getOrElse(reg, 0))
    }.toMap
    assert(merged == regTable(all))
  }

  test("bisectQuantiles: exact order statistics through multiple descent passes") {
    // range >> bins forces >= 2 histogram passes; duplicates + a skewed
    // tail exercise the rank bookkeeping across bin boundaries
    val vals = (0 until 20000).map(i => ("g1", (i * 7919 % 1000000) / 100.0)) ++
      Seq.fill(5000)(("g1", 4242.42)) ++
      (0 until 300).map(i => ("g2", i / 100.0)) ++
      Seq(("g3", 77.77))
    val df = vals.toDF("g", "v")
    val qs = Seq(0.25, 0.5, 0.9, 1.0)
    val got = Sketches.bisectQuantiles(df, "v", "g", qs, scale = 100, bins = 64)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    val exp = vals.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      val sorted = rows.map(t => math.floor(t._2 * 100 + 0.5).toLong).sorted
      qs.map { q =>
        val k = math.ceil(q * sorted.length).toInt
        (g, q, sorted(k - 1) / 100.0)
      }
    }.sortBy(t => (t._1, t._2))
    assert(got == exp)
  }

  test("cmsJoinSize: one-sided estimate within the AMS bound on skewed keys") {
    val params = Sketches.cmsParams(4, seed = 31)
    val w = 4096
    val a = (Seq.fill(2000)(7L) ++ (0L until 3000L)).toDF("k")
    val b = (Seq.fill(500)(7L) ++ (1500L until 4000L)).toDF("ky")
    val est = Sketches.cmsJoinSize(a, "k", b, "ky", w, params)
      .head().getLong(0)
    val exact = a.join(b, $"k" === $"ky").count()
    assert(est >= exact, s"inner-product estimate $est must upper-bound exact $exact")
    val bound = (a.count() * b.count() / w) * 10 // 10x the expected overshoot
    assert(est - exact <= bound, s"overshoot ${est - exact} implausibly above AMS bound $bound")
  }

  test("heavyHitters: planted Zipf — exact output, sketch filter prunes the tail") {
    val hot = Seq.fill(3000)("hot_a") ++ Seq.fill(2000)("hot_b") ++ Seq.fill(1200)("hot_c")
    val tail = (0 until 2000).map(i => s"tail_$i") // freq 1 each
    val rows = (hot ++ tail).toDF("key")
    val n = hot.size + tail.size
    val k = 10 // thr = 820: only the three hot keys qualify
    val out = Sketches.heavyHitters(rows, "key", k, w = 1024, d = 4, seed = 9)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("hot_a", 3000L), ("hot_b", 2000L), ("hot_c", 1200L)))
    // pruning: the candidate ROW stream must cover every heavy row but
    // shed the uniform tail (a tail key passes only if all d cells
    // collide with heavy mass — vanishing at w = 1024)
    val (cand, thr) = Sketches.hhCandidates(rows, "key", k, w = 1024, d = 4, seed = 9)
    assert(thr == n / k)
    val c = cand.count()
    assert(c >= hot.size.toLong, s"candidates $c must include every heavy row")
    assert(c <= hot.size + 200L, s"tail not pruned: $c candidate rows of $n")
  }

  test("groupedHeavyHitters: per-group thresholds, exact output, planted skew") {
    // group g1: one hot key over a uniform tail; g2: all uniform (no HH)
    val rows = (Seq.fill(500)(("g1", "hot")) ++
      (0 until 300).map(i => ("g1", s"a$i")) ++
      (0 until 400).map(i => ("g2", s"b${i % 40}"))).toDF("grp", "key")
    val out = Sketches.groupedHeavyHitters(rows, "grp", "key", k = 10,
        w = 512, d = 4, seed = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // g1: thr = 800/10 = 80 -> only "hot" (500); g2: thr = 40, each key has 10
    assert(out == Seq(("g1", "hot", 500L)), s"got $out")
    // replay: census + per-group HAVING from first principles
    val all = (Seq.fill(500)(("g1", "hot")) ++
      (0 until 300).map(i => ("g1", s"a$i")) ++
      (0 until 400).map(i => ("g2", s"b${i % 40}")))
    val totals = all.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val exp = all.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .filter { case ((g, _), c) => c > totals(g) / 10 }
      .map { case ((g, key), c) => (g, key, c) }
    assert(out.toSet == exp.toSet)
  }

  test("q124z bench shape: the CMS pre-screen sheds >90% of rows before the recount") {
    // replay the q124z key construction (5% of rows on 3 hot keys, the
    // rest a per-row tail) on a synthetic orderkey column and pin the
    // candidate-row fraction the bench row exists to watch
    val keys = (1 to 6000).flatMap(ok => Seq.fill(4)(ok)).toDF("l_orderkey")
      .select(when($"l_orderkey" % 20 === 0,
          concat(lit("hot_"), $"l_orderkey" % 3))
        .otherwise(concat(lit("t"), $"l_orderkey")).as("key"))
    val n = keys.count()
    val (cand, thr) = Sketches.hhCandidates(keys, "key", k = 100,
      w = 4096, d = 4, seed = 124)
    assert(thr == n / 100)
    val c = cand.count()
    assert(c.toDouble / n < 0.10, s"candidate fraction ${c.toDouble / n} not <10%")
    // and the answer itself is the three hot keys, exact
    val out = Sketches.heavyHitters(keys, "key", k = 100, w = 4096, d = 4,
      seed = 124).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("hot_0", 400L), ("hot_1", 400L), ("hot_2", 400L)), s"got $out")
  }

  test("winsorizedStats: the clipped mean ignores both tails") {
    // 100x $1.00 + one 1-cent + one $10,000 outlier: p01 = p99 = 100
    // cents, wmean = 100 while the raw mean is dragged to 9901
    // (1010001 div 102)
    val vals = Seq.fill(100)(1.00) ++ Seq(0.01, 10000.00)
    val df = vals.toDF("o_totalprice")
    val r = Sketches.winsorizedStats(df, "o_totalprice").head()
    assert(r.getLong(0) == 102L)
    assert(r.getLong(1) == 9901L, s"raw mean: $r")
    assert(r.getLong(2) == 100L, s"winsorized mean: $r")
    assert(r.getLong(3) == 100L && r.getLong(4) == 100L, s"cutoffs: $r")
  }

  test("bounded-driver-state contracts fail LOUDLY when violated, never OOM") {
    // 50 distinct groups against a maxGroups of 10: both collect sites
    // must refuse with a pointed message (the limit-capped collect also
    // bounds what the driver pulls even in the failure path)
    val many = (0 until 50).map(i => (s"g$i", i.toDouble)).toDF("g", "v")
    val e1 = intercept[IllegalArgumentException] {
      Sketches.bisectQuantiles(many, "v", "g", Seq(0.5), maxGroups = 10)
    }
    assert(e1.getMessage.contains("bounded-groups contract"), e1.getMessage)
    val kv = (0 until 50).map(i => (s"g$i", "k")).toDF("grp", "key")
    val e2 = intercept[IllegalArgumentException] {
      Sketches.groupedHeavyHitters(kv, "grp", "key", k = 2, maxGroups = 10)
    }
    assert(e2.getMessage.contains("bounded-groups contract"), e2.getMessage)
    // within contract: identical results whatever the ceiling
    val ok = Sketches.bisectQuantiles(many, "v", "g", Seq(0.5), maxGroups = 50)
    assert(ok.count() == 50)
  }

  test("heavyHitters: output is exact even when the sketch is saturated (w = 8)") {
    // with 2003 keys in 8 buckets every estimate is inflated — the filter
    // passes nearly everything, and the exact recount must still discard
    // every sub-threshold key (one-sided error + verify = sketch-proof)
    val hot = Seq.fill(3000)("hot_a") ++ Seq.fill(2000)("hot_b") ++ Seq.fill(1200)("hot_c")
    val tail = (0 until 2000).map(i => s"tail_$i")
    val rows = (hot ++ tail).toDF("key")
    val out = Sketches.heavyHitters(rows, "key", k = 10, w = 8, d = 4, seed = 9)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("hot_a", 3000L), ("hot_b", 2000L), ("hot_c", 1200L)))
  }

  test("audienceOverlap: planted half-overlap recovered; exact census beside") {
    import org.apache.spark.sql.functions._
    // A = users 0..4999, B = 2500..7499 (both in HLL's raw regime,
    // n >= 2.5m): true intersection 2500, union 7500
    val rows = (0 until 5000).map(u => (u.toLong, "A")) ++
      (2500 until 7500).map(u => (u.toLong, "B"))
    val ev = rows.toDF("user_id", "event_type")
    val out = Sketches.audienceOverlap(ev, Sketches.Ov.a, Sketches.Ov.b).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "A" && r.getString(1) == "B")
    assert(r.getLong(6) == 2500L, "exact intersection census")
    val (estA, estB, estU, estI) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    // HLL σ ≈ 1.04/√128 ≈ 9%; inclusion-exclusion compounds three
    // estimates, so the intersection tolerance is generous
    assert(math.abs(estA - 5000) < 1500 && math.abs(estB - 5000) < 1500)
    assert(math.abs(estU - 7500) < 2000, s"union est $estU")
    assert(math.abs(estI - 2500) < 1500, s"inter est $estI")
    // register algebra invariant: union never exceeds the sum
    assert(estU <= estA + estB)
  }

  test("quantileBin: balanced buckets per group on distinct values") {
    import org.apache.spark.sql.functions._
    val rows = (1 to 100).map(i => ("a", i.toDouble)) ++
      (1 to 10).map(i => ("b", i.toDouble))
    val df = rows.toDF("grp", "v")
    val out = Sketches.quantileBin(df, "v", "grp").collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    // group a: edges 25/50/75 -> four buckets of exactly 25
    assert((0L to 3L).forall(b => out(("a", b)) == 25L), s"got $out")
    // group b: edges at k=ceil(q*10) = 3,5,8 -> sizes 3,2,3,2
    assert(out(("b", 0L)) == 3L && out(("b", 1L)) == 2L &&
      out(("b", 2L)) == 3L && out(("b", 3L)) == 2L, s"got $out")
  }

  test("skewAudit: exact quantiles, top-k share, and straggler ratio") {
    // keys 1..9 once each, key 10 eleven times: census 1x9 + 11
    val rows = (1L to 9L).map(k => (k, "x")) ++ (1 to 11).map(_ => (10L, "x"))
    val df = rows.toDF("uid", "pad")
    val out = Sketches.skewAudit(df, "uid").collect()
    assert(out.length == 1)
    val r = out.head
    // n_keys 10, n_rows 20, max 11; p50 = 5th smallest = 1,
    // p99 = 10th = 11; top-10 covers everything; ratio 11/1
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getDouble(5), r.getDouble(6)) ==
      ((10L, 20L, 11L, 1L, 11L, 1.0, 11.0)), s"got $r")
  }
}
