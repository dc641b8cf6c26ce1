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
    // q23b is gate = false (no DuckDB oracle can exist for a sketch), so it
    // lives only in the defs registry, not in SparkEntry.queries
    val q23b = graft.operators.RelationalExt.defs.find(_.name == "q23b_percentiles_approx").get
    val approx = q23b.build(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (flag, (m, p90, q1)) =>
      val (em, ep90, eq1) = exact(flag)
      assert(math.abs(m - em) / em < 0.02, s"$flag median: $m vs $em")
      assert(math.abs(p90 - ep90) / ep90 < 0.02, s"$flag p90: $p90 vs $ep90")
      assert(math.abs(q1 - eq1) / eq1 < 0.02, s"$flag q1: $q1 vs $eq1")
    }
  }

  test("q23c histogram-sketch percentiles: bin-width bound vs the discrete quantile") {
    import spark.implicits._
    // The sketch estimates the ⌈q·n⌉-th ORDER STATISTIC (midpoint of its
    // bin), so the rigorous bound — one bin width — is against the discrete
    // quantile. q23's interpolated (type-7) value additionally differs by
    // the local gap between bracketing order stats, which at tiny SF
    // exceeds a 4096th bin; that side gets a loose relative check so the
    // bench row stays tied to q23's exact numbers.
    val Array(lo, hi) = graft.core.Tables.lineitem(spark, sf0001)
      .agg(min($"l_extendedprice").cast("double"), max($"l_extendedprice").cast("double"))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    val binWidth = (hi - lo) / 4096
    val discrete = graft.core.Tables.lineitem(spark, sf0001)
      .groupBy($"l_returnflag")
      .agg(sort_array(collect_list($"l_extendedprice".cast("double"))).as("xs"))
      .select($"l_returnflag", explode(array(lit(0.5), lit(0.9))).as("q"),
        element_at($"xs", ceil(lit(0.5) * size($"xs")).cast("int")).as("d50"),
        element_at($"xs", ceil(lit(0.9) * size($"xs")).cast("int")).as("d90"))
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (if (r.getDouble(1) == 0.5) r.getDouble(2) else r.getDouble(3))).toMap
    val exact = SparkEntry.queries("q23_percentiles")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val q23c = graft.operators.RelationalExt.defs.find(_.name == "q23c_percentiles_sketch").get
    val est = q23c.build(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(est.keySet == discrete.keySet && est.keySet.map(_._1) == exact.keySet)
    est.foreach { case (k @ (flag, q), e) =>
      assert(math.abs(e - discrete(k)) <= binWidth,
        s"$flag q$q: $e vs discrete ${discrete(k)} (bin $binWidth)")
      val interp = if (q == 0.5) exact(flag)._1 else exact(flag)._2
      assert(math.abs(e - interp) / interp < 0.005,
        s"$flag q$q: $e vs interpolated $interp")
    }
  }

  test("HLL sketches are mergeable: per-source partials union to the global estimate") {
    // The 100 TB distinct-count pattern: build one sketch per shard/day,
    // persist them (bytes), and answer global/rolling questions by UNION —
    // never rescanning history. Partial-union estimate must equal the
    // single-pass estimate exactly (same sketch algebra) and track the
    // exact count within HLL error.
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sf0001)
    val perSource = docs.groupBy($"source")
      .agg(expr("hll_sketch_agg(text)").as("sk"))
    val merged = perSource.agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .head().getLong(0)
    val single = docs.agg(expr("hll_sketch_estimate(hll_sketch_agg(text))").as("est"))
      .head().getLong(0)
    val exact = docs.select(countDistinct($"text")).head().getLong(0)
    // union promotes the sketch representation, so partial-union is not
    // bit-identical to single-pass — but both must sit inside HLL error
    assert(math.abs(merged - single).toDouble / single < 0.02,
      s"merge-of-partials ($merged) drifted from single-pass ($single)")
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"estimate $merged vs exact $exact")
  }

  test("q64 emits SQL NULL (not NaN) for single-element groups") {
    import spark.implicits._
    val out = SparkEntry.queries("q64_typed_mapgroups")(spark, sf0001)
    val nullable = out.filter($"n_items" === 1)
    // every single-element group must have a NULL second_price, never NaN
    assert(nullable.filter($"second_price".isNotNull).count() == 0)
    assert(out.filter(isnan($"second_price")).count() == 0)
  }

  test("corrMatrix: exact ±1 on affine columns, one aggregation pass") {
    import spark.implicits._
    // y = 2x and z = -3x: every pairwise correlation is exactly ±1
    val df = (1 to 8).map(i => (i.toDouble, 2.0 * i, -3.0 * i)).toDF("x", "y", "z")
    val out = graft.operators.RelationalExt.corrMatrix(df, Seq("x", "y", "z"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(out == Map(("x", "y") -> 1.0, ("x", "z") -> -1.0, ("y", "z") -> -1.0),
      s"got $out")
    // one scan whatever the pair count: a single Aggregate feeds the
    // explode — no union of per-pair aggregations
    val plan = graft.operators.RelationalExt.corrMatrix(df, Seq("x", "y", "z"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Union"), s"per-pair union would re-scan:\n$plan")
  }

  test("basketRules: hand-built baskets give exact support/confidence/lift") {
    import spark.implicits._
    // orders 1-3 hold {A,B} (A twice in order 1 — distinct must collapse
    // it), order 4 {A,C}, order 5 {B}: only (A,B) reaches support 3
    val A = 10L; val B = 20L; val C = 30L
    val li = Seq(
      (1L, A), (1L, A), (1L, B), (2L, A), (2L, B), (3L, A), (3L, B),
      (4L, A), (4L, C), (5L, B))
      .toDF("l_orderkey", "l_partkey")
    val out = graft.operators.RelationalExt.basketRules(li).collect()
    assert(out.length == 1, s"only (A,B) passes minSupport: ${out.toSeq}")
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (A, B, 3L))
    // n_orders = 5, n_A = 4, n_B = 4: support 3/5, conf 3/4 both ways,
    // lift 3*5/16 = 0.9375 — all exact on the 1e-6 grid
    assert(r.getDouble(3) == 0.6 && r.getDouble(4) == 0.75 &&
      r.getDouble(5) == 0.75 && r.getDouble(6) == 0.9375, s"got $r")
  }

  test("basketRules: the maxBasket cap drops a planted mega-basket whole") {
    import spark.implicits._
    val A = 10L; val B = 20L
    val normal = Seq(
      (1L, A), (1L, B), (2L, A), (2L, B), (3L, A), (3L, B), (4L, A), (5L, B))
    // order 9 is a 12-item pseudo-basket (every part once)
    val mega = (100L to 111L).map(p => (9L, p))
    val li = (normal ++ mega).toDF("l_orderkey", "l_partkey")
    val capped = graft.operators.RelationalExt.basketRules(li, maxBasket = 10)
      .collect()
    // with order 9 dropped the denominator is 5: support 3/5
    assert(capped.length == 1 && capped.head.getDouble(3) == 0.6, s"got ${capped.toSeq}")
    // uncapped: mega pairs still die to minSupport but order 9 stays in
    // the denominator — support 3/6
    val uncapped = graft.operators.RelationalExt.basketRules(li).collect()
    assert(uncapped.length == 1 && uncapped.head.getDouble(3) == 0.5,
      s"got ${uncapped.toSeq}")
  }

  test("alsoBought: both directions of a rule recommend with their own confidence") {
    import spark.implicits._
    val A = 10L; val B = 20L; val C = 30L
    val li = Seq(
      (1L, A), (1L, B), (2L, A), (2L, B), (3L, A), (3L, B),
      (4L, A), (4L, C), (5L, B))
      .toDF("l_orderkey", "l_partkey")
    val out = graft.operators.RelationalExt.alsoBought(li).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    // one rule (A,B): A recommends B at conf 3/4 and vice versa
    assert(out == Map((A, 1) -> ((B, 0.75)), (B, 1) -> ((A, 0.75))), s"got $out")
  }

  test("supplierConcentration: single-sourced part scores HHI 1, even split 0.5") {
    import spark.implicits._
    val li = Seq((1L, 100L), (1L, 100L), (1L, 100L),
      (2L, 100L), (2L, 200L), (2L, 100L), (2L, 200L))
      .toDF("l_partkey", "l_suppkey")
    val out = graft.operators.RelationalExt.supplierConcentration(li).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) == ((3L, 1L, 1.0)), s"got ${out(1L)}")
    assert(out(2L) == ((4L, 2L, 0.5)), s"got ${out(2L)}")
  }

  test("supplierReturnRates: volume floor drops noise, rate ranks the rest") {
    import spark.implicits._
    // supplier 1: 10 lines, 5 returns (0.5); supplier 2: 10 lines, 2
    // returns (0.2); supplier 3: 2 lines 2 returns — below the floor
    val li = ((0 until 10).map(i => (1L, if (i < 5) "R" else "N")) ++
      (0 until 10).map(i => (2L, if (i < 2) "R" else "N")) ++
      Seq((3L, "R"), (3L, "R")))
      .toDF("l_suppkey", "l_returnflag")
    val out = graft.operators.RelationalExt.supplierReturnRates(li).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 0.5), (2L, 0.2)), s"got ${out.toSeq}")
  }

  test("discountBands: exact cents per band, integer-division averages") {
    import spark.implicits._
    val li = Seq((4.0, 100.00, 0.05), (6.0, 200.00, 0.05), (10.0, 50.00, 0.00))
      .toDF("l_quantity", "l_extendedprice", "l_discount")
    val out = graft.operators.RelationalExt.discountBands(li).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // band 5: net 95.00 + 190.00 = 285.00 -> 28500 cents, avg 14250
    assert(out(5L) == ((2L, 10L, 28500L, 5L, 14250L)), s"got ${out(5L)}")
    assert(out(0L) == ((1L, 10L, 5000L, 10L, 5000L)), s"got ${out(0L)}")
  }

  test("revenueByPartType: first p_type word buckets the broadcast dim join") {
    import spark.implicits._
    val part = Seq((1L, "ECONOMY ANODIZED STEEL"), (2L, "STANDARD BURNISHED TIN"))
      .toDF("p_partkey", "p_type")
    val li = Seq((1L, 10.00, 0.0), (2L, 5.00, 0.0), (2L, 5.00, 0.0))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    val out = graft.operators.RelationalExt.revenueByPartType(li, part).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map("ECONOMY" -> ((1L, 1000L)), "STANDARD" -> ((2L, 1000L))),
      s"got $out")
  }

  test("benfordAudit: digit census from exact cents, literal expectations") {
    import spark.implicits._
    val df = Seq(1.00, 19.99, 2.50, 0.30, 9000.00).toDF("o_totalprice")
    val out = graft.operators.RelationalExt.benfordAudit(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    // cents 100, 1999, 250, 30, 900000 -> digits 1,1,2,3,9; the report
    // drives from the expected table, so unobserved digits SURFACE with
    // obs_share 0 — the most anomalous Benford outcome, not a dropped row
    assert(out.keySet == Set("1", "2", "3", "4", "5", "6", "7", "8", "9"))
    assert(out("1") == ((2L, 0.4, 0.301030)), s"got ${out("1")}")
    assert(out("2")._1 == 1L && out("2")._2 == 0.2)
    assert(out("9")._3 == 0.045757)
    assert(out("4") == ((0L, 0.0, 0.096910)), s"got ${out("4")}")
  }

  test("demandSeasonality: index against the brand's own observed-period mean") {
    import spark.implicits._
    val dayUs = 86400000000L
    val li = Seq((1L, 10L, 10.0), (2L, 10L, 30.0), (3L, 20L, 5.0))
      .toDF("l_orderkey", "l_partkey", "l_quantity")
    val ord = Seq((1L, 0L), (2L, 35L), (3L, 0L)).toDF("o_orderkey", "d")
      .select($"o_orderkey", timestamp_micros($"d" * dayUs).as("o_orderdate"))
    val part = Seq((10L, "BrandA"), (20L, "BrandB")).toDF("p_partkey", "p_brand")
    val out = graft.operators.RelationalExt.demandSeasonality(li, ord, part)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // BrandA: periods 0 (qty 10) and 1 (qty 30), mean 20 -> idx 0.5 / 1.5
    assert(out(("BrandA", 0L)) == ((10L, 0.5)), s"got $out")
    assert(out(("BrandA", 1L)) == ((30L, 1.5)), s"got $out")
    assert(out(("BrandB", 0L)) == ((5L, 1.0)), s"got $out")
  }

  test("discountElasticity: a planted line recovers its exact slope") {
    import spark.implicits._
    // y = 2x + 1 on pennies x in {0, 5, 10} -> slope 2.0 exactly
    val li = Seq((10L, 0.00, 1.0), (10L, 0.05, 11.0), (10L, 0.10, 21.0))
      .toDF("l_partkey", "l_discount", "l_quantity")
    val part = Seq((10L, "BrandA"), (20L, "BrandC")).toDF("p_partkey", "p_brand")
    val out = graft.operators.RelationalExt.discountElasticity(li, part)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), Option(r.get(2))))).toMap
    assert(out("BrandA") == ((3L, Some(2.0))), s"got $out")
    // single-discount brand -> NULL slope, never a divide-by-zero
    val li2 = Seq((20L, 0.05, 7.0), (20L, 0.05, 9.0))
      .toDF("l_partkey", "l_discount", "l_quantity")
    val out2 = graft.operators.RelationalExt.discountElasticity(li2, part)
      .collect().map(r => r.getString(0) -> Option(r.get(2))).toMap
    assert(out2("BrandC").isEmpty, s"got $out2")
  }

  test("slaAttainment: on-time shares split at the 10-day boundary") {
    import spark.implicits._
    val dayUs = 86400000000L
    // order 1 (URGENT, period 0): ships at 10d (on time) and 11d (late);
    // order 2 (LOW, period 0): ships at 1d
    val li = Seq((1L, 10L), (1L, 11L), (2L, 1L)).toDF("l_orderkey", "sd")
      .select($"l_orderkey", timestamp_micros($"sd" * dayUs).as("l_shipdate"))
    val ord = Seq((1L, "1-URGENT"), (2L, "5-LOW")).toDF("o_orderkey", "o_orderpriority")
      .select($"o_orderkey", $"o_orderpriority",
        timestamp_micros(lit(0L)).as("o_orderdate"))
    val out = graft.operators.RelationalExt.slaAttainment(li, ord).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out("1-URGENT") == ((2L, 0.5)), s"got $out")
    assert(out("5-LOW") == ((1L, 1.0)), s"got $out")
  }

  test("mixResiduals: independence expectations, signed residuals, zero cells surface") {
    import spark.implicits._
    // nation 1: 3xA + 1xB; nation 2: 1xA + 3xB; nation 3: 2xA only
    val ord = (Seq.fill(3)((1L, "A")) ++ Seq((1L, "B")) ++ Seq((2L, "A")) ++
      Seq.fill(3)((2L, "B")) ++ Seq.fill(2)((3L, "A")))
      .zipWithIndex.map { case ((c, p), i) => (i.toLong, c, p) }
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val cust = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("c_custkey", "c_nationkey")
    val out = graft.operators.RelationalExt.mixResiduals(ord, cust).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // grand 10, rows 4/4/2, cols A=6 B=4
    assert(out((10L, "A")) == ((3L, 2.4, 0.6)), s"got $out")
    assert(out((20L, "A")) == ((1L, 2.4, -1.4)), s"got $out")
    // the ZERO cell (nation 3 never files B) appears with its expectation
    assert(out((30L, "B")) == ((0L, 0.8, -0.8)), s"got $out")
    assert(out.size == 6)
  }

  test("forecastBaseline: a perfectly seasonal series scores ratio 0") {
    import spark.implicits._
    val dayUs = 86400000000L
    // qty alternates 10/20 by period parity over periods 0..13; the
    // season lag (12, even) preserves parity -> e_seas = 0 while the
    // naive error is 10 per compared period
    val li = (0L to 13L).map(p => (p, 100L, if (p % 2 == 0) 10.0 else 20.0))
      .toDF("pp", "l_partkey", "l_quantity")
      .withColumn("l_orderkey", $"pp")
    val ord = (0L to 13L).map(p => (p, p * 30 * dayUs)).toDF("o_orderkey", "t")
      .select($"o_orderkey", timestamp_micros($"t").as("o_orderdate"))
    val part = Seq((100L, "BrandA")).toDF("p_partkey", "p_brand")
    val out = graft.operators.RelationalExt
      .forecastBaseline(li.drop("pp"), ord, part).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out("BrandA") == ((2L, 20L, 0L, 0.0)), s"got $out")
  }

  test("basketDispersion: mega-basket skew pushes the index far above 1") {
    import spark.implicits._
    // 9 single-line orders + one 11-line order: m=10, sc=20, scc=130
    // -> D = (1300 - 400)/200 = 4.5
    val li = ((1L to 9L).map(o => (o, 1)) ++ Seq((10L, 11))).flatMap {
      case (o, c) => Seq.fill(c)(o)
    }.toDF("l_orderkey")
    val out = graft.operators.RelationalExt.basketDispersion(li).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out(1L) == ((9L, 0.9, 4.5)), s"got $out")
    assert(out(11L) == ((1L, 0.1, 4.5)), s"got $out")
  }

  test("leadTimeTrend: a degrading supplier tops the list, stable ones score 0") {
    import spark.implicits._
    val dayUs = 86400000000L
    // supplier 1: gap grows 1 day per period (slope 1); supplier 2: flat
    // gap 5 (slope 0); both with 20+ lines across periods 0..9
    val rows = (0L to 9L).flatMap { p =>
      (1 to 2).flatMap { rep =>
        Seq((p * 100 + rep, 1L, p, p + 1), (p * 100 + 10 + rep, 2L, p, 5L))
      }
    }
    val li = rows.map { case (ok, sk, p, gap) => (ok, sk, (p * 30 + gap) * dayUs) }
      .toDF("l_orderkey", "l_suppkey", "st")
      .select($"l_orderkey", $"l_suppkey", timestamp_micros($"st").as("l_shipdate"))
    val ord = rows.map { case (ok, _, p, _) => (ok, p * 30 * dayUs) }
      .toDF("o_orderkey", "ot")
      .select($"o_orderkey", timestamp_micros($"ot").as("o_orderdate"))
    val out = graft.operators.RelationalExt.leadTimeTrend(li, ord).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
    assert(out.head == ((1L, (20L, 1.0))), s"got ${out.toSeq}")
    assert(out.toMap.apply(2L) == ((20L, 0.0)), s"got ${out.toSeq}")
  }

  test("integrityAudit: planted orphans and duplicate keys are counted") {
    import spark.implicits._
    // order 99 is referenced by a lineitem but missing; order 2 appears
    // twice (dup pk); order 3 points at a missing customer
    val li = Seq((1L, 100L), (2L, 200L), (99L, 300L))
      .toDF("l_orderkey", "l_partkey")
    val ord = Seq((1L, 10L), (2L, 10L), (2L, 20L), (3L, 777L))
      .toDF("o_orderkey", "o_custkey")
    val cust = Seq(10L, 20L).toDF("c_custkey")
    val r = graft.operators.RelationalExt.integrityAudit(li, ord, cust)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((3L, 1L, 4L, 1L, 1L)), s"got $r")
  }
}
