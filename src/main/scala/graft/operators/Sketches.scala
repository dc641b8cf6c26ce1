package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}

/** Mergeable frequency sketches — the bounded-memory path for frequency
  * questions over HIGH-CARDINALITY keys (URLs, user ids, shingle hashes)
  * where an exact census would itself be a large table. The exact census
  * (q81-style partial agg) stays the right tool for bounded vocabularies;
  * Count-Min is for the regime where even the aggregated key space
  * doesn't fit: the sketch is d×w cells whatever the key cardinality, and
  * cells are pure counters, so per-partition sketches MERGE by elementwise
  * addition — the same partial-agg → combine contract Spark's own
  * aggregates scale by ([[graft.SparkEntry]] q25's HLL covers the
  * distinct-count face of this; this module covers frequency).
  *
  * Hash family: multiplicative-shift `((key·Aⱼ + Bⱼ) mod P) mod w` with
  * literal constants — pure integer arithmetic, deterministic on any
  * executor and replayable in an external engine's SQL (the same scheme
  * as the literal-seeded LSH planes). P = 1e9+7; key·Aⱼ stays ≪ 2⁶³ for
  * any realistic id (ANSI mode would throw on real overflow — loudly,
  * not wrongly).
  */
object Sketches {

  val P = 1000000007L

  /** Deterministic per-row hash constants for the d rows of the sketch
    * (seeded PRNG — stable, literal, engine-portable). Multipliers are
    * ODD in [2³⁰, 2³¹): every unit key step then wraps P at least once,
    * so `(k·A + B) mod P` mixes all key bits BEFORE the `mod w` bucket
    * reduction. A small multiplier never wraps P for small keys, the mod
    * P is then a no-op, and the bucket degenerates to `k·A mod w` — keys
    * congruent mod w collide in EVERY row (measured: est 518 vs exact 2).
    * Valid for |key| < 2³² (k·A stays within Long; ANSI throws loudly
    * beyond, never aliases). */
  def cmsParams(d: Int, seed: Long): Seq[(Long, Long)] = {
    val r = new scala.util.Random(seed)
    Seq.fill(d)(((1L << 30) + r.nextInt(1 << 29).toLong * 2 + 1,
      r.nextInt(1 << 30).toLong))
  }

  private def bucket(key: Column, a: Long, b: Long, w: Int): Column =
    pmod(key * lit(a) + lit(b), lit(P)) % w

  /** Build the Count-Min table: (j, bucket, c) — d·w rows at most,
    * whatever the input cardinality. One explode (d small) + one
    * partial-aggregated groupBy: the shuffle carries at most d·w rows per
    * map partition. */
  def countMin(df: DataFrame, keyCol: String, w: Int,
      params: Seq[(Long, Long)]): DataFrame = {
    val rows = params.zipWithIndex.map { case ((a, b), j) =>
      struct(lit(j).as("j"), bucket(col(keyCol), a, b, w).as("bucket"))
    }
    df.select(explode(array(rows: _*)).as("r"))
      .groupBy(col("r.j").as("j"), col("r.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point estimates for `queries` against a built sketch: the min over
    * the d cells each key hashes to. Guaranteed ≥ the exact count
    * (one-sided error); expected overshoot ≤ 2N/w per row pair. The
    * sketch is d·w rows → broadcast; the query side stays a map stage. */
  def cmsEstimate(sketch: DataFrame, queries: DataFrame, keyCol: String,
      w: Int, params: Seq[(Long, Long)]): DataFrame = {
    val probes = params.zipWithIndex.map { case ((a, b), j) =>
      struct(lit(j).as("j"), bucket(col(keyCol), a, b, w).as("bucket"))
    }
    queries
      .select(col(keyCol), explode(array(probes: _*)).as("r"))
      .select(col(keyCol), col("r.j").as("j"), col("r.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** Equi-join cardinality estimate from two Count-Min sketches — the
    * planning primitive for join-strategy decisions (broadcast vs
    * shuffle, salting, AQE hints) WITHOUT scanning either side:
    * |A ⋈ B| = Σ_k f_A(k)·f_B(k), estimated by the sketch inner product
    * min_j Σ_bucket A_j[b]·B_j[b]. With non-negative counts every cell
    * product is the true contribution PLUS collision cross-terms, so the
    * estimate is ONE-SIDED (≥ exact, like the point estimates) with
    * expected overshoot ≤ ‖f_A‖₁·‖f_B‖₁/w per row — the classic
    * AMS/CMS bound. Each side collapses to d·w counters map-side; the
    * inner product is a d·w-cell join — O(1) in both corpus sizes.
    * Missing cells are zero and contribute nothing, so the inner join
    * over materialized cells is exact. Pure integer arithmetic end to
    * end — replayable in an external engine's SQL. */
  def cmsJoinSize(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
      w: Int, params: Seq[(Long, Long)]): DataFrame = {
    val sa = countMin(a, aKey, w, params)
    val sb = countMin(b, bKey, w, params)
      .select(col("j"), col("bucket"), col("c").as("cb"))
    sa.join(sb, Seq("j", "bucket"))
      .groupBy(col("j"))
      .agg(sum(col("c") * col("cb")).as("s"))
      .agg(min(col("s")).as("est"))
  }

  /** EXACT heavy hitters over unbounded key cardinality — the two-pass
    * sketch-then-verify composition (the classic production shape when even
    * the DISTINCT key set is too large to shuffle, e.g. n-grams on a crawl;
    * for bounded vocabularies the one-pass census `Curation.buildVocab` is
    * the right tool).
    *
    * Pass 1 builds a Count-Min sketch (d×w counters, partial-aggregated —
    * the only driver-side state is the sketch itself, which IS the bounded
    * summary; same discipline as the 1-row/round BPE winner). Pass 2
    * re-scans, keeps only rows whose sketch estimate exceeds n/k — a
    * row-local probe against the d PLAN-LITERAL count arrays, no join, no
    * per-row groupBy — and exactly recounts the survivors. CMS error is
    * ONE-SIDED (est ≥ true count, always), so the candidate set is a
    * guaranteed SUPERSET of the true heavy hitters and the exact recount
    * discards every false positive: the output is the EXACT set
    * {key : freq(key) > n/k}, independent of sketch parameters. That is
    * why the gate oracle is a plain census HAVING — the sketch bounds
    * pass-2's shuffle (only candidate-key rows, O(heavy mass + collision
    * noise) instead of the full vocabulary) but can never change the
    * answer. w tunes the noise floor (expected overshoot ≤ 2n/w per
    * cell-probe): w ≳ k·(avg collisions tolerated) keeps the candidate
    * shuffle near the true heavy mass. SketchesSpec plants a Zipf stream
    * and pins the pruning (candidate fraction ≪ 1) as well as exactness.
    *
    * Keys of any type: xxhash64 → mod P folds them into the CMS integer
    * domain; hash collisions only ADD counts (superset property intact),
    * and pass 2 groups by the ORIGINAL key, so the recount is exact. */
  def heavyHitters(rows: DataFrame, keyCol: String, k: Int,
      w: Int = 1024, d: Int = 4, seed: Long = 124): DataFrame = {
    val (candidates, thr) = hhCandidates(rows, keyCol, k, w, d, seed)
    candidates
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") > lit(thr))
      .orderBy(desc("freq"), col(keyCol))
  }

  /** Per-group exact heavy hitters — [[heavyHitters]] with the threshold
    * taken per group (every key above n_g/k within ITS group, e.g. the
    * boilerplate n-grams of each crawl domain). ONE global sketch serves
    * all groups: a global CMS cell includes every group's occurrences, so
    * est ≥ count_g for any group and the superset property survives the
    * per-group thresholds; the exact recount then filters per group.
    * Group thresholds are bounded driver state (groups × 1 longs — the
    * bounded-groups contract, like `bisectQuantiles`' brackets) rebuilt
    * as a LITERAL broadcast frame, so pass 2 carries a single corpus
    * lineage: probe → per-group filter → (grp, key) partial-agg recount. */
  def groupedHeavyHitters(rows: DataFrame, grpCol: String, keyCol: String,
      k: Int, w: Int = 1024, d: Int = 4, seed: Long = 137,
      maxGroups: Int = 100000): DataFrame = {
    require(k >= 2 && w >= 2 && d >= 2, s"invalid params k=$k w=$w d=$d")
    val spark = rows.sparkSession
    import spark.implicits._
    val params = cmsParams(d, seed)
    val keyed = rows.select(col(grpCol), col(keyCol),
      pmod(xxhash64(col(keyCol)), lit(P)).as("hk"))
    val cells = countMin(keyed, "hk", w, params).collect()
    val tables = Array.fill(d)(new Array[Long](w))
    cells.foreach(r => tables(r.getInt(0))(r.getLong(1).toInt) = r.getLong(2))
    // bounded per-group thresholds, re-issued as a literal frame (no
    // lineage back to the corpus — a derived-frame join would re-scan).
    // The bounded-groups CONTRACT is enforced, not assumed: the collect is
    // limit-capped so a violation fails with a pointed message instead of
    // silently OOMing the driver at scale.
    val thrRows = keyed.groupBy(col(grpCol))
      .agg(expr(s"count(1) div $k").as("thr"))
      .limit(maxGroups + 1).collect()
    require(thrRows.length <= maxGroups,
      s"groupedHeavyHitters: >$maxGroups distinct '$grpCol' groups — the " +
        "per-group threshold table is driver state and this group column " +
        "violates the bounded-groups contract; raise maxGroups only if the " +
        "driver can hold that many rows, or sketch per group (q102) instead")
    val thr = thrRows
      .map(r => (r.getString(0), r.getLong(1))).toSeq
      .toDF(grpCol, "thr")
    val est = least(params.zipWithIndex.map { case ((a, b), j) =>
      element_at(lit(tables(j)), (bucket(col("hk"), a, b, w) + 1).cast("int"))
    }: _*)
    keyed.join(broadcast(thr), Seq(grpCol))
      .filter(est > col("thr"))
      .groupBy(col(grpCol), col(keyCol), col("thr"))
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") > col("thr"))
      .select(col(grpCol), col(keyCol), col("freq"))
      .orderBy(col(grpCol), desc("freq"), col(keyCol))
  }

  /** Pass-1½ of [[heavyHitters]]: the candidate ROW stream (rows whose
    * key's sketch estimate exceeds n/k) plus the threshold — exposed so
    * SketchesSpec can pin the pruning ratio on planted Zipf data, which
    * the output alone cannot reveal (the recount is exact regardless). */
  private[graft] def hhCandidates(rows: DataFrame, keyCol: String, k: Int,
      w: Int, d: Int, seed: Long): (DataFrame, Long) = {
    require(k >= 2 && w >= 2 && d >= 2, s"invalid heavy-hitter params k=$k w=$w d=$d")
    val params = cmsParams(d, seed)
    val keyed = rows.select(col(keyCol), pmod(xxhash64(col(keyCol)), lit(P)).as("hk"))
    // bounded collect: d·w counters, whatever the corpus size
    val cells = countMin(keyed, "hk", w, params).collect()
    val tables = Array.fill(d)(new Array[Long](w))
    cells.foreach(r => tables(r.getInt(0))(r.getLong(1).toInt) = r.getLong(2))
    val n = tables(0).sum // every row lands in exactly one j=0 cell
    val thr = n / k
    val est = least(params.zipWithIndex.map { case ((a, b), j) =>
      element_at(lit(tables(j)), (bucket(col("hk"), a, b, w) + 1).cast("int"))
    }: _*)
    (keyed.filter(est > lit(thr)), thr)
  }

  /** Equi-width histogram quantile sketch — the MERGEABLE approximate-
    * percentile path whose output (unlike an internal KLL/GK sketch) is a
    * plain deterministic dag, so the estimate itself is oracle-checkable:
    * bin counts over [lo, hi] partial-aggregate map-side and merge by
    * addition; a quantile estimate is the midpoint of the first bin whose
    * cumulative count reaches ⌈q·n⌉. Error is bounded by the bin width
    * (hi−lo)/bins — the spec pins estimates against exact percentiles.
    * At 100 TB: one stats pass (min/max), one binned partial-agg shuffle
    * of ≤ groups·bins rows, one tiny window — state per group is `bins`
    * counters however many rows stream through (the q23 exact-percentile
    * state bound this path exists to avoid). Global [lo, hi] keeps bins
    * comparable across groups (per-group ranges would tighten error at
    * the cost of non-mergeable bin edges). */
  def histogramQuantiles(df: DataFrame, valCol: String, groupCol: String,
      bins: Int, qs: Seq[Double]): DataFrame = {
    val v = col(valCol).cast("double")
    val stats = df.agg(min(v).as("lo"), max(v).as("hi"))
    val bin = when(col("hi") === col("lo"), lit(0L))
      .otherwise(least(floor((v - col("lo")) / (col("hi") - col("lo")) * bins),
        lit(bins - 1L)).cast("long"))
    val counts = df.crossJoin(broadcast(stats))
      .select(col(groupCol), bin.as("bin"), col("lo"), col("hi"))
      .groupBy(col(groupCol), col("bin"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("c"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("bin"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    counts
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .crossJoin(broadcast(df.sparkSession.range(1)
        .select(explode(array(qs.map(lit): _*)).as("q"))))
      .filter(col("cum") >= ceil(col("q") * col("n")))
      .groupBy(col(groupCol), col("q"), col("lo"), col("hi"), col("n"))
      .agg(min(col("bin")).as("qbin"))
      .select(col(groupCol), col("q"),
        (floor((col("lo") + (col("qbin") + lit(0.5)) * (col("hi") - col("lo")) / bins)
          * 1e6 + 0.5) / 1e6).as("est"))
  }

  /** EXACT per-group quantiles with BOUNDED state — the classic iterative
    * histogram bisection (the MapReduce exact-median recipe), the third
    * leg of the percentile family: q23 buffers every value (exact,
    * unbounded state), q102 bounds state but approximates; this bounds
    * state AND is exact. The trade is passes: log_B(range) scans instead
    * of one (2 passes at B = 4096 over a 10⁷-value grid).
    *
    * Works on a FIXED-PRECISION domain: values are mapped to an integer
    * grid (`iv = floor(v·scale + 0.5)` — a bijection when the data
    * carries ≤ log₁₀(scale) decimals, as currency does), and the k-th
    * order statistic (k = ⌈q·n⌉) is found by repeatedly histogramming the
    * current bracket [lo, hi] into B bins and descending into the bin the
    * rank falls in. Every pass is one broadcast-join + partial-aggregated
    * groupBy whose result is ≤ groups·|qs|·B rows — the only driver state
    * is the bracket table (groups × qs rows) and those bounded
    * histograms, the same discipline as the BPE winner. Values never
    * shuffle; the rank arithmetic is pure integers; the one division at
    * the end (iv/scale) exact-rounds the same rational in any engine.
    *
    * Group cardinality must be bounded (brackets broadcast) — ENFORCED:
    * the pass-0 collect is limit-capped at `maxGroups` and fails loudly
    * on violation; for unbounded groups use q102's sketch per group
    * instead. */
  def bisectQuantiles(df: DataFrame, valCol: String, groupCol: String,
      qs: Seq[Double], scale: Int = 100, bins: Int = 4096,
      maxGroups: Int = 100000): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0), s"bad quantiles $qs")
    val spark = df.sparkSession
    import spark.implicits._
    val iv = floor(col(valCol) * scale + lit(0.5)).cast("long")
    val vals = df.select(col(groupCol).cast("string").as("grp"), iv.as("iv"))
    // pass 0: per-group count + range (limit-capped — a violated
    // bounded-groups contract fails pointedly, never OOMs the driver)
    val statRows = vals.groupBy($"grp")
      .agg(count(lit(1)).as("n"), min($"iv").as("lo"), max($"iv").as("hi"))
      .limit(maxGroups + 1).collect()
    require(statRows.length <= maxGroups,
      s"bisectQuantiles: >$maxGroups distinct '$groupCol' groups — bracket " +
        "state is groups x qs rows on the driver and this group column " +
        "violates the bounded-groups contract; raise maxGroups only if the " +
        "driver can hold it, or use histogramQuantiles (q102) per group")
    val stats = statRows
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // bracket state: (grp, q, lo, hi, k) — answer = k-th smallest in [lo, hi]
    var state = (for ((g, n, lo, hi) <- stats; q <- qs)
      yield (g, q, lo, hi, math.ceil(q * n).toLong)).toSeq
    var done = Map.empty[(String, Double), Long]
    while (state.nonEmpty) {
      val (resolved, open) = state.partition { case (_, _, lo, hi, _) => lo == hi }
      done ++= resolved.map { case (g, q, lo, _, _) => (g, q) -> lo }
      state = open
      if (state.nonEmpty) {
        // one histogram pass over all open brackets: width = ⌈span/B⌉ ≥ 1,
        // so each round divides every bracket by ≥ B (or finishes it)
        val brackets = state.map { case (g, q, lo, hi, _) =>
          (g, q, lo, hi, (hi - lo + bins.toLong) / bins) }
          .toDF("grp", "q", "b_lo", "b_hi", "w")
        val hist = vals.join(broadcast(brackets), Seq("grp"))
          .filter($"iv" >= $"b_lo" && $"iv" <= $"b_hi")
          // `div`, never `/`: long/long is DOUBLE division in Spark, and a
          // last-ulp-low quotient would truncate into the wrong bin
          .groupBy($"grp", $"q", expr("(iv - b_lo) div w").as("bin"))
          .agg(count(lit(1)).as("c"))
          .collect()
          .groupBy(r => (r.getString(0), r.getDouble(1)))
          .map { case (k, rows) =>
            k -> rows.map(r => r.getLong(2) -> r.getLong(3)).sortBy(_._1) }
        state = state.map { case (g, q, lo, hi, k) =>
          val w = (hi - lo + bins.toLong) / bins
          var rem = k
          var (binLo, binHi) = (lo, hi)
          // descend into the bin the k-th rank falls in
          val it = hist((g, q)).iterator
          var found = false
          while (!found && it.hasNext) {
            val (bin, c) = it.next()
            if (rem <= c) {
              binLo = lo + bin * w
              binHi = math.min(binLo + w - 1, hi)
              found = true
            } else rem -= c
          }
          (g, q, binLo, binHi, rem)
        }
      }
    }
    done.toSeq.map { case ((g, q), ivAns) => (g, q, ivAns) }
      .toDF("grp", "q", "iv")
      .select($"grp", $"q", ($"iv" / lit(scale.toDouble)).as("val"))
      .orderBy($"grp", $"q")
  }

  // ---------------------------------------------------------------------------
  // HyperLogLog distinct sketch (q103)
  // ---------------------------------------------------------------------------

  /** Register count m = 2⁷. 128 registers give ~1.04/√128 ≈ 9.2% relative
    * error — plenty for the census-vs-sketch gate; production callers pick
    * m per error budget (the shapes below are m-generic). */
  val HllM = 128
  /** The tail z = h div m is uniform on [0, HllR] with HllR = (P−1) div m
    * ≈ 2^22.9 — NOT on a power-of-two range. ρ therefore comes from
    * thresholds HALVED FROM HllR (below), not from bit positions: reading
    * z's bits directly would inflate every P(z < 2^j) by 2^23/HllR ≈ 1.07
    * and bias every estimate up ~7% systematically (measured before the
    * fix: +7.4% mean across seeds on real keys). */
  val HllR: Long = (P - 1) / HllM
  /** ρ exceeding every halved threshold clamps here (z = 0 territory):
    * HllR >> 22 = 1, so the chain is k = 1..22 with ρ = 23 as the tail. */
  val HllRhoMax = 23
  /** α·m² with α = 0.7213/(1 + 1.079/m) (Flajolet et al. 2007). Every op
    * below is an exact power-of-two scaling or a single IEEE add/divide,
    * so the oracle's identically-shaped SQL expression reproduces the
    * identical double. */
  val HllAlphaM2: Double = 0.7213 / (1.0 + 1.079 / HllM) * HllM * HllM

  /** Geometric rank of the tail: ρ(z) = the smallest k ≥ 1 with
    * z ≥ HllR >> k, clamped to [[HllRhoMax]] — a descending CASE chain of
    * exact integer comparisons (each P(ρ = k) = 2^(−k) ± 1/HllR), never a
    * floating log2, which could misround exactly at the branch
    * boundaries. */
  def hllRho(z: Column): Column =
    (1 until HllRhoMax).foldLeft(Option.empty[Column]) { (acc, k) =>
      val cond = z >= (HllR >> k)
      Some(acc.fold(when(cond, lit(k)))(_.when(cond, lit(k))))
    }.get.otherwise(lit(HllRhoMax))

  /** HyperLogLog register table per group: (grp, reg, rho) — at most
    * m rows per group whatever the key cardinality. The groupBy's partial
    * aggregation collapses every map partition to ≤ |groups|·m rows before
    * the shuffle, and register tables MERGE by `max(rho)` per register —
    * the union-of-streams contract that makes HLL the distinct-count face
    * of the mergeable-sketch family (Count-Min above is the frequency
    * face).
    *
    * Hash: the [[cmsParams]] multiplicative-shift, then CUBED mod P.
    * The linear step alone is enough for BUCKETING sketches (CMS, LSH
    * bands), where only equidistribution matters — but HLL reads the
    * hash's bit TAIL as a geometric variable, and a linear map sends any
    * key set to an arithmetic progression mod P whose too-regular gaps
    * wreck the extreme-value statistics the α constant corrects for
    * (measured on 14.7k real keys: est 35.7k or 4.3k depending on seed —
    * seed-dependent 2.5× bias). Cubing is the minimal nonlinear fix that
    * stays replayable integer SQL: gcd(3, P−1) = 1 makes x³ mod P a
    * BIJECTION (no entropy loss), and ((h²) mod P)·h stays < 2⁶³
    * (measured after: estimates land within 1.5σ of exact across seeds).
    * Same |key| < 2³² domain as CMS (ANSI throws loudly beyond). */
  def hllRegisters(df: DataFrame, keyCol: String, grpCol: Column,
      a: Long, b: Long): DataFrame = {
    val (reg, rho) = hllCols(col(keyCol), a, b)
    df.select(grpCol.as("grp"), reg.as("reg"), rho.as("rho"))
      .groupBy(col("grp"), col("reg"))
      .agg(max(col("rho")).as("rho"))
  }

  /** Per-row (register, ρ) column pair for a key — the row-local front end
    * of [[hllRegisters]], exposed so streaming aggregations can compute
    * the same registers under a watermarked `groupBy(window, reg)`
    * (graft.streaming.EventStream.windowedDistinctUsers). */
  def hllCols(key: Column, a: Long, b: Long): (Column, Column) = {
    val h1 = pmod(key * lit(a) + lit(b), lit(P))
    val h = pmod(pmod(h1 * h1, lit(P)) * h1, lit(P))
    (h % HllM, hllRho(floor(h / HllM).cast("long")))
  }

  /** Distinct-count estimate from a register table: the raw HLL formula
    * E = α·m² / (Σ 2^(−ρⱼ) + #empty·2⁰). Every 2^(−ρ) term is an exact
    * power of two spanning < 53 exponent bits, so the sum is EXACT in IEEE
    * double regardless of summation order — the estimate is bit-identical
    * cross-engine without any transcendental in the dag, and the 1e-6
    * floor-quantization is belt-and-braces, not load-bearing.
    *
    * Deliberately raw-branch only: the small-range linear-counting
    * correction (E ≤ 2.5m with empty registers → m·ln(m/V)) introduces a
    * cross-engine ln(); callers in that regime should use an exact census
    * instead (m = 128 ⇒ the correction zone is n ≲ 320 distinct, where
    * counting exactly is trivial). The spec pins the error bound in the
    * raw regime. */
  def hllEstimate(regs: DataFrame): DataFrame =
    regs.groupBy(col("grp"))
      .agg(sum(pow(lit(2.0), -col("rho").cast("double"))).as("s_occ"),
        count(lit(1)).as("n_occ"))
      .select(col("grp"),
        (floor(lit(HllAlphaM2) / (col("s_occ") + (lit(HllM) - col("n_occ")))
          * 1e6 + 0.5) / 1e6).as("est"))

  /** [[hllEstimate]] plus Flajolet's small-range correction: when the raw
    * estimate falls in the linear-counting zone (E ≤ 2.5m) and empty
    * registers remain, the occupancy estimator m·ln(m/V) is far more
    * accurate (it is exact in expectation for a Poissonized stream). This
    * variant is the PRODUCTION read path for low-cardinality groups —
    * e.g. per-window distinct users, where n ≪ 2.5m makes the raw branch
    * meaningless — but it is deliberately NOT the oracle-gated path: ln()
    * is a transcendental whose last ulp is not contractually identical
    * across engines (the repo's cross-engine numerics rule), so the gate
    * checks registers and the raw formula, and the spec pins this
    * branch's accuracy in-engine. */
  def hllEstimateCorrected(regs: DataFrame): DataFrame =
    regs.groupBy(col("grp"))
      .agg(sum(pow(lit(2.0), -col("rho").cast("double"))).as("s_occ"),
        count(lit(1)).as("n_occ"))
      .select(col("grp"),
        col("s_occ"), col("n_occ"),
        (lit(HllAlphaM2) / (col("s_occ") + (lit(HllM) - col("n_occ"))))
          .as("raw"))
      .select(col("grp"),
        (floor(when(col("raw") <= 2.5 * HllM && col("n_occ") < HllM,
          lit(HllM.toDouble) * log(lit(HllM.toDouble) / (lit(HllM) - col("n_occ"))))
          .otherwise(col("raw")) * 1e6 + 0.5) / 1e6).as("est"))

  /** Shared constants + oracle for q103 (single source of truth). */
  private[graft] object Hll {
    val (a, b) = cmsParams(1, seed = 103).head

    /** The ρ CASE chain rendered for DuckDB — same branches, same order. */
    val rhoSql: String = {
      val cases = (1 until HllRhoMax)
        .map(k => s"WHEN z >= ${HllR >> k} THEN $k").mkString(" ")
      s"CASE $cases ELSE $HllRhoMax END"
    }

    /** Full pipeline in DuckDB: same hash, same registers, same merge by
      * max, same exact-power-of-two estimate — alongside the exact census
      * each estimate approximates. */
    val oracle: String =
      s"""WITH k0 AS (
         |  SELECT l_returnflag, ((l_orderkey * $a + $b) % $P + $P) % $P AS h1
         |  FROM lineitem),
         |k AS (SELECT l_returnflag, ((h1 * h1) % $P) * h1 % $P AS h FROM k0),
         |zt AS (SELECT l_returnflag, h % $HllM AS reg, h // $HllM AS z FROM k),
         |regs AS (
         |  SELECT l_returnflag AS grp, reg, max($rhoSql) AS rho
         |  FROM zt GROUP BY 1, 2),
         |mregs AS (SELECT 'ALL' AS grp, reg, max(rho) AS rho FROM regs GROUP BY 2),
         |u AS (SELECT * FROM regs UNION ALL SELECT * FROM mregs),
         |est AS (
         |  SELECT grp,
         |    floor(CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE) / $HllM)
         |            * $HllM * $HllM
         |          / (sum(power(2.0, -rho)) + ($HllM - count(*))) * 1e6 + 0.5)
         |      / 1e6 AS est
         |  FROM u GROUP BY grp),
         |ex AS (
         |  SELECT l_returnflag AS grp, count(DISTINCT l_orderkey) AS n_exact
         |  FROM lineitem GROUP BY 1
         |  UNION ALL
         |  SELECT 'ALL', count(DISTINCT l_orderkey) FROM lineitem)
         |SELECT e.grp, e.est, x.n_exact
         |FROM est e JOIN ex x ON x.grp = e.grp
         |ORDER BY e.grp""".stripMargin
  }

  /** Equal-frequency binning (quantile discretizer) — the ML-prep step
    * that turns a skewed numeric feature into balanced ordinal buckets.
    * Cut points come from [[bisectQuantiles]] (exact, bounded state);
    * assignment is then a PURE MAP: the per-group edge array broadcasts
    * and each row's bucket is the count of edges strictly below its
    * quantized value — one scan, one census-sized partial agg, no row
    * ever shuffles on the value. All comparisons happen on the same
    * integer grid the bisection answered on (floor(val·scale + 0.5)), so
    * both engines replay identical bucket decisions; duplicate edges
    * (coinciding quantiles on skewed data) legitimately skip a bucket on
    * both sides. Returns the (grp, bucket, n) census. */
  def quantileBin(df: DataFrame, valCol: String, grpCol: String,
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75), scale: Int = 100): DataFrame = {
    val iv = floor(col(valCol) * scale + lit(0.5)).cast("long")
    val vals = df.select(col(grpCol).cast("string").as("grp"), iv.as("iv"))
    val edges = bisectQuantiles(df, valCol, grpCol, qs, scale)
      .select(col("grp"),
        floor(col("val") * scale + lit(0.5)).cast("long").as("eiv"))
      .groupBy(col("grp")).agg(sort_array(collect_list(col("eiv"))).as("earr"))
    vals.join(broadcast(edges), Seq("grp"))
      .select(col("grp"),
        aggregate(col("earr"), lit(0L),
          (acc, e) => acc + when(col("iv") > e, 1L).otherwise(0L)).as("bucket"))
      .groupBy(col("grp"), col("bucket")).agg(count(lit(1)).as("n"))
      .orderBy(col("grp"), col("bucket"))
  }

  /** HLL audience overlap — distinct-set ALGEBRA on register tables: for
    * every event-type pair, est|A∪B| comes from the per-register max
    * merge (the union contract [[hllRegisters]] documents) and est|A∩B|
    * by inclusion–exclusion est(A)+est(B)−est(A∪B). This is the sketch
    * operation exact distincts cannot give you incrementally: at 100 TB
    * the per-type register tables (≤ m rows each) are maintained
    * append-only and every pairwise overlap is computed from registers
    * alone — no re-scan, no (user, type) self-join. The exact
    * intersection census sits beside the estimate (the q101/q103
    * discipline: the gate value-checks the whole sketch dag AND exposes
    * its error). Intersection estimates can go negative on tiny true
    * overlaps — that is honest inclusion–exclusion output, reported raw.
    *
    * Scale shape: registers partial-agg to |types|·m rows; the pair fan
    * is a broadcast nested loop over that census; the only corpus-scale
    * stages are the register build and the (gate-only) exact census. */
  def audienceOverlap(events: DataFrame, a: Long, b: Long): DataFrame = {
    import graft.core.Lineage.CutOps
    val ue = events.select(col("event_type"), col("user_id"))
    // the register census feeds the pair merge AND the per-type
    // estimates — cut so the corpus register build runs once
    val regs = hllRegisters(ue, "user_id", col("event_type"), a, b)
      .cutLineage()
    val types = ue.select(col("event_type")).distinct()
    val pairs = types.select(col("event_type").as("ta"))
      .join(types.select(col("event_type").as("tb")), col("ta") < col("tb"))
    val uRegs = broadcast(pairs)
      .join(regs, col("grp") === col("ta") || col("grp") === col("tb"))
      .groupBy(col("ta"), col("tb"), col("reg")).agg(max(col("rho")).as("rho"))
    val estU = hllEstimate(uRegs.select(
        concat_ws("|", col("ta"), col("tb")).as("grp"), col("reg"), col("rho")))
      .select(col("grp").as("pu"), col("est").as("est_union"))
    val estT = hllEstimate(regs)
    val ut = ue.distinct()
    val exact = ut.as("x")
      .join(ut.as("y"), col("x.user_id") === col("y.user_id") &&
        col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("ta"), col("y.event_type").as("tb"))
      .agg(count(lit(1)).as("n_exact_inter"))
    pairs
      .join(broadcast(estT.select(col("grp").as("ta"), col("est").as("est_a"))), "ta")
      .join(broadcast(estT.select(col("grp").as("tb"), col("est").as("est_b"))), "tb")
      .join(estU, concat_ws("|", col("ta"), col("tb")) === col("pu"))
      .join(exact, Seq("ta", "tb"), "left")
      .select(col("ta"), col("tb"), col("est_a"), col("est_b"), col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("est_inter"),
        coalesce(col("n_exact_inter"), lit(0L)).as("n_exact_inter"))
      .orderBy(col("ta"), col("tb"))
  }

  /** Shared constants + oracle for q150 (the [[Hll]] scheme over events). */
  private[graft] object Ov {
    val (a, b) = cmsParams(1, seed = 150).head
    private val alpha =
      s"CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE) / $HllM) * $HllM * $HllM"
    private def estSql(grpCols: String, src: String): String =
      s"""SELECT $grpCols,
         |    floor($alpha / (sum(power(2.0, -rho)) + ($HllM - count(*)))
         |          * 1e6 + 0.5) / 1e6 AS est
         |  FROM $src GROUP BY $grpCols""".stripMargin

    val oracle: String =
      s"""WITH k0 AS (
         |  SELECT event_type, ((user_id * $a + $b) % $P + $P) % $P AS h1
         |  FROM events),
         |k AS (SELECT event_type, ((h1 * h1) % $P) * h1 % $P AS h FROM k0),
         |zt AS (SELECT event_type, h % $HllM AS reg, h // $HllM AS z FROM k),
         |regs AS MATERIALIZED (
         |  SELECT event_type AS grp, reg, max(${Hll.rhoSql}) AS rho
         |  FROM zt GROUP BY 1, 2),
         |tp AS (SELECT DISTINCT event_type FROM events),
         |prs AS MATERIALIZED (
         |  SELECT a.event_type AS ta, b.event_type AS tb
         |  FROM tp a JOIN tp b ON a.event_type < b.event_type),
         |ur AS (
         |  SELECT ta, tb, reg, max(rho) AS rho
         |  FROM prs JOIN regs ON regs.grp = prs.ta OR regs.grp = prs.tb
         |  GROUP BY 1, 2, 3),
         |estt AS MATERIALIZED (${estSql("grp", "regs")}),
         |estu AS (${estSql("ta, tb", "ur")}),
         |ut AS (SELECT DISTINCT user_id, event_type FROM events),
         |ex AS (
         |  SELECT x.event_type AS ta, y.event_type AS tb, count(*) AS n
         |  FROM ut x JOIN ut y ON x.user_id = y.user_id
         |    AND x.event_type < y.event_type
         |  GROUP BY 1, 2)
         |SELECT p.ta, p.tb, ea.est AS est_a, eb.est AS est_b,
         |  eu.est AS est_union, ea.est + eb.est - eu.est AS est_inter,
         |  CAST(coalesce(ex.n, 0) AS BIGINT) AS n_exact_inter
         |FROM prs p
         |JOIN estt ea ON ea.grp = p.ta
         |JOIN estt eb ON eb.grp = p.tb
         |JOIN estu eu ON eu.ta = p.ta AND eu.tb = p.tb
         |LEFT JOIN ex ON ex.ta = p.ta AND ex.tb = p.tb
         |ORDER BY p.ta, p.tb""".stripMargin
  }

  /** Shared constants + oracle for q101 (single source of truth). */
  private[graft] object Cms {
    val D = 4
    val W = 64
    val params: Seq[(Long, Long)] = cmsParams(D, seed = 101)

    /** The full pipeline in DuckDB: same integer hash dag, same min-over-d
      * estimate, alongside the exact census it upper-bounds. */
    val oracle: String = {
      val bucketSql = (1 to D).map { j1 =>
        val (a, b) = params(j1 - 1)
        s"{'j': ${j1 - 1}, 'bucket': ((user_id * $a + $b) % $P + $P) % $P % $W}"
      }.mkString("[", ", ", "]")
      s"""WITH ev AS (SELECT user_id FROM events),
         |cells AS (
         |  SELECT r.j AS j, r.bucket AS bucket, count(*) AS c
         |  FROM (SELECT unnest($bucketSql) AS r FROM ev)
         |  GROUP BY 1, 2),
         |q AS (SELECT DISTINCT user_id FROM ev WHERE user_id < 20),
         |probes AS (
         |  SELECT user_id, r.j AS j, r.bucket AS bucket
         |  FROM (SELECT user_id, unnest($bucketSql) AS r FROM q)),
         |est AS (
         |  SELECT p.user_id, min(coalesce(c.c, 0)) AS est
         |  FROM probes p LEFT JOIN cells c ON c.j = p.j AND c.bucket = p.bucket
         |  GROUP BY p.user_id),
         |exact AS (
         |  SELECT user_id, count(*) AS n_exact FROM ev
         |  WHERE user_id < 20 GROUP BY user_id)
         |SELECT e.user_id, e.est, x.n_exact
         |FROM est e JOIN exact x ON x.user_id = e.user_id
         |ORDER BY e.user_id""".stripMargin
    }
  }

  /** Shared constants + oracle for q127 (single source of truth). */
  private[graft] object JoinCms {
    val D = 4
    // w sized by the AMS bound: expected overshoot ~ n_a*n_b/w =
    // 15000*1500/8192 ~ 2.7k on a 15k true cardinality (~18% one-sided);
    // at w = 256 the same bound is ~88k and the signal drowns. Sketch
    // stays 4x8192 cells - bounded whatever the corpus.
    val W = 8192
    val params: Seq[(Long, Long)] = cmsParams(D, seed = 127)

    val oracle: String = {
      val bucketSql = (1 to D).map { j1 =>
        val (a, b) = params(j1 - 1)
        s"{'j': ${j1 - 1}, 'bucket': ((k * $a + $b) % $P + $P) % $P % $W}"
      }.mkString("[", ", ", "]")
      s"""WITH a AS (SELECT o_custkey AS k FROM orders),
         |b AS (SELECT c_custkey AS k FROM customer),
         |ca AS (
         |  SELECT r.j AS j, r.bucket AS bucket, count(*) AS c
         |  FROM (SELECT unnest($bucketSql) AS r FROM a)
         |  GROUP BY 1, 2),
         |cb AS (
         |  SELECT r.j AS j, r.bucket AS bucket, count(*) AS c
         |  FROM (SELECT unnest($bucketSql) AS r FROM b)
         |  GROUP BY 1, 2),
         |ip AS (
         |  SELECT ca.j, sum(ca.c * cb.c) AS s
         |  FROM ca JOIN cb ON ca.j = cb.j AND ca.bucket = cb.bucket
         |  GROUP BY 1),
         |est AS (SELECT CAST(min(s) AS BIGINT) AS est FROM ip),
         |ex AS (SELECT CAST(count(*) AS BIGINT) AS n_exact
         |       FROM a JOIN b ON a.k = b.k)
         |SELECT est, n_exact FROM est, ex""".stripMargin
    }
  }

  /** Key-skew audit — the pre-flight diagnostic for any groupBy/join on
    * `keyCol`: the per-key count census summarized as p50/p99 (exact,
    * via [[bisectQuantiles]] — bounded state, no global sort over the
    * census), the max, the top-`topK` concentration share, and the
    * max/p50 skew ratio that predicts straggler factor under hash
    * partitioning. The census is materialized once and every summary is
    * a partial aggregation or a TakeOrdered over it — keys never
    * funnel into one partition in the very operator that measures
    * whether they would. Ratios are floor-quantized exact rationals. */
  def skewAudit(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    import graft.core.Lineage.CutOps
    val census = df.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("n"))
      .cutLineage()
    val qs = bisectQuantiles(census.withColumn("g", lit("g")), "n", "g",
      Seq(0.5, 0.99), scale = 1)
    val p50 = qs.filter(col("q") === 0.5).select(col("val").cast("long").as("p50"))
    val p99 = qs.filter(col("q") === 0.99).select(col("val").cast("long").as("p99"))
    val top = census.orderBy(col("n").desc, col("k")).limit(topK)
      .agg(sum(col("n")).as("top_n"))
    census
      .agg(count(lit(1)).as("n_keys"), sum(col("n")).as("n_rows"),
        max(col("n")).as("max_n"))
      .crossJoin(broadcast(p50)).crossJoin(broadcast(p99))
      .crossJoin(broadcast(top))
      .select(col("n_keys"), col("n_rows"), col("max_n"), col("p50"), col("p99"),
        (floor(col("top_n").cast("double") / col("n_rows").cast("double") * 1e6
          + lit(0.5)) / 1e6).as("topk_share"),
        (floor(col("max_n").cast("double") / col("p50").cast("double") * 1e6
          + lit(0.5)) / 1e6).as("skew_ratio"))
  }

  // lazy: Streams.defs initializes BEFORE Sketches in SparkEntry.allDefs and
  // touches Sketches.Hll (q106 shares the q103 hash constants); Hll's init
  // re-enters the still-initializing outer object, and an EAGER defs would
  // capture Hll.oracle as null mid-construction (observed: Verify NPE on a
  // null oracle string). Deferring defs lets both objects finish
  // initializing before any QueryDef captures nested-object state.
  lazy val defs: Seq[QueryDef] = Seq(

    // ---- q150: HLL audience overlap (register algebra) ---------------------
    // Pairwise event-type union/intersection estimates from register
    // max-merge + inclusion-exclusion, exact intersection census beside;
    // the oracle replays hash, registers, pair merge, and both estimates.
    QueryDef(
      "q150_audience_overlap",
      (s, d) => audienceOverlap(Tables.events(s, d), Ov.a, Ov.b),
      Some(Ov.oracle)),

    // ---- q151: equal-frequency quantile binning ----------------------------
    // Quartile cut points via bisection, broadcast-edge map assignment,
    // bucket census; the oracle replays q128's k-th-smallest edges and
    // the same integer-grid comparisons.
    QueryDef(
      "q151_quantile_bins",
      (s, d) => quantileBin(Tables.lineitem(s, d), "l_extendedprice",
        "l_returnflag"),
      Some("""WITH v AS (
             |  SELECT CAST(l_returnflag AS VARCHAR) AS grp,
             |    CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS iv
             |  FROM lineitem),
             |r AS (
             |  SELECT grp, iv,
             |    row_number() OVER (PARTITION BY grp ORDER BY iv) AS rk,
             |    count(*) OVER (PARTITION BY grp) AS n
             |  FROM v),
             |qs AS (SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
             |                      CAST(0.75 AS DOUBLE)]) AS q),
             |sel AS (
             |  SELECT r.grp, qs.q, min(r.iv) AS iv
             |  FROM r, qs
             |  WHERE r.rk = CAST(ceil(qs.q * r.n) AS BIGINT)
             |  GROUP BY 1, 2),
             |ed AS (
             |  SELECT grp,
             |    CAST(floor(iv / CAST(100 AS DOUBLE) * 100
             |               + CAST(0.5 AS DOUBLE)) AS BIGINT) AS eiv
             |  FROM sel),
             |earr AS (SELECT grp, list(eiv ORDER BY eiv) AS earr FROM ed GROUP BY 1),
             |b AS (
             |  SELECT v.grp,
             |    len(list_filter(e.earr, x -> v.iv > x)) AS bucket
             |  FROM v JOIN earr e USING (grp))
             |SELECT grp, CAST(bucket AS BIGINT) AS bucket,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- q101: Count-Min frequency sketch ----------------------------------
    // Build the sketch over every event's user_id, point-estimate the
    // first 20 users, and emit the exact census beside it — the gate
    // checks the ENTIRE sketch pipeline (hashing, cell counts, min-probe)
    // value-for-value cross-engine, plus exposes the one-sided error for
    // the spec to bound.
    QueryDef(
      "q101_countmin_sketch",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("user_id"))
        val sketch = countMin(ev, "user_id", Cms.W, Cms.params)
        val exact = ev.filter(col("user_id") < 20)
          .groupBy("user_id").agg(count(lit(1)).as("n_exact"))
        // probe keys DERIVE from the census so the two subtrees are one
        // shared scan+shuffle (ReuseExchange), not two — the CLAUDE.md
        // shared-subtree rule
        val queries = exact.select("user_id")
        cmsEstimate(sketch, queries, "user_id", Cms.W, Cms.params)
          .join(exact, "user_id")
          .select(col("user_id"), col("est"), col("n_exact"))
          .orderBy(col("user_id"))
      },
      Some(Cms.oracle)),

    // ---- q103: HyperLogLog distinct sketch (mergeable cardinality) ---------
    // Registers per l_returnflag over l_orderkey, PLUS the merged-global
    // sketch derived from the per-group register tables by max(rho) — the
    // gate value-checks the whole pipeline cross-engine (hash, registers,
    // merge, estimate) AND demonstrates mergeability on data where it
    // matters: per-flag distinct orderkeys (~11k each) genuinely differ
    // from their union (~14.7k), so the ALL row is not a replay of any
    // group. Exact censuses sit beside each estimate.
    QueryDef(
      "q103_hll_distinct",
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_returnflag"), col("l_orderkey"))
        val perRegs = hllRegisters(li, "l_orderkey", col("l_returnflag"), Hll.a, Hll.b)
        val allRegs = perRegs.groupBy(col("reg")).agg(max(col("rho")).as("rho"))
          .select(lit("ALL").as("grp"), col("reg"), col("rho"))
        val est = hllEstimate(perRegs.unionByName(allRegs))
        val exact = li.groupBy(col("l_returnflag").as("grp"))
          .agg(countDistinct(col("l_orderkey")).as("n_exact"))
          .unionByName(li.agg(countDistinct(col("l_orderkey")).as("n_exact"))
            .select(lit("ALL").as("grp"), col("n_exact")))
        est.join(exact, "grp")
          .select(col("grp"), col("est"), col("n_exact"))
          .orderBy(col("grp"))
      },
      Some(Hll.oracle)),

    // ---- q102: histogram quantile sketch (mergeable approx percentiles) ----
    // The oracle replays the ENTIRE estimate (bin edges, cumulative walk,
    // midpoint) — unlike q23b whose engine-internal sketch is rows-only.
    // Quantile literals are CAST to DOUBLE in SQL: DuckDB's decimal 0.95*n
    // is EXACT where IEEE is not, and ceil() would part ways right at
    // integer boundaries (the CLAUDE.md decimal rule).
    QueryDef(
      "q102_histogram_quantiles",
      (s, d) => histogramQuantiles(Tables.lineitem(s, d),
        "l_extendedprice", "l_returnflag", bins = 1024, qs = Seq(0.5, 0.95))
        .orderBy(col("l_returnflag"), col("q")),
      Some("""WITH stats AS (
             |  SELECT min(CAST(l_extendedprice AS DOUBLE)) AS lo,
             |         max(CAST(l_extendedprice AS DOUBLE)) AS hi
             |  FROM lineitem),
             |b AS (
             |  SELECT l_returnflag AS grp,
             |    CASE WHEN hi = lo THEN 0
             |         ELSE CAST(least(floor((CAST(l_extendedprice AS DOUBLE) - lo)
             |                        / (hi - lo) * 1024), 1023) AS BIGINT)
             |    END AS bin, lo, hi
             |  FROM lineitem, stats),
             |c AS (SELECT grp, bin, lo, hi, count(*) AS c FROM b GROUP BY 1, 2, 3, 4),
             |cum AS (
             |  SELECT grp, bin, lo, hi,
             |    sum(c) OVER (PARTITION BY grp ORDER BY bin) AS cum,
             |    sum(c) OVER (PARTITION BY grp) AS n
             |  FROM c),
             |qv AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.95 AS DOUBLE)]) AS q),
             |sel AS (
             |  SELECT grp, q, lo, hi, min(bin) AS qbin
             |  FROM cum, qv WHERE cum >= ceil(q * n)
             |  GROUP BY grp, q, lo, hi)
             |SELECT grp AS l_returnflag, q,
             |  floor((lo + (qbin + 0.5) * (hi - lo) / 1024) * 1e6 + 0.5) / 1e6 AS est
             |FROM sel ORDER BY l_returnflag, q""".stripMargin)),

    // ---- q128: EXACT bounded-state quantiles (histogram bisection) ---------
    // q23's grouping run through the bisection: the oracle computes the
    // k = ⌈q·n⌉ order statistic directly (row_number over the integer
    // grid), so the gate certifies EXACTNESS of the multi-pass descent,
    // not an approximation bound. headline: the bench shows what "exact
    // AND bounded-state" costs next to q23 (exact, unbounded) and
    // q23c (approximate, bounded).
    QueryDef(
      "q128_exact_quantile_bisect",
      (s, d) => bisectQuantiles(Tables.lineitem(s, d), "l_extendedprice",
        "l_returnflag", qs = Seq(0.5, 0.9), scale = 100, bins = 4096),
      Some("""WITH v AS (
             |  SELECT CAST(l_returnflag AS VARCHAR) AS grp,
             |    CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS iv
             |  FROM lineitem),
             |r AS (
             |  SELECT grp, iv,
             |    row_number() OVER (PARTITION BY grp ORDER BY iv) AS rk,
             |    count(*) OVER (PARTITION BY grp) AS n
             |  FROM v),
             |qs AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE)]) AS q),
             |sel AS (
             |  SELECT r.grp, qs.q, min(r.iv) AS iv
             |  FROM r, qs
             |  WHERE r.rk = CAST(ceil(qs.q * r.n) AS BIGINT)
             |  GROUP BY 1, 2)
             |SELECT grp, q, iv / CAST(100 AS DOUBLE) AS val
             |FROM sel ORDER BY grp, q""".stripMargin),
      headline = true),

    // ---- q127: sketch-based join-cardinality estimate ----------------------
    // orders ⋈ customer on custkey, estimated from two 4×8192 sketches
    // beside the exact join count — the gate value-checks the entire
    // inner-product dag cross-engine AND exposes the one-sided error for
    // the spec to bound.
    QueryDef(
      "q127_join_size_sketch",
      (s, d) => {
        val a = Tables.orders(s, d).select(col("o_custkey").as("k"))
        val b = Tables.customer(s, d).select(col("c_custkey").as("k"))
        val est = cmsJoinSize(a, "k", b, "k", JoinCms.W, JoinCms.params)
        val exact = a.join(b.select(col("k").as("k2")), col("k") === col("k2"))
          .agg(count(lit(1)).as("n_exact"))
        est.crossJoin(exact)
      },
      Some(JoinCms.oracle)),

    // ---- q137: per-group exact heavy hitters -------------------------------
    // Each source's bigrams above n_source/300, exactly — one global
    // sketch pre-screens all groups (a global cell upper-bounds every
    // per-group count); the oracle is the per-group census + HAVING.
    QueryDef(
      "q137_group_heavy_hitters",
      (s, dir) => groupedHeavyHitters(
        Tables.documents(s, dir).select(col("source"),
          explode(graft.functions.TextOps.ngrams(col("text"), 2)).as("bigram")),
        "source", "bigram", k = 300, w = 1024, d = 4, seed = 137),
      Some("""WITH t AS (SELECT source, string_split(text, ' ') AS t FROM documents),
             |bg AS (
             |  SELECT source,
             |    unnest([t[i] || ' ' || t[i+1] for i in range(1, greatest(len(t), 1))]) AS bigram
             |  FROM t WHERE len(t) >= 2),
             |tot AS (SELECT source, count(*) AS n FROM bg GROUP BY 1),
             |c AS (SELECT source, bigram, count(*) AS c FROM bg GROUP BY 1, 2)
             |SELECT c.source, c.bigram, CAST(c.c AS BIGINT) AS freq
             |FROM c JOIN tot ON tot.source = c.source
             |WHERE c.c > tot.n // 300
             |ORDER BY c.source, freq DESC, bigram""".stripMargin)),

    // ---- q124: exact heavy hitters (sketch-then-verify) --------------------
    // Bigram heavy hitters over the corpus: every bigram occurring more
    // than n/1000 times, with its EXACT count. The oracle is a plain
    // census + HAVING — deliberately sketch-free, because the CMS filter
    // is a superset pre-screen that cannot change the answer (one-sided
    // error + exact recount); the gate therefore certifies the algebraic
    // claim the scale path rests on. The synthetic corpus is near-uniform
    // (~916 bigrams, most above threshold), so pruning selectivity is
    // pinned separately on planted Zipf data in SketchesSpec.
    QueryDef(
      "q124_heavy_hitters",
      (s, dir) => heavyHitters(
        Tables.documents(s, dir)
          .select(explode(graft.functions.TextOps.ngrams(col("text"), 2)).as("bigram")),
        "bigram", k = 1000, w = 1024, d = 4, seed = 124),
      Some("""WITH t AS (SELECT string_split(text, ' ') AS t FROM documents),
             |bg AS (
             |  SELECT unnest([t[i] || ' ' || t[i+1] for i in range(1, greatest(len(t), 1))]) AS bigram
             |  FROM t WHERE len(t) >= 2),
             |tot AS (SELECT count(*) AS n FROM bg),
             |c AS (SELECT bigram, count(*) AS c FROM bg GROUP BY 1)
             |SELECT bigram, CAST(c AS BIGINT) AS freq
             |FROM c WHERE c > (SELECT n // 1000 FROM tot)
             |ORDER BY freq DESC, bigram""".stripMargin),
      headline = true),

    // ---- q124z: heavy hitters in the PRUNING regime (bench-only) -----------
    // The sf0.1 corpus is near-uniform, so the q124 bench row measures
    // scan cost, not the sketch's value (97% candidate fraction —
    // SCALING.md). This row plants a deterministic hot/tail split over
    // lineitem — 5% of rows on 3 hot keys, 95% on a ~150k-key tail —
    // so the CMS pre-screen sheds >90% of rows before the exact recount
    // and the pruning path is regression-visible where it matters.
    // Correctness of the identical operator is the q124 gate; the
    // candidate fraction on THIS shape is pinned in SketchesSpec.
    QueryDef(
      "q124z_heavy_hitters_zipf",
      (s, dir) => heavyHitters(
        Tables.lineitem(s, dir).select(
          when(col("l_orderkey") % 20 === 0,
            concat(lit("hot_"), col("l_orderkey") % 3))
            .otherwise(concat(lit("t"), col("l_orderkey"))).as("key")),
        "key", k = 100, w = 4096, d = 4, seed = 124),
      None, headline = true, gate = false),

    // ---- q170: key-skew audit ----------------------------------------------
    // Per-user-id count census summarized to exact p50/p99/max, top-10
    // share, and the max/p50 straggler ratio; the oracle replays the
    // census, both k-th-smallest selections, and the quantized ratios.
    QueryDef(
      "q170_skew_audit",
      (s, d) => skewAudit(Tables.events(s, d), "user_id"),
      Some("""WITH census AS MATERIALIZED (
             |  SELECT user_id AS k, count(*) AS n FROM events GROUP BY 1),
             |r AS (SELECT n, row_number() OVER (ORDER BY n) AS rk,
             |        count(*) OVER () AS cnt FROM census),
             |p50 AS (SELECT min(n) AS v FROM r
             |  WHERE rk = CAST(ceil(CAST(0.5 AS DOUBLE) * cnt) AS BIGINT)),
             |p99 AS (SELECT min(n) AS v FROM r
             |  WHERE rk = CAST(ceil(CAST(0.99 AS DOUBLE) * cnt) AS BIGINT)),
             |top AS (SELECT sum(n) AS tn FROM
             |  (SELECT n FROM census ORDER BY n DESC, k LIMIT 10)),
             |tot AS (SELECT count(*) AS n_keys, sum(n) AS n_rows,
             |          max(n) AS max_n FROM census)
             |SELECT CAST(tot.n_keys AS BIGINT) AS n_keys,
             |  CAST(tot.n_rows AS BIGINT) AS n_rows,
             |  CAST(tot.max_n AS BIGINT) AS max_n,
             |  CAST(p50.v AS BIGINT) AS p50, CAST(p99.v AS BIGINT) AS p99,
             |  floor(CAST(top.tn AS DOUBLE) / CAST(tot.n_rows AS DOUBLE)
             |        * 1e6 + 0.5) / 1e6 AS topk_share,
             |  floor(CAST(tot.max_n AS DOUBLE) / CAST(p50.v AS DOUBLE)
             |        * 1e6 + 0.5) / 1e6 AS skew_ratio
             |FROM tot, p50, p99, top""".stripMargin)),

    // ---- q201: winsorized value moments ------------------------------------
    // p01/p99 cents cutoffs via the bounded bisection, values clipped
    // into [p01, p99], raw vs winsorized integer-division means; the
    // oracle computes the same order statistics by ranking and replays
    // the clip + divisions.
    QueryDef(
      "q201_winsorized_stats",
      (s, d) => winsorizedStats(Tables.orders(s, d), "o_totalprice"),
      Some("""WITH iv AS (
             |  SELECT CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
             |    AS cents
             |  FROM orders),
             |r AS (
             |  SELECT cents, row_number() OVER (ORDER BY cents) AS rk,
             |    count(*) OVER () AS n
             |  FROM iv),
             |p01 AS (SELECT min(cents) AS v FROM r
             |  WHERE rk = CAST(ceil(CAST(0.01 AS DOUBLE) * n) AS BIGINT)),
             |p99 AS (SELECT min(cents) AS v FROM r
             |  WHERE rk = CAST(ceil(CAST(0.99 AS DOUBLE) * n) AS BIGINT))
             |SELECT CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(cents) // count(*) AS BIGINT) AS mean_cents,
             |  CAST(sum(greatest((SELECT v FROM p01),
             |    least((SELECT v FROM p99), cents))) // count(*) AS BIGINT)
             |    AS wmean_cents,
             |  CAST((SELECT v FROM p01) AS BIGINT) AS p01_cents,
             |  CAST((SELECT v FROM p99) AS BIGINT) AS p99_cents
             |FROM iv""".stripMargin)),
  )

  /** Winsorized moments — the robust-mean audit: exact p01/p99 cutoffs
    * on the integer-cents grid (bounded-state bisection, k = ⌈q·n⌉ k-th
    * smallest), values clipped into [p01, p99], and raw vs winsorized
    * integer-division means side by side. A wmean far under the mean
    * means the tail owns the revenue figure. Cutoffs are two driver
    * longs; the clip pass is one partial agg — rows never shuffle. */
  def winsorizedStats(df: DataFrame, valCol: String): DataFrame = {
    val cents = df.select(
      floor(col(valCol) * 100 + lit(0.5)).cast("long").as("cents"))
    val cuts = bisectQuantiles(
        cents.select(lit("all").as("g"), col("cents").as("v")),
        "v", "g", Seq(0.01, 0.99), scale = 1)
      .collect().sortBy(_.getDouble(1))
    val p01 = math.round(cuts(0).getDouble(2))
    val p99 = math.round(cuts(1).getDouble(2))
    cents.agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
        sum(greatest(lit(p01), least(lit(p99), col("cents")))).as("ws"))
      .select(col("n"), expr("s div n").as("mean_cents"),
        expr("ws div n").as("wmean_cents"),
        lit(p01).as("p01_cents"), lit(p99).as("p99_cents"))
  }
}
