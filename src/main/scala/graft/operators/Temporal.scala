package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}
import graft.flow.{HistogramPass, Plot, Selection, VariableBinning}

/** Pivot, datetime-function breadth, and variable-edge histograms. */
object Temporal {

  /** Windowed event-rate anomaly flags — the ingestion-QA monitor: a
    * (type, window) census, then each window scored against its trailing
    * `trail` OBSERVED windows of the same type. The spike test is the
    * 3σ rule spelled WITHOUT sqrt — (n − mean)² > 9·var — so every
    * quantity stays a rational of exact integer sums and the gate replays
    * the flags bit-identically (the CLAUDE.md transcendental rule; a
    * z-score column would need sqrt). Trailing stats via a ROWS frame
    * over the census — the frame is over aggregated rows (types ×
    * windows, bounded by the time horizon), never events, so the window
    * stage is census-sized at any corpus scale. */
  def rateAnomalies(events: org.apache.spark.sql.DataFrame,
      windowDur: String = "10 minutes", trail: Int = 6): org.apache.spark.sql.DataFrame =
    scoreRates(events
      .groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("win_start"), col("event_type"), col("n")),
      trail)

  /** Scoring half of [[rateAnomalies]], factored out so a STREAMING census
    * (`EventStream.windowedCounts`' (win_start, event_type, n) rows) can
    * be scored sink-side — the same rank-on-closed-windows split as the
    * drift monitor: the streaming query keeps only the one census
    * aggregation, and anomaly flags are a batch pass over its emitted,
    * already-bounded output. */
  def scoreRates(census: org.apache.spark.sql.DataFrame,
      trail: Int = 6): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("win_start"))
      .rowsBetween(-trail, -1)
    val mean = col("s").cast("double") / col("np").cast("double")
    val varr = col("ss").cast("double") / col("np").cast("double") - mean * mean
    val dev = col("n").cast("double") - mean
    census
      .withColumn("np", count(col("n")).over(w))
      .withColumn("s", sum(col("n")).over(w))
      .withColumn("ss", sum(col("n") * col("n")).over(w))
      .filter(col("np") >= 3)
      .select(col("win_start"), col("event_type"), col("n"),
        mean.as("mean"),
        (col("n").cast("double") > mean && dev * dev > lit(9.0) * varr).as("spike"))
      .orderBy(col("win_start"), col("event_type"))
  }

  /** Frequent session paths — the sequence-mining step past q118's global
    * first-order transitions: length-3 event-type sequences WITHIN a
    * session (q54's 30-minute-gap sessionization, same integer-µs gap
    * spelling and (t, event_id) tie order), ranked by frequency. Paths
    * never cross a session boundary, which is exactly what the global
    * transition matrix cannot see. One user_id shuffle feeds the gap
    * window, the session window, and the leads; the census
    * partial-aggregates and top-k lands on TakeOrdered. */
  /** q54's 30-minute-gap sessionization (same integer-µs gap spelling and
    * (t, event_id) tie order), factored for reuse: adds `t` (integer µs)
    * and `session_id` (per-user running counter) to the event stream.
    * One user_id shuffle feeds both windows. */
  private def sessionized(events: org.apache.spark.sql.DataFrame,
      gapUs: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    val runFrame = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("t", unix_micros(col("ts")))
      .withColumn("gap", col("t") - lag(col("t"), 1).over(byUser))
      .withColumn("new_s", when(col("gap").isNull || col("gap") >= gapUs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_s")).over(runFrame))
  }

  def sessionPaths(events: org.apache.spark.sql.DataFrame, pathLen: Int = 3,
      topK: Int = 20, gapUs: Long = 1800000000L): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(pathLen >= 2 && topK >= 1)
    val withSess = sessionized(events, gapUs)
    val inSess = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("t"), col("event_id"))
    val steps = (0 until pathLen).map {
      case 0 => col("event_type")
      case i => lead(col("event_type"), i).over(inSess)
    }
    withSess
      .withColumn("path", concat_ws(">", steps: _*))
      .withColumn("last_step", steps.last)
      .filter(col("last_step").isNotNull) // sessions shorter than pathLen drop out
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("path"))
      .limit(topK)
  }

  /** Rolling active-user stickiness — the DAU/WAU shape on parameterized
    * units: per short window, distinct actives divided by distinct
    * actives over the trailing `factor` windows. The long-window distinct
    * CANNOT be merged from short-window distinct counts (distinct is not
    * a sum — the same reason the mergeable card carries HLL registers),
    * so the exact spelling explodes each event into the `factor` long
    * windows it contributes to (the q52 membership pattern) and counts
    * distinct per long window: shuffle ∝ events·factor of (window, user)
    * pairs, two-phase distinct, no window functions over hot keys. The
    * ratio is one division of exact integers — bit-identical
    * cross-engine. At larger factors, swap the exact distinct for the
    * per-window HLL registers (q103/q106 machinery) merged across the
    * trailing span — registers merge where counts cannot. */
  def stickiness(events: org.apache.spark.sql.DataFrame,
      shortMinutes: Int = 10, factor: Int = 7): org.apache.spark.sql.DataFrame = {
    require(shortMinutes >= 1 && factor >= 2)
    val unitUs = shortMinutes * 60000000L
    val base = events.select(
      expr(s"unix_micros(ts) div $unitUs").as("win"), col("user_id"))
    val sau = base.groupBy(col("win"))
      .agg(countDistinct(col("user_id")).as("n_short"))
    val lau = base
      .select(explode(sequence(col("win"), col("win") + (factor - 1))).as("lwin"),
        col("user_id"))
      .groupBy(col("lwin"))
      .agg(countDistinct(col("user_id")).as("n_long"))
    sau.join(lau, col("win") === col("lwin"))
      .select((col("win") * shortMinutes * 60L).as("win_start"),
        col("n_short"), col("n_long"),
        (col("n_short").cast("double") / col("n_long").cast("double")).as("stickiness"))
      .orderBy(col("win_start"))
  }

  /** Co-engagement lift — market-basket association over event types: for
    * each type pair, the user-level lift
    * n_both·n_users / (n_a·n_b) (> 1 ⇒ doing A makes doing B more likely
    * than base rate — the cross-sell/feature-affinity signal). Everything
    * after the one distinct projection is bounded: (user, type) rows cap
    * at users × |types|, the per-user self-join fans ≤ |types|² per user,
    * and the output is the type-pair census. The lift is a pure rational
    * of exact counts — floor-quantized (CLAUDE.md: ratio of integers, not
    * a noise-dominated aggregate). */
  def coEngagementLift(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ut = events.select(col("user_id"), col("event_type")).distinct()
    val totals = ut.agg(countDistinct(col("user_id")).as("n_users"))
    val perType = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n_t"))
    val pairs = ut.as("a")
      .join(ut.as("b"), col("a.user_id") === col("b.user_id") &&
        col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    val lift = (col("n_both").cast("double") * col("n_users").cast("double")) /
      (col("n_a").cast("double") * col("n_b").cast("double"))
    pairs
      .join(broadcast(perType.select(col("event_type").as("type_a"), col("n_t").as("n_a"))), "type_a")
      .join(broadcast(perType.select(col("event_type").as("type_b"), col("n_t").as("n_b"))), "type_b")
      .crossJoin(broadcast(totals))
      .select(col("type_a"), col("type_b"), col("n_both"),
        (floor(lift * 1e6 + 0.5) / 1e6).as("lift"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Discrete-time churn hazard — the survival-analysis census with
    * right-censoring handled the Kaplan-Meier way but WITHOUT the
    * cumulative product (a product of many doubles is exactly the
    * transcendental-replay hazard CLAUDE.md bans; the per-step hazard
    * d_k/n_k is one division of exact integers and carries the same
    * information). Per user: observed lifetime = last active day − first
    * active day (integer days via µs div). A user whose last activity
    * predates the corpus horizon by more than `censorDays` is CHURNED at
    * its lifetime; later users are right-censored (they leave the risk
    * set without a churn event — dropping them instead would bias hazards
    * up). At-risk counts come from a reverse running sum over the
    * lifetime census — a window over aggregated rows bounded by the day
    * horizon, never events, so the shape is census-sized at any corpus
    * scale; the only unbounded work is the per-user min/max partial agg. */
  def churnHazard(events: org.apache.spark.sql.DataFrame,
      censorDays: Int = 1): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayUs = 86400000000L
    val days = events.select(col("user_id"),
      expr(s"unix_micros(ts) div $dayUs").as("day"))
    val users = days.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val horizon = days.agg(max(col("day")).as("hmax"))
    val lives = users.crossJoin(broadcast(horizon))
      .select((col("d1") - col("d0")).as("k"),
        when(col("d1") < col("hmax") - censorDays, 1L).otherwise(0L).as("is_churn"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("ended"), sum(col("is_churn")).as("churned"))
    val rev = Window.orderBy(col("k").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lives
      .withColumn("at_risk", sum(col("ended")).over(rev))
      .select(col("k"), col("at_risk"), col("churned"),
        (col("churned").cast("double") / col("at_risk").cast("double")).as("hazard"))
      .orderBy(col("k"))
  }

  /** Lag-1 autocorrelation of the windowed event-rate series per type —
    * the burstiness/trend diagnostic behind the q130 anomaly monitor
    * (hazard flags assume near-independent windows; r₁ near 1 says the
    * census is trending, near 0 says Poisson-ish). Adjacent OBSERVED
    * windows pair via a census self-join on win+1 (empty windows are
    * absent from the census, so a gap ends a pair chain rather than
    * fabricating zeros). Pearson r from the exact integer moment sums
    *   r = (mΣxy − ΣxΣy) / (√(mΣx²−(Σx)²)·√(mΣy²−(Σy)²))
    * — every sum is an exact long, √ is IEEE-correctly-rounded, so the
    * whole expression is deterministic cross-engine; floor-quantized per
    * the pure-rational rule. Census-sized everywhere past the one
    * groupBy over events. */
  def rateAutocorr(events: org.apache.spark.sql.DataFrame,
      windowMinutes: Int = 10, minPairs: Int = 4): org.apache.spark.sql.DataFrame = {
    val unitUs = windowMinutes * 60000000L
    autocorrFromCensus(events
      .groupBy(expr(s"unix_micros(ts) div $unitUs").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n")),
      minPairs)
  }

  /** Scoring half of [[rateAutocorr]], factored out (the [[scoreRates]]
    * split) so a STREAMING census — `EventStream.windowedCounts` rows
    * with `win = win_start div stepSeconds` — can be scored sink-side:
    * the streaming query keeps only its one census aggregation, and the
    * correlation is a batch pass over the emitted, already-bounded
    * census. Adjacent pairs come from a lead window over the census (one
    * pass, and — the CLAUDE.md memory-sink rule — a census self-join
    * fails analysis outright when the census is a streaming memory-sink
    * view, since both join sides share attribute ids); the gap guard
    * `lead(win) = win + 1` keeps missing windows ending a pair chain
    * rather than fabricating zeros. */
  def autocorrFromCensus(census: org.apache.spark.sql.DataFrame,
      minPairs: Int = 4): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("win"))
    val pairs = census
      .withColumn("nw", lead(col("win"), 1).over(w))
      .withColumn("y", lead(col("n"), 1).over(w))
      .filter(col("nw") === col("win") + 1)
      .select(col("event_type"), col("n").as("x"), col("y"))
    val m = col("m").cast("double")
    val num = m * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val denx = m * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val deny = m * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    pairs.groupBy(col("event_type"))
      .agg(count(lit(1)).as("m"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .filter(col("m") >= minPairs)
      // nullif: a zero-variance pair series (constant counts) has no
      // defined correlation — NULL, never an ANSI divide-by-zero throw
      .select(col("event_type"), col("m"),
        (floor(num / nullif(sqrt(denx) * sqrt(deny), lit(0.0)) * 1e6 + 0.5)
          / 1e6).as("r1"))
      .orderBy(col("event_type"))
  }

  /** Bounce rate by entry type — per first-event-of-session type, the
    * share of sessions that end after that single event (the engagement
    * cliff per landing surface). Rides [[sessionized]]'s one user_id
    * shuffle; the per-session rollup needs the entry type, taken as the
    * rank-1 row of the in-session window (total (t, event_id) order —
    * deterministic cross-engine); the rate is a quantized rational. */
  def bounceRate(events: org.apache.spark.sql.DataFrame,
      gapUs: Long = 1800000000L): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val inSess = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("t"), col("event_id"))
    val sess = sessionized(events, gapUs)
      .withColumn("rn", row_number().over(inSess))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_ev"),
        max(when(col("rn") === 1, col("event_type"))).as("entry"))
    val rate = col("n_bounce").cast("double") / col("n_sessions").cast("double")
    sess.groupBy(col("entry"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_ev") === 1, 1L).otherwise(0L)).as("n_bounce"))
      .select(col("entry"), col("n_sessions"), col("n_bounce"),
        (floor(rate * 1e6 + 0.5) / 1e6).as("bounce_rate"))
      .orderBy(col("entry"))
  }

  /** RFM segmentation — the user-value census: each user scored
    * high/low against the population MEDIAN on recency (days since last
    * activity), frequency (event count), and monetary (value summed in
    * exact integer cents — per-row quantization BEFORE the sum, so the
    * aggregate is order-free and bit-identical cross-engine, where a
    * double sum binned at an edge could flip a bucket on a 1-ulp
    * summation difference). Medians come from [[Sketches.bisectQuantiles]]
    * over the materialized user census (bounded state); bucketing is a
    * broadcast compare; the output is the 2×2×2 segment census. */
  def rfmSegments(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.core.Lineage.CutOps
    val dayUs = 86400000000L
    val users = events
      .select(col("user_id"), expr(s"unix_micros(ts) div $dayUs").as("day"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy(col("user_id"))
      .agg(max(col("day")).as("last_day"), count(lit(1)).as("freq"),
        sum(col("cents")).as("mon"))
      .cutLineage()
    val horizon = users.agg(max(col("last_day")).as("hmax"))
    val base = users.crossJoin(broadcast(horizon))
      .select(col("user_id"), (col("hmax") - col("last_day")).as("rec"),
        col("freq"), col("mon"), lit("g").as("g"))
      .cutLineage()
    def median(metric: String): org.apache.spark.sql.DataFrame =
      Sketches.bisectQuantiles(base, metric, "g", Seq(0.5), scale = 1)
        .select(col("val").cast("long").as(s"med_$metric"))
    base
      .crossJoin(broadcast(median("rec")))
      .crossJoin(broadcast(median("freq")))
      .crossJoin(broadcast(median("mon")))
      .groupBy(
        when(col("rec") > col("med_rec"), 1L).otherwise(0L).as("r_high"),
        when(col("freq") > col("med_freq"), 1L).otherwise(0L).as("f_high"),
        when(col("mon") > col("med_mon"), 1L).otherwise(0L).as("m_high"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("r_high"), col("f_high"), col("m_high"))
  }

  /** Weekly seasonality profile — the (day-of-week, hour) activity census
    * with each cell's share of total traffic. Day-of-week is pure integer
    * arithmetic ((epoch_days + 4) mod 7, 0 = Sunday — 1970-01-01 was a
    * Thursday), never an engine calendar function, so both engines agree
    * by construction. One partial-agg census; the total is a one-row
    * broadcast. */
  def seasonalityProfile(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dayUs = 86400000000L
    val hourUs = 3600000000L
    val census = events
      .groupBy(expr(s"pmod(unix_micros(ts) div $dayUs + 4, 7)").as("dow"),
        expr(s"pmod(unix_micros(ts) div $hourUs, 24)").as("hour"))
      .agg(count(lit(1)).as("n"))
    val tot = census.agg(sum(col("n")).as("n_tot"))
    census.crossJoin(broadcast(tot))
      .select(col("dow"), col("hour"), col("n"),
        (floor(col("n").cast("double") / col("n_tot").cast("double") * 1e6 + 0.5)
          / 1e6).as("share"))
      .orderBy(col("dow"), col("hour"))
  }

  /** Two-proportion z-test on conversion by variant — the A/B staple: a
    * deterministic user split (user_id mod 2 — swap in q117's hash split
    * for production), conversion = reached 'purchase', pooled-variance z.
    * Every input to the z dag is an exact integer census; the z itself is
    * a handful of IEEE ops (one sqrt — correctly rounded), so the output
    * quantizes deterministically. One distinct-user projection, then
    * everything is a 2-row census. */
  def abConversionZ(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val users = events
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
      .select(pmod(col("user_id"), lit(2)).as("variant"), col("conv"))
    val census = users.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("x"))
    val a = census.filter(col("variant") === 0)
      .select(col("n").as("n_a"), col("x").as("x_a"))
    val b = census.filter(col("variant") === 1)
      .select(col("n").as("n_b"), col("x").as("x_b"))
    val pa = col("x_a").cast("double") / col("n_a").cast("double")
    val pb = col("x_b").cast("double") / col("n_b").cast("double")
    val pp = (col("x_a") + col("x_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    // nullif: degenerate censuses (0% or 100% pooled conversion) have no
    // defined z — NULL, never an ANSI divide-by-zero (the q143 rule)
    val z = (pa - pb) /
      nullif(sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / col("n_a").cast("double") + lit(1.0) / col("n_b").cast("double"))),
        lit(0.0))
    a.crossJoin(b)
      .select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        (floor(z * 1e6 + 0.5) / 1e6).as("z"),
        (abs(z) > lit(1.96)).as("significant"))
  }

  /** Revenue concentration (Pareto audit) — how much of total monetary
    * value the top decile of users carries. The decile CUTOFF comes from
    * [[Sketches.bisectQuantiles]] (p90 of per-user cents — bounded
    * state), and the share is two partial aggs against that broadcast
    * threshold — no global sort, no rank window over the user census.
    * Monetary is exact integer cents throughout (the q157 rule). */
  def revenuePareto(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.core.Lineage.CutOps
    val users = events
      .select(col("user_id"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy(col("user_id")).agg(sum(col("cents")).as("mon"))
      .withColumn("g", lit("g"))
      .cutLineage()
    val cutoff = Sketches.bisectQuantiles(users, "mon", "g", Seq(0.9), scale = 1)
      .select(col("val").cast("long").as("cutoff_cents"))
    val share = col("top_cents").cast("double") / col("total_cents").cast("double")
    users.crossJoin(broadcast(cutoff))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("mon") > col("cutoff_cents"), 1L).otherwise(0L)).as("n_top"),
        sum(col("mon")).as("total_cents"),
        sum(when(col("mon") > col("cutoff_cents"), col("mon")).otherwise(0L))
          .as("top_cents"),
        max(col("cutoff_cents")).as("cutoff_cents"))
      .select(col("cutoff_cents"), col("n_users"), col("n_top"),
        col("total_cents"), col("top_cents"),
        (floor(share * 1e6 + 0.5) / 1e6).as("top_share"))
  }

  /** Per-type value trend — grouped OLS: slope/intercept/r² of `value`
    * against the hour index, per event type (is the metric drifting up or
    * down per surface?). The x axis is the INTEGER hour offset from the
    * global minimum hour, so Σx and Σx² are exact longs (raw epoch-hours
    * squared would sit at the double-precision cliff); the y moments are
    * order-dependent double sums → round(6) outputs (the q152 rule). One
    * broadcast scalar + one partial-agg census. */
  def valueTrend(events: org.apache.spark.sql.DataFrame,
      minPoints: Long = 8): org.apache.spark.sql.DataFrame = {
    val hourUs = 3600000000L
    val base = events.select(col("event_type"),
      expr(s"unix_micros(ts) div $hourUs").as("h"), col("value"))
    val h0 = base.agg(min(col("h")).as("h0"))
    val pts = base.crossJoin(broadcast(h0))
      .select(col("event_type"), (col("h") - col("h0")).as("x"), col("value").as("y"))
    val m = col("m").cast("double")
    val num = m * col("sxy") - col("sx").cast("double") * col("sy")
    val denx = m * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val deny = m * col("syy") - col("sy") * col("sy")
    pts.groupBy(col("event_type"))
      .agg(count(lit(1)).as("m"),
        sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y")).as("sy"), sum(col("y") * col("y")).as("syy"),
        sum(col("x").cast("double") * col("y")).as("sxy"))
      .filter(col("m") >= minPoints)
      .select(col("event_type"), col("m"),
        round(num / denx, 6).as("slope"),
        round((col("sy") - num / denx * col("sx").cast("double")) / m, 6)
          .as("intercept"),
        round(num * num / nullif(denx * deny, lit(0.0)), 6).as("r2"))
      .orderBy(col("event_type"))
  }

  /** χ² test of independence between event type and day-of-week — "is
    * traffic mix stable across the week?". Observed cells are exact
    * integer censuses; expected cells are rationals of those integers;
    * the statistic is a bounded sum of identical IEEE terms on both
    * engines (cell count ≤ |types|·7), floor-quantized. Margins derive
    * FROM the cell census (one corpus pass) via windows over census
    * rows. */
  def chiSquareTypeDow(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayUs = 86400000000L
    val cells = events
      .groupBy(col("event_type"),
        expr(s"pmod(unix_micros(ts) div $dayUs + 4, 7)").as("dow"))
      .agg(count(lit(1)).as("o"))
    val withMargins = cells
      .withColumn("row_t", sum(col("o")).over(Window.partitionBy(col("event_type"))))
      .withColumn("col_t", sum(col("o")).over(Window.partitionBy(col("dow"))))
      .withColumn("n_tot", sum(col("o")).over(Window.partitionBy()))
    val e = col("row_t").cast("double") * col("col_t").cast("double") /
      col("n_tot").cast("double")
    val term = (col("o").cast("double") - e) * (col("o").cast("double") - e) / e
    val nr = col("n_rows").cast("double")
    val nc = col("n_cols").cast("double")
    withMargins
      .agg(sum(term).as("chi2_raw"),
        countDistinct(col("event_type")).as("n_rows"),
        countDistinct(col("dow")).as("n_cols"))
      .select(round(col("chi2_raw"), 6).as("chi2"), // noise-dominated sum → round, not floor-quantize
        ((nr - 1) * (nc - 1)).cast("long").as("dof"))
  }

  /** The q112 funnel fold, factored for reuse: per user, the timestamps
    * of signup → first click after it → first purchase after that, as one
    * struct column `f(s_t, c_t, p_t)` (integer µs, NULL = stage never
    * reached). ONE scan, one user_id shuffle, per-user state bounded by
    * that user's activity — the join formulation consumed the stream once
    * per stage (audited r6: 3 corpus lineages → 1). */
  def funnelTimes(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val nil = lit(null).cast("long")
    events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
      .filter(col("event_type").isin("signup", "click", "purchase"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("t"), col("event_type")))).as("evs"))
      .select(col("user_id"), aggregate(col("evs"),
        struct(nil.as("s_t"), nil.as("c_t"), nil.as("p_t")),
        (acc, e) => struct(
          when(acc("s_t").isNull && e("event_type") === "signup", e("t"))
            .otherwise(acc("s_t")).as("s_t"),
          when(acc("c_t").isNull && acc("s_t").isNotNull &&
              e("event_type") === "click" && e("t") > acc("s_t"), e("t"))
            .otherwise(acc("c_t")).as("c_t"),
          when(acc("p_t").isNull && acc("c_t").isNotNull &&
              e("event_type") === "purchase" && e("t") > acc("c_t"), e("t"))
            .otherwise(acc("p_t")).as("p_t"))).as("f"))
  }

  /** Funnel time-to-convert quantiles — how LONG each conversion stage
    * takes, not just how many reach it: exact p50/p90 of the two
    * stage-gap distributions (signup→click, click→purchase), gaps in
    * integer µs from [[funnelTimes]]'s per-user struct, quantiles through
    * [[Sketches.bisectQuantiles]] (bounded state). The gap frame is
    * materialized once ahead of the descent rounds (the q149 note). */
  def funnelTimeQuantiles(events: org.apache.spark.sql.DataFrame,
      qs: Seq[Double] = Seq(0.5, 0.9)): org.apache.spark.sql.DataFrame = {
    import graft.core.Lineage.CutOps
    val gaps = funnelTimes(events)
      .select(explode(array(
        struct(lit("signup_to_click").as("stage"),
          (col("f.c_t") - col("f.s_t")).as("gap")),
        struct(lit("click_to_purchase").as("stage"),
          (col("f.p_t") - col("f.c_t")).as("gap")))).as("g"))
      .select(col("g.stage").as("stage"), col("g.gap").as("gap"))
      .filter(col("gap").isNotNull)
      .cutLineage()
    Sketches.bisectQuantiles(gaps, "gap", "stage", qs, scale = 1)
      .orderBy(col("grp"), col("q"))
  }

  /** Per-type inter-arrival gap quantiles — the engagement-cadence
    * distribution (median/p90 time between a user's consecutive events of
    * a type). Gaps are integer-µs diffs within a (user, type) partition
    * (the q54 gap spelling — user-bounded windows, never a global sort),
    * and the per-TYPE quantiles go through
    * [[Sketches.bisectQuantiles]] — exact answers in bounded state, so
    * the one per-group-unbounded aggregate (q23's weakness) never
    * appears. Retiring the `weak` badge, the composed way: this is a
    * bench-visible consumer of the bisection scale path. */
  def gapQuantiles(events: org.apache.spark.sql.DataFrame,
      qs: Seq[Double] = Seq(0.5, 0.9)): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUserType = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("t"), col("event_id"))
    import graft.core.Lineage.CutOps
    // materialize the gap projection once — the bisection probes its input
    // once per descent round, and re-running the lag window per round
    // would multiply the corpus shuffle by the round count
    val gaps = events
      .withColumn("t", unix_micros(col("ts")))
      .withColumn("gap", col("t") - lag(col("t"), 1).over(byUserType))
      .filter(col("gap").isNotNull)
      .select(col("event_type"), col("gap"))
      .cutLineage()
    Sketches.bisectQuantiles(gaps, "gap", "event_type", qs, scale = 1)
      .orderBy(col("grp"), col("q"))
  }

  /** Robust outlier census per event type — median/MAD instead of
    * mean/σ, so a single extreme value cannot drag its own threshold
    * (the classic failure of 3σ flags on heavy-tailed value columns).
    * Values quantize to exact integer cents BEFORE any aggregation (the
    * q157 monetary rule), the per-type median and the median absolute
    * deviation both come from [[Sketches.bisectQuantiles]] (exact,
    * bounded state — event-type cardinality is bounded so brackets
    * broadcast), and the flag `|cents − med| > k·MAD` is a pure integer
    * comparison — no IEEE op anywhere near the decision boundary. The
    * corpus is scanned by partial-agg censuses only; the output is the
    * per-type outlier census, never the outlier rows themselves. */
  def robustOutliers(events: org.apache.spark.sql.DataFrame,
      k: Int = 3): org.apache.spark.sql.DataFrame = {
    import graft.core.Lineage.CutOps
    val base = events
      .select(col("event_type"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .cutLineage()
    val med = Sketches.bisectQuantiles(base, "cents", "event_type", Seq(0.5), scale = 1)
      .select(col("grp").as("event_type"), col("val").cast("long").as("med_cents"))
    val dev = base.join(broadcast(med), Seq("event_type"))
      .select(col("event_type"), col("med_cents"),
        abs(col("cents") - col("med_cents")).as("dev"))
    val mad = Sketches.bisectQuantiles(dev, "dev", "event_type", Seq(0.5), scale = 1)
      .select(col("grp").as("event_type"), col("val").cast("long").as("mad_cents"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"), col("med_cents"), col("mad_cents"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("dev") > lit(k.toLong) * col("mad_cents"), 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("event_type"), col("med_cents"), col("mad_cents"), col("n"),
        col("n_outliers"),
        (floor(col("n_outliers").cast("double") / col("n").cast("double") * 1e6
          + lit(0.5)) / 1e6).as("outlier_rate"))
      .orderBy(col("event_type"))
  }

  /** Last-touch attribution — each purchase credited to the most recent
    * non-purchase event by the same user within `windowDays` (the
    * marketing-attribution staple). One user-partitioned window pass
    * carries the running last touch (type and time) via
    * `last(..., ignoreNulls)` over a total (t, event_id) order — the
    * same single-exchange discipline as the q112 funnel fold, so user
    * history never leaves its partition and there is no event↔event
    * join. Purchases whose last touch is missing or stale attribute to
    * 'none' rather than silently dropping — the census always sums to
    * the purchase count. Time math is integer µs throughout. */
  def lastTouchAttribution(events: org.apache.spark.sql.DataFrame,
      windowDays: Int = 7): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val horizonUs = windowDays * 86400000000L
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    val touchT = when(col("event_type") =!= "purchase", col("t"))
    val attributed = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
      .withColumn("touch_type", last(touch, ignoreNulls = true).over(byUser))
      .withColumn("touch_t", last(touchT, ignoreNulls = true).over(byUser))
      .filter(col("event_type") === "purchase")
      .select(when(col("touch_t").isNotNull &&
        col("t") - col("touch_t") <= lit(horizonUs), col("touch_type"))
        .otherwise(lit("none")).as("touch"))
    val census = attributed.groupBy(col("touch")).agg(count(lit(1)).as("n_purchases"))
    val tot = census.agg(sum(col("n_purchases")).as("n_tot"))
    census.crossJoin(broadcast(tot))
      .select(col("touch"), col("n_purchases"),
        (floor(col("n_purchases").cast("double") / col("n_tot").cast("double")
          * 1e6 + lit(0.5)) / 1e6).as("share"))
      .orderBy(col("touch"))
  }

  /** Value-distribution drift between time halves — the batch twin of the
    * streaming TV monitor, for "did this type's value distribution move?"
    * audits between pipeline runs: per-type quartile edges over the WHOLE
    * range (both halves share bins — drift in the data, not in the
    * binning), a (type, half, bucket) census, and total-variation
    * distance spelled INTEGER-EXACT: TV = Σ|n_a·N_b − n_b·N_a| /
    * (2·N_a·N_b), so the only IEEE op is the final division of two exact
    * longs (sum-order noise cannot exist; the long products stay far from
    * overflow for censuses < ~3e9·3e9). Edges come from
    * [[Sketches.bisectQuantiles]] (bounded state); the corpus shuffles
    * once into the census. */
  def valueDrift(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.core.Lineage.CutOps
    val base = events
      .select(col("event_type"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"),
        unix_micros(col("ts")).as("t"))
      .cutLineage()
    val rng = base.agg(min(col("t")).as("t0"), max(col("t")).as("t1"))
    val edges = Sketches.bisectQuantiles(base, "cents", "event_type",
        Seq(0.25, 0.5, 0.75), scale = 1)
      .groupBy(col("grp").as("event_type"))
      .agg(max(when(col("q") === 0.25, col("val"))).cast("long").as("e25"),
        max(when(col("q") === 0.5, col("val"))).cast("long").as("e50"),
        max(when(col("q") === 0.75, col("val"))).cast("long").as("e75"))
    val census = base.crossJoin(broadcast(rng))
      .join(broadcast(edges), Seq("event_type"))
      .select(col("event_type"),
        when(col("t") <= col("t0") + expr("(t1 - t0) div 2"), 0L).otherwise(1L)
          .as("half"),
        (when(col("cents") > col("e25"), 1L).otherwise(0L) +
          when(col("cents") > col("e50"), 1L).otherwise(0L) +
          when(col("cents") > col("e75"), 1L).otherwise(0L)).as("bucket"))
      .groupBy(col("event_type"), col("half"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .cutLineage()
    val a = census.filter(col("half") === 0L)
      .select(col("event_type"), col("bucket"), col("n").as("na"))
    val b = census.filter(col("half") === 1L)
      .select(col("event_type"), col("bucket"), col("n").as("nb"))
    val cells = a.join(b, Seq("event_type", "bucket"), "full_outer")
      .na.fill(0L, Seq("na", "nb"))
    val tots = census.groupBy(col("event_type"))
      .agg(sum(when(col("half") === 0L, col("n")).otherwise(0L)).as("n_a"),
        sum(when(col("half") === 1L, col("n")).otherwise(0L)).as("n_b"))
    cells.join(tots, Seq("event_type"))
      .groupBy(col("event_type"), col("n_a"), col("n_b"))
      .agg(sum(abs(col("na") * col("n_b") - col("nb") * col("n_a"))).as("num"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        // nullif: a type entirely inside one half has no defined TV —
        // NULL, never an Infinity reaching floor() (the q143/q160 rule)
        (floor(col("num").cast("double") /
          nullif(lit(2.0) * col("n_a").cast("double") * col("n_b").cast("double"),
            lit(0.0))
          * 1e6 + lit(0.5)) / 1e6).as("tv"))
      .orderBy(col("event_type"))
  }

  /** Week-over-week growth per event type — the growth-accounting
    * census: events bucketed onto the integer week grid (µs div week —
    * never an engine calendar function), counted, and each week scored
    * against the PREVIOUS CONTIGUOUS week: a gap in the series yields
    * NULL growth rather than comparing across the hole (the q143
    * gap rule). The lag window runs over census rows — types × weeks,
    * bounded by the time horizon — never events; growth is a
    * floor-quantized exact rational. */
  def weeklyGrowth(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weekUs = 7L * 86400000000L
    val w = Window.partitionBy(col("event_type")).orderBy(col("week"))
    events
      .groupBy(col("event_type"),
        expr(s"unix_micros(ts) div $weekUs").as("week"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prev_week", lag(col("week"), 1).over(w))
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .select(col("event_type"), col("week"), col("n"),
        when(col("prev_week") === col("week") - 1,
          floor((col("n") - col("prev_n")).cast("double") /
            col("prev_n").cast("double") * 1e6 + lit(0.5)) / 1e6)
          .as("wow_growth"))
      .orderBy(col("event_type"), col("week"))
  }

  /** Shared touch-list builder for the q178/q180 attribution family.
    * The frame ITSELF is the attribution horizon —
    * `orderBy(t).rangeBetween(-horizonUs, -1)` — so per-row window state
    * is the touch history WITHIN the window, never the user's entire
    * past (the r7-verdict scale-killer: the old
    * `rowsBetween(unboundedPreceding, -1)` + post-filter shape carried a
    * bot user's full history per purchase — O(history) state,
    * O(history²) work). The range frame orders by `t` alone, so a touch
    * at EXACTLY the purchase's timestamp is outside the window (the
    * `-1` upper bound), and in-list order among equal-t touches is not
    * relied on: the remainder recipient is the MAX (tt, tid) element —
    * event_id is unique, so exactly one element matches and tie handling
    * lives in the credit arithmetic, not the frame order.
    *
    * `maxDailyTouches` (0 = off, the gate default) is the promised
    * per-user touch cap for IN-horizon bots: a user emitting unbounded
    * events inside one window still yields bounded lists because only
    * the `cap` most-recent touches per (user, UTC-day bucket) survive —
    * list length ≤ cap·(windowDays+1). The rank window is an incremental
    * O(1)-state frame (row_number), so the cap never recreates the
    * hazard it removes. */
  private def touchLists(events: org.apache.spark.sql.DataFrame,
      windowDays: Int, maxDailyTouches: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayUs = 86400000000L
    val horizonUs = windowDays * dayUs
    val base = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
    val capped =
      if (maxDailyTouches <= 0) base
      else {
        val byDay = Window
          .partitionBy(col("user_id"), expr(s"t div $dayUs"),
            col("event_type") === "purchase")
          .orderBy(col("t").desc, col("event_id").desc)
        base.withColumn("rk", row_number().over(byDay))
          .filter(col("event_type") === "purchase" ||
            col("rk") <= maxDailyTouches)
          .drop("rk")
      }
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("t"))
      .rangeBetween(-horizonUs, -1)
    capped
      .withColumn("tl", collect_list(
        when(col("event_type") =!= "purchase",
          struct(col("t").as("tt"), col("event_id").as("tid"),
            col("event_type").as("ty")))).over(byUser))
      .filter(col("event_type") === "purchase")
      .withColumn("mx", expr("array_max(transform(tl, x -> struct(x.tt, x.tid)))"))
      .withColumn("n", size(col("tl")).cast("long"))
  }

  /** Multi-touch attribution — q167's sibling for the linear model: each
    * purchase's credit splits EVENLY across every touch event in the
    * window, allocated in integer MICRO-CREDITS (10⁶ per purchase,
    * `10⁶ div n` per touch with the remainder to the max-(tt, event_id)
    * touch) so per-purchase credit conserves EXACTLY — Σ census =
    * 10⁶ · purchases as a checkable long identity, where a double 1/n
    * weighting would drift in the sum order (the q157 cents rule applied
    * to credit). One user-partitioned window pass with a RANGE frame
    * bounded to the horizon (see [[touchLists]]); purchases with no
    * touch credit 'none'. */
  def multiTouchAttribution(events: org.apache.spark.sql.DataFrame,
      windowDays: Int = 7,
      maxDailyTouches: Int = 0): org.apache.spark.sql.DataFrame = {
    val credited = touchLists(events, windowDays, maxDailyTouches)
      .select(col("n"), col("mx"), posexplode_outer(col("tl")).as(Seq("pos", "x")))
      .select(
        when(col("x").isNull, lit("none")).otherwise(col("x.ty")).as("touch"),
        when(col("x").isNull, lit(1000000L))
          .otherwise(expr("cast(1000000 as bigint) div n") +
            when(col("x.tt") === col("mx.tt") && col("x.tid") === col("mx.tid"),
              expr("cast(1000000 as bigint) % n")).otherwise(lit(0L)))
          .as("credit"))
    val census = credited.groupBy(col("touch"))
      .agg(sum(col("credit")).as("credit_micro"))
    val tot = census.agg(sum(col("credit_micro")).as("c_tot"))
    census.crossJoin(broadcast(tot))
      .select(col("touch"), col("credit_micro"),
        (floor(col("credit_micro").cast("double") / col("c_tot").cast("double")
          * 1e6 + lit(0.5)) / 1e6).as("share"))
      .orderBy(col("touch"))
  }

  /** Per-user engagement diversity — Gini–Simpson 1 − Σpᵢ² over each
    * user's event-type mix, spelled with an INTEGER-EXACT numerator:
    * D = (n² − Σnᵢ²) / n², so the only IEEE op is one division of two
    * exact longs (entropy would need Σ p·ln p — the transcendental-replay
    * hazard — for the same "how one-dimensional is this user" signal).
    * Two partial-agg censuses on the user key: (user, type) counts, then
    * per-user Σnᵢ²; no window, no per-user sort. */
  def userDiversity(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    events
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("ni"))
      .groupBy(col("user_id"))
      .agg(sum(col("ni")).as("n_events"),
        count(lit(1)).as("n_types"),
        sum(col("ni") * col("ni")).as("ss"))
      .select(col("user_id"), col("n_events"), col("n_types"),
        (floor((col("n_events") * col("n_events") - col("ss")).cast("double") /
          (col("n_events") * col("n_events")).cast("double") * 1e6 + lit(0.5))
          / 1e6).as("diversity"))
      .orderBy(col("user_id"))
  }

  /** Time-decay attribution — the third of the attribution family (last
    * touch q167, linear q178): each in-window touch weighted by
    * freshness with the q122 halving-per-day trick, W = 2^(windowDays −
    * age_days) — an exact power-of-two LONG, never pow()/exp() — and the
    * purchase's 10⁶ micro-credits split ∝ W with the remainder on the
    * max-(tt, event_id) touch, so per-purchase credit conserves exactly
    * (the q178 identity). The RANGE frame bounds both the age (so the
    * exponent sits in [0, windowDays] — `require(windowDays <= 62)`
    * keeps shiftleft out of the JVM's 6-bit mask-wrap regime) and the
    * window state (see [[touchLists]]); the weight sum and remainder
    * are HOF folds over the in-window list, all integer arithmetic.
    * Same single user exchange as q167/q178. */
  def timeDecayAttribution(events: org.apache.spark.sql.DataFrame,
      windowDays: Int = 7,
      maxDailyTouches: Int = 0): org.apache.spark.sql.DataFrame = {
    require(windowDays >= 1 && windowDays <= 62,
      s"windowDays must be in [1, 62] (got $windowDays): shiftleft masks the " +
        "shift amount to 6 bits, so 2^(windowDays - age) would silently wrap")
    val dayUs = 86400000000L
    val wExpr = s"shiftleft(cast(1 as bigint), " +
      s"cast($windowDays - (t - x.tt) div $dayUs as int))"
    val credited = touchLists(events, windowDays, maxDailyTouches)
      .withColumn("sw",
        expr(s"aggregate(tl, cast(0 as bigint), (acc, x) -> acc + $wExpr)"))
      .withColumn("rem", expr(
        s"cast(1000000 as bigint) - aggregate(tl, cast(0 as bigint), " +
          s"(acc, x) -> acc + (cast(1000000 as bigint) * ($wExpr)) div sw)"))
      .select(col("t"), col("sw"), col("rem"), col("mx"),
        posexplode_outer(col("tl")).as(Seq("pos", "x")))
      .select(
        when(col("x").isNull, lit("none")).otherwise(col("x.ty")).as("touch"),
        when(col("x").isNull, lit(1000000L))
          .otherwise(
            expr(s"(cast(1000000 as bigint) * shiftleft(cast(1 as bigint), " +
              s"cast($windowDays - (t - x.tt) div $dayUs as int))) div sw") +
            when(col("x.tt") === col("mx.tt") && col("x.tid") === col("mx.tid"),
              col("rem")).otherwise(lit(0L)))
          .as("credit"))
    val census = credited.groupBy(col("touch"))
      .agg(sum(col("credit")).as("credit_micro"))
    val tot = census.agg(sum(col("credit_micro")).as("c_tot"))
    census.crossJoin(broadcast(tot))
      .select(col("touch"), col("credit_micro"),
        (floor(col("credit_micro").cast("double") / col("c_tot").cast("double")
          * 1e6 + lit(0.5)) / 1e6).as("share"))
      .orderBy(col("touch"))
  }

  /** Cohort lifetime-value curves — q111's retention grid with money on
    * it: users cohorted by first-active week, per-(cohort, age) spend
    * summed in EXACT INTEGER CENTS (q157 rule), cumulated by a running
    * sum over the CENSUS (cohorts × ages rows — the q142 bounded-window
    * discipline, never events), and per-user LTV as integer division of
    * exact longs. One user-keyed shuffle builds the cohort map; one
    * (cohort, age) census carries everything else. */
  def cohortLtv(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.core.Lineage.CutOps
    val weekUs = 7L * 86400000000L
    val base = events
      .select(col("user_id"), expr(s"unix_micros(ts) div $weekUs").as("week"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .cutLineage()
    val cohorts = base.groupBy(col("user_id")).agg(min(col("week")).as("cohort"))
    val sizes = cohorts.groupBy(col("cohort")).agg(count(lit(1)).as("n_users"))
    val cells = base.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort"), (col("week") - col("cohort")).as("age"))
      .agg(sum(col("cents")).as("week_cents"))
    val w = Window.partitionBy(col("cohort")).orderBy(col("age"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_cents", sum(col("week_cents")).over(w))
      .join(broadcast(sizes), Seq("cohort"))
      .select(col("cohort"), col("age"), col("n_users"), col("week_cents"),
        col("cum_cents"),
        expr("cum_cents div n_users").as("ltv_cents"))
      .orderBy(col("cohort"), col("age"))
  }

  /** Truncated exponentially-weighted hourly trend, α = ½ — the q122/q180
    * halving trick applied to smoothing: ŝ_t = Σ_{j=0..K-1} n_{t-j}/2^{j+1},
    * whose numerator Σ n_{t-j}·2^{K-1-j} is an EXACT long (never pow()),
    * divided once by the constant 2^K. The per-type hourly census is the
    * only event-sized shuffle; the smoothing window is a RANGE frame over
    * census rows bounded to K hours (the r8 attribution frame discipline),
    * so a missing hour contributes exactly zero and state per row is ≤ K
    * structs. */
  def ewmaTrend(events: org.apache.spark.sql.DataFrame,
      lags: Int = 8,
      gridUs: Long = 3600000000L): org.apache.spark.sql.DataFrame =
    ewmaFromCensus(
      events.groupBy(col("event_type"),
          expr(s"unix_micros(ts) div $gridUs").as("h"))
        .agg(count(lit(1)).as("n")),
      lags)

  /** Scoring half of [[ewmaTrend]], factored so a STREAMING census
    * (`EventStream.windowedCounts`' rows, win_start normalized to grid
    * units) smooths sink-side — the rank-on-closed-windows split every
    * monitor here uses (scoreRates, autocorrFromCensus, driftPerWindow):
    * the streaming query keeps only the census aggregation and the
    * smoothing is a batch pass over its bounded output. Input columns:
    * (event_type, h, n) with h on an integer grid. */
  def ewmaFromCensus(census: org.apache.spark.sql.DataFrame,
      lags: Int = 8): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(lags >= 1 && lags <= 62, s"lags must be in [1, 62] (got $lags)")
    val byType = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rangeBetween(-(lags - 1L), 0)
    census
      .withColumn("tl", collect_list(struct(col("h").as("hh"), col("n")))
        .over(byType))
      .select(col("event_type"), col("h"), col("n"),
        (expr(s"aggregate(tl, cast(0 as bigint), (acc, x) -> acc + x.n * " +
          s"shiftleft(cast(1 as bigint), cast(${lags - 1} - (h - x.hh) as int)))")
          .cast("double") / lit(math.pow(2.0, lags))).as("ewma"))
      .orderBy(col("event_type"), col("h"))
  }

  /** Burstiness audit — the Fano factor Var/Mean of per-hour counts per
    * event type over the GLOBAL hour grid (missing hours are real zeros:
    * m comes from the global [min, max] span, so a type that fires once
    * an hour scores ~0 and a type that fires in bursts scores ≫ 1 — a
    * Poisson stream scores ~1). Spelled integer-exact:
    * F = (m·Σc² − (Σc)²) / (m·Σc) — the zero hours change neither Σc nor
    * Σc², only m, so the censuses never materialize the grid. One hourly
    * census + one per-type partial agg + a one-row broadcast span. */
  def fanoBurstiness(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.core.Lineage.CutOps
    val hourUs = 3600000000L
    // cut: span agg and per-type census prune `cells` differently, which
    // defeats ReusedExchange (the r5 q104 shape) — without the cut the
    // events corpus is scanned twice (ADVICE r8)
    val cells = events
      .groupBy(col("event_type"), expr(s"unix_micros(ts) div $hourUs").as("h"))
      .agg(count(lit(1)).as("c"))
      .cutLineage()
    val span = cells.agg(
      (max(col("h")) - min(col("h")) + 1L).as("m"))
    cells.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_active_hours"),
        sum(col("c")).as("sc"), sum(col("c") * col("c")).as("scc"))
      .crossJoin(broadcast(span))
      .select(col("event_type"), col("n_active_hours"),
        (floor((col("m") * col("scc") - col("sc") * col("sc")).cast("double") /
          (col("m") * col("sc")).cast("double") * 1e6 + lit(0.5)) / 1e6)
          .as("fano"))
      .orderBy(col("event_type"))
  }

  /** CUSUM change-point scan per event type: over the type's ACTIVE-hour
    * census (ordered by hour), the cumulative deviation from the
    * first-half mean, scaled by the first-half count m1 so every partial
    * sum T_k = m1·Σ_{i≤k}c_i − k·s1 stays an exact long; the reported
    * change-point is the hour maximizing |T_k| (ties → earliest hour,
    * via a max on (|T|, −h) — deterministic without a sort). A stable
    * series scores ~0; a level shift scores ~shift·hours. The windows
    * run over census rows (types × active hours — the q142 bound), one
    * event-sized shuffle total. */
  def cusumChangePoint(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.core.Lineage.CutOps
    val hourUs = 3600000000L
    val byType = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val run = byType.rowsBetween(Window.unboundedPreceding, 0)
    // cut: three consumers (firstHalf, s1, the scored join) prune `cells`
    // differently — the census is materialized once so the corpus-sized
    // groupBy + windows don't replay per consumer (ADVICE r8)
    val cells = events
      .groupBy(col("event_type"), expr(s"unix_micros(ts) div $hourUs").as("h"))
      .agg(count(lit(1)).as("c"))
      .withColumn("k", row_number().over(byType).cast("long"))
      .withColumn("runsum", sum(col("c")).over(run))
      .cutLineage()
    val firstHalf = cells.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        expr("(count(1) + 1) div 2").as("m1"))
    val s1 = cells.join(broadcast(firstHalf), Seq("event_type"))
      .filter(col("k") <= col("m1"))
      .groupBy(col("event_type")).agg(sum(col("c")).as("s1"))
    cells.join(broadcast(firstHalf), Seq("event_type"))
      .join(broadcast(s1), Seq("event_type"))
      .withColumn("t", col("m1") * col("runsum") - col("k") * col("s1"))
      .groupBy(col("event_type"), col("n_hours"), col("m1"))
      .agg(max(struct(abs(col("t")).as("a"), (-col("h")).as("nh"))).as("best"))
      .select(col("event_type"), col("n_hours"),
        (-col("best.nh")).as("cp_hour"),
        (floor(col("best.a").cast("double") / col("m1").cast("double")
          * 1e6 + lit(0.5)) / 1e6).as("cusum"))
      .orderBy(col("event_type"))
  }

  /** Customer segment migration — q157's value segmentation applied to
    * BOTH halves of the horizon and joined per user: which users moved
    * between the 2×2 (frequency, monetary) quadrants, which arrived,
    * which went silent. The half split is the integer span midpoint
    * (engine-exact); each half gets its OWN exact medians (k-th order
    * statistics via the bounded bisection, per-half group rows — so the
    * labels mean "high for that era", robust to global drift); monetary
    * is exact integer cents. One user-keyed census per half, a full
    * outer self-join on user (co-partitioned), and a ≤ 5×5 migration
    * census. */
  def segmentMigration(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.core.Lineage.CutOps
    val dayUs = 86400000000L
    val base = events
      .select(col("user_id"), expr(s"unix_micros(ts) div $dayUs").as("day"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .cutLineage()
    val span = base.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
    val halves = base.crossJoin(broadcast(span))
      .withColumn("half",
        when(col("day") < expr("(dmin + dmax + 1) div 2"), "0").otherwise("1"))
      .groupBy(col("half"), col("user_id"))
      .agg(count(lit(1)).as("freq"), sum(col("cents")).as("mon"))
      .cutLineage()
    def med(metric: String) =
      Sketches.bisectQuantiles(halves, metric, "half", Seq(0.5), scale = 1)
        .select(col("grp").as("half"), col("val").cast("long").as(s"med_$metric"))
    val labeled = halves
      .join(broadcast(med("freq")), Seq("half"))
      .join(broadcast(med("mon")), Seq("half"))
      .select(col("half"), col("user_id"),
        concat(
          when(col("freq") > col("med_freq"), "F+").otherwise("F-"),
          when(col("mon") > col("med_mon"), "M+").otherwise("M-")).as("seg"))
    val h0 = labeled.filter(col("half") === "0")
      .select(col("user_id"), col("seg").as("seg_from"))
    val h1 = labeled.filter(col("half") === "1")
      .select(col("user_id"), col("seg").as("seg_to"))
    h0.join(h1, Seq("user_id"), "full_outer")
      .groupBy(coalesce(col("seg_from"), lit("absent")).as("seg_from"),
        coalesce(col("seg_to"), lit("absent")).as("seg_to"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("seg_from"), col("seg_to"))
  }

  /** Cross-type rate correlation — Pearson r of hourly count series per
    * type pair over their CO-ACTIVE hours (an inner join on the hour
    * grid: absent hours are not fabricated zeros — the q143 gap rule; a
    * pair that never co-fires drops out). One hourly census is the only
    * event-sized stage; the pair join and moment sums are census-sized
    * (types² pairs). All five moments are exact longs; r is one division
    * + IEEE sqrt, floor-quantized, NULL on zero variance or m < 3. */
  def rateCorrelation(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val hourUs = 3600000000L
    val cells = events
      .groupBy(col("event_type"), expr(s"unix_micros(ts) div $hourUs").as("h"))
      .agg(count(lit(1)).as("n"))
    val a = cells.select(col("event_type").as("type_a"), col("h"), col("n").as("x"))
    val b = cells.select(col("event_type").as("type_b"), col("h"), col("n").as("y"))
    a.join(b, Seq("h")).filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("m"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .filter(col("m") >= 3)
      .select(col("type_a"), col("type_b"), col("m"),
        (floor((col("m") * col("sxy") - col("sx") * col("sy")).cast("double") /
          nullif(sqrt((col("m") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("m") * col("syy") - col("sy") * col("sy")).cast("double")),
            lit(0.0)) * 1e6 + lit(0.5)) / 1e6).as("r"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Peak-hour concentration — per type, the share of its traffic inside
    * its top-3 hours: ~3/n_hours for steady streams, →1 for burst-driven
    * ones (the capacity-planning twin of the Fano audit, in share form).
    * The rank window runs over census rows partitioned by type (the
    * q142 bound); ties break on the earlier hour. */
  def peakConcentration(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourUs = 3600000000L
    val byType = Window.partitionBy(col("event_type"))
      .orderBy(col("n").desc, col("h"))
    events
      .groupBy(col("event_type"), expr(s"unix_micros(ts) div $hourUs").as("h"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(byType))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"), sum(col("n")).as("total"),
        sum(when(col("rk") <= 3, col("n")).otherwise(0L)).as("top3"))
      .select(col("event_type"), col("n_hours"),
        (floor(col("top3").cast("double") / col("total").cast("double")
          * 1e6 + lit(0.5)) / 1e6).as("top3_share"))
      .orderBy(col("event_type"))
  }

  /** Weekly growth accounting — the new / retained / resurrected /
    * churned user ledger (the growth-team census behind every DAU
    * chart): per (user, week) activity, a user is NEW in its first
    * week, RETAINED when also active the previous week, RESURRECTED
    * otherwise; it CHURNS in week w+1 when active in w but not w+1
    * (counted while w+1 is inside the horizon). Identity: new +
    * resurrected − churned telescopes to the active-count delta. One
    * user-keyed shuffle carries the first/lag/lead windows (per-user
    * week lists — bounded by the horizon); the ledger census is
    * weeks-sized. */
  def growthAccounting(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.core.Lineage.CutOps
    val weekUs = 7L * 86400000000L
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("week"))
    val uw = events
      .select(col("user_id"), expr(s"unix_micros(ts) div $weekUs").as("week"))
      .distinct()
    val horizon = uw.agg(max(col("week")).as("wmax"))
    // cutLineage: the ledger and churn branches both consume this frame,
    // and per-branch column pruning below the window would otherwise
    // defeat exchange reuse — two grid scans, two user exchanges (the
    // q100/q104 lesson; PlanSpec pins the single-pass shape)
    val statusd = uw
      .withColumn("first_w", min(col("week")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("prev_w", lag(col("week"), 1).over(byUser))
      .withColumn("next_w", lead(col("week"), 1).over(byUser))
      .crossJoin(broadcast(horizon))
      .cutLineage()
    val ledger = statusd.groupBy(col("week"))
      .agg(
        sum(when(col("week") === col("first_w"), 1L).otherwise(0L)).as("n_new"),
        sum(when(col("week") =!= col("first_w") &&
          col("prev_w") === col("week") - 1, 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("week") =!= col("first_w") &&
          (col("prev_w").isNull || col("prev_w") < col("week") - 1), 1L)
          .otherwise(0L)).as("n_resurrected"))
    val churn = statusd
      .filter((col("next_w").isNull || col("next_w") > col("week") + 1) &&
        col("week") + 1 <= col("wmax"))
      .groupBy((col("week") + 1).as("week"))
      .agg(count(lit(1)).as("n_churned"))
    ledger.join(churn, Seq("week"), "full_outer")
      .na.fill(0L, Seq("n_new", "n_retained", "n_resurrected", "n_churned"))
      .orderBy(col("week"))
  }

  /** Engagement inequality — the exact Gini coefficient of events per
    * user, computed from the ACTIVITY DISTRIBUTION census (events-per-
    * user level → user count), never a user-sized sort: users sharing a
    * level occupy consecutive ranks, so the rank-weighted sum telescopes
    * per level — S += c·(k·s + k(k−1)/2) with s the running rank start —
    * and G = (2S − (n+1)T) / (nT) is a floor-quantized exact rational
    * (T = total events). The distribution window is bounded by distinct
    * activity levels. Rank-weighted sums fit longs through ~10⁹ users ×
    * typical activity; beyond that, document says shard the census. */
  def engagementGini(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dist = events.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("k"))
    val w = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    dist
      .withColumn("kcum", coalesce(sum(col("k")).over(w), lit(0L)))
      .agg(
        sum(col("k")).as("n_users"),
        sum(col("c") * col("k")).as("total_events"),
        sum(col("c") * (col("k") * (col("kcum") + 1L) +
          expr("(k * (k - 1)) div 2"))).as("s"))
      .select(col("n_users"), col("total_events"),
        (floor((lit(2L) * col("s") - (col("n_users") + 1L) * col("total_events"))
          .cast("double") /
          (col("n_users") * col("total_events")).cast("double")
          * 1e6 + lit(0.5)) / 1e6).as("gini"))
  }

  /** Day-of-week-adjusted outlier days — the ops-calendar screen: each
    * day's event count against ITS weekday's exact median (Mondays
    * compare to Mondays — a quiet Sunday is not an outlier just for
    * being Sunday). Weekday by pure integer arithmetic (the q159 rule),
    * medians via the bounded bisection (7 driver rows), spike = the
    * integer test 2·n > 3·med (n > 1.5×median without a float compare).
    * One daily census; every later frame is days- or 7-sized. */
  def dowOutlierDays(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dayUs = 86400000000L
    val census = events
      .groupBy(expr(s"unix_micros(ts) div $dayUs").as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", expr("pmod(day + 4, 7)"))
    val med = Sketches.bisectQuantiles(
        census.select(col("dow").cast("string").as("g"), col("n")),
        "n", "g", Seq(0.5), scale = 1)
      .select(col("grp").cast("long").as("dow"), col("val").cast("long").as("med_dow"))
    census.join(broadcast(med), Seq("dow"))
      .select(col("day"), col("dow"), col("n"), col("med_dow"),
        (col("n") * 2 > col("med_dow") * 3).as("spike"))
      .orderBy(col("day"))
  }

  /** Period revenue decomposition — the "was it volume or price" ledger:
    * per 30-day period, ΔR split into a volume effect ΔQ·p̄_prev and a
    * price effect Δp̄·Q, which telescope to ΔR exactly in real
    * arithmetic (both engines evaluate the identical IEEE dag; outputs
    * floor-quantized to whole cents). Quantity and revenue are exact
    * longs from per-row cents quantization; the lag window runs over the
    * period census. */
  def revenueDecomposition(lineitem: org.apache.spark.sql.DataFrame,
      orders: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayUs = 86400000000L
    val w = Window.orderBy(col("period"))
    val cells = lineitem
      .select(col("l_orderkey"),
        floor(col("l_quantity") + lit(0.5)).cast("long").as("qty"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100
          + lit(0.5)).cast("long").as("cents"))
      .join(orders.select(col("o_orderkey"),
        expr(s"unix_micros(cast(o_orderdate as timestamp)) div ${dayUs * 30}")
          .as("period")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("period"))
      .agg(sum(col("qty")).as("qty"), sum(col("cents")).as("rev_cents"))
    val pbar = col("rev_cents").cast("double") / col("qty").cast("double")
    val pbarP = col("rev_p").cast("double") / col("qty_p").cast("double")
    cells
      .withColumn("qty_p", lag(col("qty"), 1).over(w))
      .withColumn("rev_p", lag(col("rev_cents"), 1).over(w))
      .select(col("period"), col("qty"), col("rev_cents"),
        (col("rev_cents") - col("rev_p")).as("d_rev_cents"),
        floor((col("qty") - col("qty_p")).cast("double") * pbarP + lit(0.5))
          .cast("long").as("vol_effect_cents"),
        floor((pbar - pbarP) * col("qty").cast("double") + lit(0.5))
          .cast("long").as("price_effect_cents"))
      .orderBy(col("period"))
  }

  /** Touch-recency coverage — the attribution-window sizing curve: for
    * each purchase, the age of the LAST preceding touch (the q167
    * running-last fold — an incremental O(1)-state frame, never a touch
    * list), bucketed into horizon bands. The band census answers "what
    * share of conversions would a 1-hour / 1-day / 7-day window
    * capture" BEFORE committing to an attribution horizon. One user
    * exchange; the census is 4 rows. */
  def touchCoverage(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourUs = 3600000000L
    val dayUs = 86400000000L
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val aged = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
      .withColumn("last_tt", last(
        when(col("event_type") =!= "purchase", col("t")), ignoreNulls = true)
        .over(byUser))
      .filter(col("event_type") === "purchase")
      .select(
        when(col("last_tt").isNull, "no_touch")
          .when(col("t") - col("last_tt") <= hourUs, "within_1h")
          .when(col("t") - col("last_tt") <= dayUs, "within_1d")
          .when(col("t") - col("last_tt") <= 7 * dayUs, "within_7d")
          .otherwise("older").as("band"))
    val census = aged.groupBy(col("band")).agg(count(lit(1)).as("n_purchases"))
    val tot = census.agg(sum(col("n_purchases")).as("n_tot"))
    census.crossJoin(broadcast(tot))
      .select(col("band"), col("n_purchases"),
        (floor(col("n_purchases").cast("double") / col("n_tot").cast("double")
          * 1e6 + lit(0.5)) / 1e6).as("share"))
      .orderBy(col("band"))
  }

  /** Conversion by engagement decile — "does activity predict buying":
    * users bucketed by GLOBAL activity deciles (exact k-th order
    * statistics on the per-user event count, bounded bisection — nine
    * driver longs as literals, the q195 shape), then per-decile buyer
    * share. Ties collapse deciles honestly: a decile whose cutoff
    * equals the next holds no users rather than splitting a tied count
    * arbitrarily. One user-keyed census; everything after is ≤ 10
    * rows. */
  def conversionByDecile(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.core.Lineage.CutOps
    val users = events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("bought"))
      .cutLineage()
    val cuts = Sketches.bisectQuantiles(
        users.select(lit("all").as("g"), col("n_events")),
        "n_events", "g", (1 to 9).map(_ / 10.0), scale = 1)
      .collect().sortBy(_.getDouble(1)).map(_.getDouble(2).toLong)
    val decile = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(col("n_events") > lit(c), 1).otherwise(0)
    }
    val census = users
      .select(decile.cast("long").as("decile"), col("bought"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("bought")).as("n_buyers"))
    census
      .select(col("decile"), col("n_users"), col("n_buyers"),
        (floor(col("n_buyers").cast("double") / col("n_users").cast("double")
          * 1e6 + lit(0.5)) / 1e6).as("conversion"))
      .orderBy(col("decile"))
  }

  /** q217 oracle: the q118 census row-normalized, then `steps` absorption
    * rounds as MATERIALIZED CTEs. */
  private def absorptionOracle(steps: Int): String = {
    def round(k: Int): String =
      s"""v$k AS MATERIALIZED (
         |  SELECT ty.t,
         |    CASE WHEN ty.t = 'purchase' THEN CAST(1.0 AS DOUBLE)
         |         ELSE coalesce(f.s, CAST(0.0 AS DOUBLE)) END AS p_abs
         |  FROM ty LEFT JOIN (
         |    SELECT pm.t, sum(pm.p * v${k - 1}.p_abs) AS s
         |    FROM pm JOIN v${k - 1} ON v${k - 1}.t = pm.next
         |    GROUP BY 1) f ON f.t = ty.t)""".stripMargin
    s"""WITH ev AS (
       |  SELECT user_id, event_type,
       |    epoch_us(CAST(ts AS TIMESTAMP)) AS t, event_id
       |  FROM events),
       |l AS (
       |  SELECT event_type,
       |    lag(event_type) OVER (PARTITION BY user_id ORDER BY t, event_id)
       |      AS prev
       |  FROM ev),
       |c AS (
       |  SELECT prev, event_type, count(*) AS n
       |  FROM l WHERE prev IS NOT NULL GROUP BY 1, 2),
       |pm AS MATERIALIZED (
       |  SELECT prev AS t, event_type AS next,
       |    n / sum(n) OVER (PARTITION BY prev) AS p
       |  FROM c),
       |ty AS MATERIALIZED (SELECT DISTINCT event_type AS t FROM events),
       |v0 AS MATERIALIZED (
       |  SELECT t, CASE WHEN t = 'purchase' THEN CAST(1.0 AS DOUBLE)
       |            ELSE CAST(0.0 AS DOUBLE) END AS p_abs
       |  FROM ty),""".stripMargin +
      (1 to steps).map(round).mkString(",") + s"""
       |SELECT t AS event_type, round(p_abs, 6) AS p_absorb
       |FROM v$steps ORDER BY event_type""".stripMargin
  }

  /** k-step purchase absorption — the q118 transition matrix put to
    * work: starting from each event type, the probability of reaching a
    * purchase within `steps` transitions, with purchase absorbing.
    * v₀ = 1_{purchase}; vₖ₊₁(t) = Σ_next P(t→next)·vₖ(next), purchase
    * pinned to 1. Every iteration is a ≤|types|²-row broadcast join +
    * partial agg, lineage-cut per round (the iterative-census contract —
    * q97/q145); types with no outgoing transitions keep their v₀ (no
    * mass to move). Sums are short noise-dominated double dags →
    * round(6) on output (the q97 rule, not the floor grid). */
  def purchaseAbsorption(events: org.apache.spark.sql.DataFrame,
      steps: Int = 4): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.core.Lineage.CutOps
    require(steps >= 1 && steps <= 16, s"bad steps=$steps")
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    val pm = events
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("prev"))).cast("double"))
      .select(col("prev").as("t"), col("event_type").as("next"), col("p"))
      .cutLineage()
    val types = events.select(col("event_type").as("t")).distinct().cutLineage()
    var v = types.select(col("t"),
      when(col("t") === "purchase", 1.0).otherwise(0.0).as("p_abs"))
      .cutLineage()
    var k = 0
    while (k < steps) {
      val folded = pm
        .join(v.select(col("t").as("next"), col("p_abs").as("vp")), Seq("next"))
        .groupBy(col("t")).agg(sum(col("p") * col("vp")).as("s"))
      val next = types.join(broadcast(folded), Seq("t"), "left")
        .select(col("t"),
          when(col("t") === "purchase", 1.0)
            .otherwise(coalesce(col("s"), lit(0.0))).as("p_abs"))
        .cutLineage()
      // next is materialized (eager cut) → round k's blocks are dead. This
      // loop ran 4 rounds per call WITHOUT releasing, piling ~7 handles per
      // bench attempt on already-dead blocks (the r10 driver artifact's
      // 39–42 live-RDD transient at q217; bytes were flat — GC latency,
      // not a leak — but the series instrument should read 0-noise).
      graft.core.Lineage.release(v)
      v = next
      k += 1
    }
    // the returned plan reads only the final round's blocks
    graft.core.Lineage.release(pm); graft.core.Lineage.release(types)
    v.select(col("t").as("event_type"), round(col("p_abs"), 6).as("p_absorb"))
      .orderBy(col("event_type"))
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- q163: per-type value trend (grouped OLS) --------------------------
    // Slope/intercept/r2 of value against the hour offset per type; the
    // oracle replays the integer x axis and the exact moment dag.
    QueryDef(
      "q163_value_trend",
      (s, d) => valueTrend(Tables.events(s, d)),
      Some("""WITH b AS (
             |  SELECT event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h, value
             |  FROM events),
             |p AS (
             |  SELECT event_type, h - (SELECT min(h) FROM b) AS x, value AS y
             |  FROM b),
             |s AS (
             |  SELECT event_type, count(*) AS m,
             |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx,
             |    sum(y) AS sy, sum(y * y) AS syy,
             |    sum(CAST(x AS DOUBLE) * y) AS sxy
             |  FROM p GROUP BY 1)
             |SELECT event_type, CAST(m AS BIGINT) AS m,
             |  round((CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             |        / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
             |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
             |  round((sy - (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             |              / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
             |                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |              * CAST(sx AS DOUBLE)) / CAST(m AS DOUBLE), 6) AS intercept,
             |  round((CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             |        * (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             |        / nullif((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
             |                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |                 * (CAST(m AS DOUBLE) * syy - sy * sy),
             |          CAST(0.0 AS DOUBLE)), 6) AS r2
             |FROM s WHERE m >= 8 ORDER BY event_type""".stripMargin)),

    // ---- q164: chi-square independence (type x day-of-week) ----------------
    // Margins from the cell census via windows; identical IEEE terms,
    // round(6) on the noise-dominated sum.
    QueryDef(
      "q164_chi2_type_dow",
      (s, d) => chiSquareTypeDow(Tables.events(s, d)),
      Some("""WITH c AS (
             |  SELECT event_type,
             |    ((epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 + 4) % 7 + 7) % 7 AS dow,
             |    count(*) AS o
             |  FROM events GROUP BY 1, 2),
             |m AS (
             |  SELECT event_type, dow, o,
             |    sum(o) OVER (PARTITION BY event_type) AS row_t,
             |    sum(o) OVER (PARTITION BY dow) AS col_t,
             |    sum(o) OVER () AS n_tot
             |  FROM c),
             |s AS (
             |  SELECT
             |    sum((CAST(o AS DOUBLE)
             |         - CAST(row_t AS DOUBLE) * CAST(col_t AS DOUBLE) / CAST(n_tot AS DOUBLE))
             |        * (CAST(o AS DOUBLE)
             |           - CAST(row_t AS DOUBLE) * CAST(col_t AS DOUBLE) / CAST(n_tot AS DOUBLE))
             |        / (CAST(row_t AS DOUBLE) * CAST(col_t AS DOUBLE) / CAST(n_tot AS DOUBLE)))
             |      AS chi2_raw,
             |    count(DISTINCT event_type) AS n_rows,
             |    count(DISTINCT dow) AS n_cols
             |  FROM m)
             |SELECT round(chi2_raw, 6) AS chi2,
             |  CAST((n_rows - 1) * (n_cols - 1) AS BIGINT) AS dof
             |FROM s""".stripMargin)),

    // ---- q159: weekly seasonality profile ----------------------------------
    // (dow, hour) census with traffic shares; dow by integer arithmetic,
    // mirrored exactly — no calendar functions on either side.
    QueryDef(
      "q159_seasonality",
      (s, d) => seasonalityProfile(Tables.events(s, d)),
      Some("""WITH c AS (
             |  SELECT ((epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 + 4) % 7 + 7) % 7 AS dow,
             |    ((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 + 24) % 24 AS hour,
             |    count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot FROM c)
             |SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour,
             |  CAST(n AS BIGINT) AS n,
             |  floor(CAST(n AS DOUBLE) / CAST(t.n_tot AS DOUBLE) * 1e6 + 0.5) / 1e6 AS share
             |FROM c, t ORDER BY dow, hour""".stripMargin)),

    // ---- q160: A/B conversion z-test ---------------------------------------
    // user_id mod 2 split, purchase conversion, pooled-variance z; the
    // oracle replays the census and the identical IEEE dag.
    QueryDef(
      "q160_ab_ztest",
      (s, d) => abConversionZ(Tables.events(s, d)),
      Some("""WITH u AS (
             |  SELECT user_id,
             |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
             |  FROM events GROUP BY 1),
             |c AS (
             |  SELECT ((user_id % 2) + 2) % 2 AS variant,
             |    count(*) AS n, sum(conv) AS x
             |  FROM u GROUP BY 1),
             |f AS (
             |  SELECT
             |    (SELECT CAST(n AS BIGINT) FROM c WHERE variant = 0) AS n_a,
             |    (SELECT CAST(x AS BIGINT) FROM c WHERE variant = 0) AS x_a,
             |    (SELECT CAST(n AS BIGINT) FROM c WHERE variant = 1) AS n_b,
             |    (SELECT CAST(x AS BIGINT) FROM c WHERE variant = 1) AS x_b),
             |z AS (
             |  SELECT n_a, x_a, n_b, x_b,
             |    (CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
             |     - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))
             |    / nullif(sqrt(
             |        (CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
             |        * (CAST(1.0 AS DOUBLE)
             |           - CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
             |        * (CAST(1.0 AS DOUBLE) / CAST(n_a AS DOUBLE)
             |           + CAST(1.0 AS DOUBLE) / CAST(n_b AS DOUBLE))),
             |      CAST(0.0 AS DOUBLE)) AS zraw
             |  FROM f)
             |SELECT n_a, x_a, n_b, x_b,
             |  floor(zraw * 1e6 + 0.5) / 1e6 AS z,
             |  abs(zraw) > CAST(1.96 AS DOUBLE) AS significant
             |FROM z""".stripMargin)),

    // ---- q161: revenue Pareto (top-decile concentration) -------------------
    // p90 cents cutoff via bisection, then two partial aggs against the
    // broadcast threshold; the oracle replays the k-th smallest and the
    // share dag on exact integer cents.
    QueryDef(
      "q161_revenue_pareto",
      (s, d) => revenuePareto(Tables.events(s, d)),
      Some("""WITH u AS MATERIALIZED (
             |  SELECT user_id,
             |    CAST(sum(CAST(floor(value * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS mon
             |  FROM events GROUP BY 1),
             |cut AS (
             |  SELECT min(iv) AS cutoff_cents FROM (
             |    SELECT mon AS iv, row_number() OVER (ORDER BY mon) AS rk,
             |      count(*) OVER () AS n FROM u)
             |  WHERE rk = CAST(ceil(CAST(0.9 AS DOUBLE) * n) AS BIGINT)),
             |s AS (
             |  SELECT (SELECT cutoff_cents FROM cut) AS cutoff_cents,
             |    count(*) AS n_users,
             |    CAST(sum(CASE WHEN mon > (SELECT cutoff_cents FROM cut)
             |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_top,
             |    CAST(sum(mon) AS BIGINT) AS total_cents,
             |    CAST(sum(CASE WHEN mon > (SELECT cutoff_cents FROM cut)
             |                  THEN mon ELSE 0 END) AS BIGINT) AS top_cents
             |  FROM u)
             |SELECT cutoff_cents, CAST(n_users AS BIGINT) AS n_users, n_top,
             |  total_cents, top_cents,
             |  floor(CAST(top_cents AS DOUBLE) / CAST(total_cents AS DOUBLE)
             |        * 1e6 + 0.5) / 1e6 AS top_share
             |FROM s""".stripMargin)),

    // ---- q158: bounce rate by entry type -----------------------------------
    // Share of single-event sessions per session-entry type; the oracle
    // replays q54's sessionization, the rank-1 entry, and both censuses.
    QueryDef(
      "q158_bounce_rate",
      (s, d) => bounceRate(Tables.events(s, d)),
      Some("""WITH e AS (
             |  SELECT user_id, event_id, event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS t
             |  FROM events),
             |g AS (
             |  SELECT user_id, event_id, event_type, t,
             |    CASE WHEN t - lag(t, 1) OVER w IS NULL
             |           OR t - lag(t, 1) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_s
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
             |sid AS (
             |  SELECT user_id, event_id, event_type, t,
             |    sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
             |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM g),
             |r AS (
             |  SELECT user_id, session_id, event_type,
             |    row_number() OVER (PARTITION BY user_id, session_id
             |                       ORDER BY t, event_id) AS rn
             |  FROM sid),
             |sess AS (
             |  SELECT user_id, session_id, count(*) AS n_ev,
             |    max(CASE WHEN rn = 1 THEN event_type END) AS entry
             |  FROM r GROUP BY 1, 2)
             |SELECT entry, CAST(count(*) AS BIGINT) AS n_sessions,
             |  CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
             |  floor(CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             |        / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS bounce_rate
             |FROM sess GROUP BY entry ORDER BY entry""".stripMargin)),

    // ---- q157: RFM segmentation --------------------------------------------
    // High/low vs the population median on recency/frequency/monetary
    // (monetary in exact integer cents); the oracle replays the user
    // census, three k-th-smallest medians, and the 2x2x2 census.
    QueryDef(
      "q157_rfm_segments",
      (s, d) => rfmSegments(Tables.events(s, d)),
      Some("""WITH u AS (
             |  SELECT user_id, max(day) AS last_day, count(*) AS freq,
             |    CAST(sum(cents) AS BIGINT) AS mon
             |  FROM (
             |    SELECT user_id,
             |      epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
             |      CAST(floor(value * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
             |    FROM events)
             |  GROUP BY 1),
             |b AS MATERIALIZED (
             |  SELECT user_id, (SELECT max(last_day) FROM u) - last_day AS rec,
             |    freq, mon
             |  FROM u),
             |mr AS (
             |  SELECT min(iv) AS med FROM (
             |    SELECT rec AS iv, row_number() OVER (ORDER BY rec) AS rk,
             |      count(*) OVER () AS n FROM b)
             |  WHERE rk = CAST(ceil(CAST(0.5 AS DOUBLE) * n) AS BIGINT)),
             |mf AS (
             |  SELECT min(iv) AS med FROM (
             |    SELECT freq AS iv, row_number() OVER (ORDER BY freq) AS rk,
             |      count(*) OVER () AS n FROM b)
             |  WHERE rk = CAST(ceil(CAST(0.5 AS DOUBLE) * n) AS BIGINT)),
             |mm AS (
             |  SELECT min(iv) AS med FROM (
             |    SELECT mon AS iv, row_number() OVER (ORDER BY mon) AS rk,
             |      count(*) OVER () AS n FROM b)
             |  WHERE rk = CAST(ceil(CAST(0.5 AS DOUBLE) * n) AS BIGINT))
             |SELECT
             |  CAST(CASE WHEN rec > (SELECT med FROM mr) THEN 1 ELSE 0 END AS BIGINT) AS r_high,
             |  CAST(CASE WHEN freq > (SELECT med FROM mf) THEN 1 ELSE 0 END AS BIGINT) AS f_high,
             |  CAST(CASE WHEN mon > (SELECT med FROM mm) THEN 1 ELSE 0 END AS BIGINT) AS m_high,
             |  CAST(count(*) AS BIGINT) AS n_users
             |FROM b GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // ---- q156: funnel time-to-convert quantiles ----------------------------
    // p50/p90 of the signup→click and click→purchase gaps; the oracle
    // chains q112's stage CTEs into the q128 k-th-smallest selection.
    QueryDef(
      "q156_funnel_timing",
      (s, d) => funnelTimeQuantiles(Tables.events(s, d)),
      Some("""WITH ev AS (
             |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t
             |  FROM events WHERE event_type IN ('signup', 'click', 'purchase')),
             |s1 AS (
             |  SELECT user_id,
             |    min(CASE WHEN event_type = 'signup' THEN t END) AS s_t
             |  FROM ev GROUP BY user_id),
             |s2 AS (
             |  SELECT ev.user_id, s1.s_t,
             |    min(CASE WHEN event_type = 'click' AND t > s1.s_t THEN t END) AS c_t
             |  FROM ev JOIN s1 ON s1.user_id = ev.user_id GROUP BY 1, 2),
             |s3 AS MATERIALIZED (
             |  SELECT ev.user_id, s2.s_t, s2.c_t,
             |    min(CASE WHEN event_type = 'purchase' AND t > s2.c_t THEN t END) AS p_t
             |  FROM ev JOIN s2 ON s2.user_id = ev.user_id GROUP BY 1, 2, 3),
             |g AS (
             |  SELECT stage, gap FROM (
             |    SELECT 'signup_to_click' AS stage, c_t - s_t AS gap FROM s3
             |    UNION ALL
             |    SELECT 'click_to_purchase', p_t - c_t FROM s3)
             |  WHERE gap IS NOT NULL),
             |v AS (
             |  SELECT CAST(stage AS VARCHAR) AS grp,
             |    CAST(floor(gap * 1 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS iv
             |  FROM g),
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
             |SELECT grp, q, iv / CAST(1 AS DOUBLE) AS val
             |FROM sel ORDER BY grp, q""".stripMargin)),

    // ---- q149: inter-arrival gap quantiles per type ------------------------
    // Exact bounded-state p50/p90 of per-user event gaps; the oracle
    // replays the gap window and q128's k-th-smallest selection.
    QueryDef(
      "q149_gap_quantiles",
      (s, d) => gapQuantiles(Tables.events(s, d)),
      Some("""WITH e AS (
             |  SELECT user_id, event_type, event_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS t
             |  FROM events),
             |g AS (
             |  SELECT event_type,
             |    t - lag(t, 1) OVER (PARTITION BY user_id, event_type
             |                        ORDER BY t, event_id) AS gap
             |  FROM e),
             |v AS (
             |  SELECT CAST(event_type AS VARCHAR) AS grp,
             |    CAST(floor(gap * 1 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS iv
             |  FROM g WHERE gap IS NOT NULL),
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
             |SELECT grp, q, iv / CAST(1 AS DOUBLE) AS val
             |FROM sel ORDER BY grp, q""".stripMargin)),

    // ---- q143: windowed-rate lag-1 autocorrelation -------------------------
    // Pearson r over adjacent observed 10-minute censuses per type; the
    // oracle replays the census, the win+1 self-join, and the exact
    // moment-sum expression with the identical double dag.
    QueryDef(
      "q143_rate_autocorr",
      (s, d) => rateAutocorr(Tables.events(s, d)),
      Some("""WITH c AS (
             |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 600000000 AS win,
             |    event_type, count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |p AS (
             |  SELECT a.event_type, a.n AS x, b.n AS y
             |  FROM c a JOIN c b ON b.event_type = a.event_type
             |    AND b.win = a.win + 1),
             |s AS (
             |  SELECT event_type, count(*) AS m,
             |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x * x) AS BIGINT) AS sxx,
             |    CAST(sum(y * y) AS BIGINT) AS syy,
             |    CAST(sum(x * y) AS BIGINT) AS sxy
             |  FROM p GROUP BY 1)
             |SELECT event_type, CAST(m AS BIGINT) AS m,
             |  floor((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
             |         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |        / nullif(sqrt(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
             |                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |           * sqrt(CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
             |                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)),
             |          CAST(0.0 AS DOUBLE))
             |        * 1e6 + 0.5) / 1e6 AS r1
             |FROM s WHERE m >= 4 ORDER BY event_type""".stripMargin)),

    // ---- q142: discrete churn hazard ---------------------------------------
    // Right-censored lifetime census + reverse running at-risk sum; the
    // oracle replays the day grid, the censor rule, and the census.
    QueryDef(
      "q142_churn_hazard",
      (s, d) => churnHazard(Tables.events(s, d)),
      Some("""WITH e AS (
             |  SELECT user_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
             |  FROM events),
             |u AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM e GROUP BY 1),
             |h AS (SELECT max(day) AS hmax FROM e),
             |lu AS (
             |  SELECT d1 - d0 AS k,
             |    CASE WHEN d1 < (SELECT hmax FROM h) - 1 THEN 1 ELSE 0 END AS is_churn
             |  FROM u),
             |c AS (
             |  SELECT k, count(*) AS ended,
             |    CAST(sum(is_churn) AS BIGINT) AS churned
             |  FROM lu GROUP BY 1),
             |t AS (
             |  SELECT k, churned,
             |    CAST(sum(ended) OVER (ORDER BY k DESC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS at_risk
             |  FROM c)
             |SELECT CAST(k AS BIGINT) AS k, at_risk, churned,
             |  CAST(churned AS DOUBLE) / CAST(at_risk AS DOUBLE) AS hazard
             |FROM t ORDER BY k""".stripMargin)),

    // ---- q141: co-engagement lift ------------------------------------------
    // User-level association between event-type pairs; the oracle replays
    // the distinct projection, the pair census, and the exact lift chain.
    QueryDef(
      "q141_coengagement_lift",
      (s, d) => coEngagementLift(Tables.events(s, d)),
      Some("""WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
             |tot AS (SELECT count(DISTINCT user_id) AS n_users FROM ut),
             |pt AS (SELECT event_type, count(*) AS n_t FROM ut GROUP BY 1),
             |p AS (
             |  SELECT a.event_type AS type_a, b.event_type AS type_b,
             |    count(*) AS n_both
             |  FROM ut a JOIN ut b ON a.user_id = b.user_id
             |    AND a.event_type < b.event_type
             |  GROUP BY 1, 2)
             |SELECT p.type_a, p.type_b, CAST(p.n_both AS BIGINT) AS n_both,
             |  floor((CAST(p.n_both AS DOUBLE) * CAST(tot.n_users AS DOUBLE))
             |        / (CAST(pa.n_t AS DOUBLE) * CAST(pb.n_t AS DOUBLE))
             |        * 1e6 + 0.5) / 1e6 AS lift
             |FROM p
             |JOIN pt pa ON pa.event_type = p.type_a
             |JOIN pt pb ON pb.event_type = p.type_b
             |CROSS JOIN tot
             |ORDER BY p.type_a, p.type_b""".stripMargin)),

    // ---- q140: rolling active-user stickiness ------------------------------
    // 10-minute actives over 70-minute trailing actives; the oracle
    // replays the integer window grid, the membership explode, both
    // distincts, and the raw division.
    QueryDef(
      "q140_stickiness",
      (s, d) => stickiness(Tables.events(s, d)),
      Some("""WITH e AS (
             |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 600000000 AS win, user_id
             |  FROM events),
             |sau AS (SELECT win, count(DISTINCT user_id) AS n_short FROM e GROUP BY 1),
             |m AS (
             |  SELECT win + i AS lwin, user_id
             |  FROM e, unnest(range(0, 7)) AS r(i)),
             |lau AS (SELECT lwin, count(DISTINCT user_id) AS n_long FROM m GROUP BY 1)
             |SELECT CAST(sau.win * 600 AS BIGINT) AS win_start,
             |  CAST(n_short AS BIGINT) AS n_short,
             |  CAST(n_long AS BIGINT) AS n_long,
             |  CAST(n_short AS DOUBLE) / CAST(n_long AS DOUBLE) AS stickiness
             |FROM sau JOIN lau ON lau.lwin = sau.win
             |ORDER BY win_start""".stripMargin),
      // headline: the factor-fold membership explode + two-phase distinct
      // is the bench's heaviest distinct shape — watched for regressions
      headline = true),

    // ---- q134: frequent session paths --------------------------------------
    // Top-20 length-3 in-session event-type sequences; the oracle replays
    // sessionization (q54's spelling), both leads, and the census.
    QueryDef(
      "q134_session_paths",
      (s, d) => sessionPaths(Tables.events(s, d)),
      Some("""WITH e AS (
             |  SELECT user_id, event_id, event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS t
             |  FROM events),
             |g AS (
             |  SELECT user_id, event_id, event_type, t,
             |    CASE WHEN t - lag(t, 1) OVER w IS NULL
             |           OR t - lag(t, 1) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_s
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
             |sid AS (
             |  SELECT user_id, event_id, event_type, t,
             |    sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
             |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM g),
             |p AS (
             |  SELECT event_type || '>' || lead(event_type, 1) OVER w
             |           || '>' || lead(event_type, 2) OVER w AS path,
             |    lead(event_type, 2) OVER w AS l2
             |  FROM sid
             |  WINDOW w AS (PARTITION BY user_id, session_id ORDER BY t, event_id))
             |SELECT path, CAST(count(*) AS BIGINT) AS n
             |FROM p WHERE l2 IS NOT NULL
             |GROUP BY path ORDER BY n DESC, path LIMIT 20""".stripMargin)),

    // ---- q130: windowed rate-anomaly flags ---------------------------------
    // 10-minute type censuses scored against the previous 6 observed
    // windows; the oracle replays census, ROWS frame, and the sqrt-free
    // 3σ test with the identical double spelling.
    QueryDef(
      "q130_rate_anomalies",
      (s, d) => rateAnomalies(Tables.events(s, d)),
      Some("""WITH c AS (
             |  SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 600) * 600 AS BIGINT) AS win_start,
             |    event_type, count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |t AS (
             |  SELECT win_start, event_type, n,
             |    count(n) OVER w AS np, sum(n) OVER w AS s, sum(n * n) OVER w AS ss
             |  FROM c
             |  WINDOW w AS (PARTITION BY event_type ORDER BY win_start
             |               ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING))
             |SELECT win_start, event_type, CAST(n AS BIGINT) AS n,
             |  CAST(s AS DOUBLE) / CAST(np AS DOUBLE) AS mean,
             |  (CAST(n AS DOUBLE) > CAST(s AS DOUBLE) / CAST(np AS DOUBLE)
             |   AND (CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / CAST(np AS DOUBLE))
             |     * (CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / CAST(np AS DOUBLE))
             |     > 9 * (CAST(ss AS DOUBLE) / CAST(np AS DOUBLE)
             |            - (CAST(s AS DOUBLE) / CAST(np AS DOUBLE))
             |              * (CAST(s AS DOUBLE) / CAST(np AS DOUBLE)))) AS spike
             |FROM t WHERE np >= 3 ORDER BY win_start, event_type""".stripMargin)),

    // ---- q60: pivot (explicit value list — deterministic columns) ----------
    QueryDef(
      "q60_pivot",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .filter($"user_id" < 40)
          .groupBy($"user_id")
          .pivot($"event_type", Seq("click", "view", "purchase", "signup", "error"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy($"user_id")
      },
      Some("""SELECT user_id,
             |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
             |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
             |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
             |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
             |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error
             |FROM events WHERE user_id < 40
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- q61: datetime function breadth ------------------------------------
    QueryDef(
      "q61_datetime_funcs",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .filter($"o_orderkey" <= 300)
          .select($"o_orderkey",
            $"o_orderdate".cast("date").as("od"),
            date_add($"o_orderdate".cast("date"), 30).as("plus30"),
            last_day($"o_orderdate".cast("date")).as("month_end"),
            trunc($"o_orderdate".cast("date"), "month").as("month_start"),
            dayofweek($"o_orderdate").as("dow"),
            quarter($"o_orderdate").as("qtr"),
            weekofyear($"o_orderdate").as("woy"),
            datediff(lit("2000-01-01").cast("date"), $"o_orderdate".cast("date")).as("days_to_y2k"))
          .orderBy($"o_orderkey")
      },
      // Spark dayofweek: 1=Sunday; DuckDB dayofweek: 0=Sunday → +1.
      // Spark weekofyear = ISO week; DuckDB weekofyear is ISO too.
      Some("""SELECT o_orderkey,
             |  CAST(o_orderdate AS DATE) AS od,
             |  CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS plus30,
             |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
             |  CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start,
             |  CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INT) AS dow,
             |  CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS qtr,
             |  CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INT) AS woy,
             |  date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k
             |FROM orders WHERE o_orderkey <= 300
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- q62: variable-edge histogram through the gate ----------------------
    QueryDef(
      "q62_variable_binning",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
        val root = Selection.root("all", $"l_quantity")
        val edges = Seq(0.0, 5.0, 10.0, 25.0, 50.0)
        HistogramPass.run(li,
            Seq(Plot("qty_varbin", $"l_quantity", root, VariableBinning(edges))))
          .select($"plot", $"bucket", $"n", round($"sumw", 2).as("sumw"))
          .orderBy($"bucket")
      },
      Some("""SELECT 'qty_varbin' AS plot,
             |  CASE WHEN l_quantity < 0.0 THEN -1
             |       WHEN l_quantity >= 0.0 AND l_quantity < 5.0 THEN 0
             |       WHEN l_quantity >= 5.0 AND l_quantity < 10.0 THEN 1
             |       WHEN l_quantity >= 10.0 AND l_quantity < 25.0 THEN 2
             |       WHEN l_quantity >= 25.0 AND l_quantity < 50.0 THEN 3
             |       ELSE 4 END AS bucket,
             |  count(*) AS n, round(sum(l_quantity), 2) AS sumw
             |FROM lineitem GROUP BY 2 ORDER BY bucket""".stripMargin)),

    // ---- q88: as-of join with tolerance ------------------------------------
    // pandas merge_asof(tolerance=...) semantics: each purchase keeps its
    // most recent preceding click ONLY if it happened within the last
    // 30 minutes; otherwise the row survives with a NULL gap (the match is
    // voided, the left row is not dropped). Same single-window shape as
    // q27 — tolerance is a post-window null-out, zero extra passes — and
    // the gap stays integer-µs so no float formulation can diverge.
    QueryDef(
      "q88_asof_tolerance",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val tolUs = 30L * 60 * 1000000
        val ev = Tables.events(s, d)
          .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("t"))
          .filter($"event_type".isin("purchase", "click"))
        val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.withColumn("last_click_t",
            last(when($"event_type" === "click", $"t"), ignoreNulls = true).over(w))
          .filter($"event_type" === "purchase")
          .select($"user_id", $"event_id",
            when($"t" - $"last_click_t" <= tolUs, $"t" - $"last_click_t")
              .as("us_since_click"))
          .orderBy($"user_id", $"event_id")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_id, event_type,
             |         epoch_us(CAST(ts AS TIMESTAMP)) AS t
             |  FROM events WHERE event_type IN ('purchase', 'click')),
             |m AS (
             |  SELECT user_id, event_id, event_type, t,
             |    last_value(CASE WHEN event_type = 'click' THEN t END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY t, event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_t
             |  FROM ev)
             |SELECT user_id, event_id,
             |  CASE WHEN t - last_click_t <= 1800000000 THEN t - last_click_t END
             |    AS us_since_click
             |FROM m WHERE event_type = 'purchase'
             |ORDER BY user_id, event_id""".stripMargin)),

    // ---- q111: retention cohorts (the product-analytics staple) ------------
    // cohort = each user's first active day; cell (cohort_day, offset) =
    // distinct users from that cohort active offset days later. Day index
    // is integer µs div — integer end to end, no timestamp output, per the
    // time-arithmetic rule. Shape at 100 TB: one distinct (user, day)
    // shuffle; the cohort assignment is a window min over the SAME
    // user-partitioned stream (no second groupBy-join subtree — the q104
    // exchange-reuse lesson), and the cell census partial-aggregates.
    QueryDef(
      "q111_retention_cohorts",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val days = Tables.events(s, d)
          .select($"user_id", expr("unix_micros(ts) div 86400000000").as("day"))
          .distinct()
        val withCohort = days.withColumn("cohort_day",
          min($"day").over(Window.partitionBy($"user_id")))
        withCohort
          .groupBy($"cohort_day", ($"day" - $"cohort_day").as("offset_days"))
          .agg(count(lit(1)).as("n_users")) // (user, day) is distinct already
          .orderBy($"cohort_day", $"offset_days")
      },
      Some("""WITH days AS (
             |  SELECT DISTINCT user_id,
             |    CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS BIGINT) AS day
             |  FROM events),
             |c AS (
             |  SELECT user_id, day,
             |    min(day) OVER (PARTITION BY user_id) AS cohort_day
             |  FROM days)
             |SELECT CAST(cohort_day AS BIGINT) AS cohort_day,
             |  CAST(day - cohort_day AS BIGINT) AS offset_days,
             |  CAST(count(*) AS BIGINT) AS n_users
             |FROM c GROUP BY 1, 2 ORDER BY cohort_day, offset_days""".stripMargin)),

    // ---- q112: strictly-ordered conversion funnel --------------------------
    // signup → first click AFTER it → first purchase AFTER that, per user;
    // output is the stage census. Each stage needs the previous stage's
    // timestamp, so a join formulation consumes the event stream once per
    // stage (audited: 3 corpus lineages); instead ONE groupBy collects
    // each user's (t, type) events time-sorted and a row-local fold walks
    // them — the first qualifying event in ascending t IS the stage's
    // min. At 100 TB: one scan, one user_id shuffle, per-user state
    // bounded by that user's activity (the q64/mapGroups contract); all
    // times integer µs.
    QueryDef(
      "q112_funnel",
      (s, d) => funnelTimes(Tables.events(s, d))
        .agg(count(col("f.s_t")).as("n_signup"),
          count(col("f.c_t")).as("n_click_after"),
          count(col("f.p_t")).as("n_purchase_after")),
      Some("""WITH ev AS (
             |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t
             |  FROM events WHERE event_type IN ('signup', 'click', 'purchase')),
             |s1 AS (
             |  SELECT user_id,
             |    min(CASE WHEN event_type = 'signup' THEN t END) AS s_t
             |  FROM ev GROUP BY user_id),
             |s2 AS (
             |  SELECT ev.user_id, s1.s_t,
             |    min(CASE WHEN event_type = 'click' AND t > s1.s_t THEN t END) AS c_t
             |  FROM ev JOIN s1 ON s1.user_id = ev.user_id GROUP BY 1, 2),
             |s3 AS (
             |  SELECT ev.user_id, s2.s_t, s2.c_t,
             |    min(CASE WHEN event_type = 'purchase' AND t > s2.c_t THEN t END) AS p_t
             |  FROM ev JOIN s2 ON s2.user_id = ev.user_id GROUP BY 1, 2, 3)
             |SELECT CAST(count(s_t) AS BIGINT) AS n_signup,
             |  CAST(count(c_t) AS BIGINT) AS n_click_after,
             |  CAST(count(p_t) AS BIGINT) AS n_purchase_after
             |FROM s3""".stripMargin)),

    // ---- q118: event-type transition matrix (first-order Markov census) ----
    // P(next | prev) over each user's time-ordered event stream — the
    // behavioral-model census (and the q54/q112 family's generalization to
    // ALL type pairs). One user_id shuffle feeds the lag window; the pair
    // census partial-aggregates; the per-prev normalizer is a window over
    // the ≤ |types|² census rows, not the corpus. p is a division of
    // identical integer counts → floor-quantized per the pure-rational
    // rule.
    QueryDef(
      "q118_event_transitions",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
        val census = Tables.events(s, d)
          .select($"user_id", $"event_type",
            unix_micros($"ts").as("t"), $"event_id")
          .withColumn("prev", lag($"event_type", 1).over(w))
          .filter($"prev".isNotNull)
          .groupBy($"prev", $"event_type")
          .agg(count(lit(1)).as("n"))
        census
          .withColumn("p", floor($"n" / sum($"n").over(
            Window.partitionBy($"prev")) * 1e6 + 0.5) / 1e6)
          .orderBy($"prev", $"event_type")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS t, event_id
             |  FROM events),
             |l AS (
             |  SELECT user_id, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id ORDER BY t, event_id) AS prev
             |  FROM ev),
             |c AS (
             |  SELECT prev, event_type, count(*) AS n
             |  FROM l WHERE prev IS NOT NULL GROUP BY prev, event_type)
             |SELECT prev, event_type, CAST(n AS BIGINT) AS n,
             |  floor(n / sum(n) OVER (PARTITION BY prev) * 1e6 + 0.5) / 1e6 AS p
             |FROM c ORDER BY prev, event_type""".stripMargin)),

    // ---- q122: time-decayed engagement (freshness-weighted activity) -------
    // Recency-weighted per-user activity — the freshness signal ranking
    // and sampling policies use (recent behavior outweighs stale). Decay
    // is HALVING PER DAY of age, computed as 1 / (1 << age_days): pure
    // integer shift + exact IEEE division by a power of two — bit-equal
    // cross-engine with no pow()/exp() in sight (a library exp is not
    // contractual). Reference time = max event time (a one-row broadcast,
    // so the query is self-contained and deterministic); ages ≥ 63 clamp
    // to weight 0 (shift overflow guard — and 2⁻⁶³ is beyond double
    // noise anyway). One scan, one user_id partial-agg shuffle; the
    // weighted sum rounds at 6 (noise-dominated cross-row aggregate).
    QueryDef(
      "q122_decayed_engagement",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"user_id", $"value", unix_micros($"ts").as("t"))
        val ref = ev.agg(max($"t").as("t_ref"))
        // SQL form: the Scala shiftleft() overload takes only a literal
        // shift amount, the SQL function accepts a column
        val age = expr("(t_ref - t) div 86400000000")
        val w = when(age >= 63, lit(0.0))
          .otherwise(lit(1.0) /
            expr("shiftleft(1L, cast((t_ref - t) div 86400000000 as int))"))
        ev.crossJoin(broadcast(ref))
          .select($"user_id", ($"value" * w).as("dv"))
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_events"), round(sum($"dv"), 6).as("score"))
          .orderBy($"user_id")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS t
             |  FROM events),
             |ref AS (SELECT max(t) AS t_ref FROM ev),
             |wv AS (
             |  SELECT user_id,
             |    value * (CASE WHEN (t_ref - t) // 86400000000 >= 63 THEN 0.0
             |                  ELSE 1.0 / (1::BIGINT << CAST((t_ref - t) // 86400000000 AS INT))
             |             END) AS dv
             |  FROM ev, ref)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |  round(sum(dv), 6) AS score
             |FROM wv GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- q166: robust outlier census (median/MAD) --------------------------
    // Per-type median and MAD from exact integer cents via k-th-smallest
    // bisection; the flag is a pure integer comparison. The oracle
    // replays both order statistics and the census.
    QueryDef(
      "q166_robust_outliers",
      (s, d) => robustOutliers(Tables.events(s, d)),
      Some("""WITH base AS MATERIALIZED (
             |  SELECT event_type,
             |    CAST(floor(value * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
             |  FROM events),
             |med AS (
             |  SELECT event_type, min(iv) AS med_cents FROM (
             |    SELECT event_type, cents AS iv,
             |      row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rk,
             |      count(*) OVER (PARTITION BY event_type) AS n
             |    FROM base)
             |  WHERE rk = CAST(ceil(CAST(0.5 AS DOUBLE) * n) AS BIGINT)
             |  GROUP BY 1),
             |dev AS MATERIALIZED (
             |  SELECT b.event_type, m.med_cents, abs(b.cents - m.med_cents) AS dev
             |  FROM base b JOIN med m USING (event_type)),
             |mad AS (
             |  SELECT event_type, min(iv) AS mad_cents FROM (
             |    SELECT event_type, dev AS iv,
             |      row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rk,
             |      count(*) OVER (PARTITION BY event_type) AS n
             |    FROM dev)
             |  WHERE rk = CAST(ceil(CAST(0.5 AS DOUBLE) * n) AS BIGINT)
             |  GROUP BY 1)
             |SELECT d.event_type, CAST(d.med_cents AS BIGINT) AS med_cents,
             |  CAST(a.mad_cents AS BIGINT) AS mad_cents,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN d.dev > 3 * a.mad_cents THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_outliers,
             |  floor(CAST(sum(CASE WHEN d.dev > 3 * a.mad_cents THEN 1 ELSE 0 END)
             |          AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) / 1e6
             |    AS outlier_rate
             |FROM dev d JOIN mad a USING (event_type)
             |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin)),

    // ---- q167: last-touch attribution --------------------------------------
    // Purchases credited to the latest preceding non-purchase touch
    // within 7 days; the oracle replays the running-last window (same
    // (t, event_id) total order) and the census.
    QueryDef(
      "q167_last_touch_attribution",
      (s, d) => lastTouchAttribution(Tables.events(s, d)),
      Some("""WITH ev AS (
             |  SELECT user_id, event_id, event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS t
             |  FROM events),
             |tr AS (
             |  SELECT event_type, t,
             |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
             |      IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t, event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_type,
             |    last_value(CASE WHEN event_type <> 'purchase' THEN t END
             |      IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t, event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_t
             |  FROM ev),
             |att AS (
             |  SELECT CASE WHEN touch_t IS NOT NULL
             |                AND t - touch_t <= 604800000000 THEN touch_type
             |              ELSE 'none' END AS touch
             |  FROM tr WHERE event_type = 'purchase'),
             |c AS (SELECT touch, count(*) AS n_purchases FROM att GROUP BY 1)
             |SELECT touch, CAST(n_purchases AS BIGINT) AS n_purchases,
             |  floor(CAST(n_purchases AS DOUBLE) /
             |        CAST((SELECT sum(n_purchases) FROM c) AS DOUBLE) * 1e6 + 0.5)
             |    / 1e6 AS share
             |FROM c ORDER BY touch""".stripMargin)),

    // ---- q174: value-distribution drift between time halves ----------------
    // Shared per-type quartile bins, (type, half, bucket) census, TV with
    // an integer-exact numerator; the oracle replays edges (k-th
    // smallest), the integer bucket grid, and the same single division.
    QueryDef(
      "q174_value_drift",
      (s, d) => valueDrift(Tables.events(s, d)),
      Some("""WITH base AS MATERIALIZED (
             |  SELECT event_type,
             |    CAST(floor(value * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS t
             |  FROM events),
             |rng AS (SELECT min(t) AS t0, max(t) AS t1 FROM base),
             |rk AS (
             |  SELECT event_type, cents AS iv,
             |    row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rk,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM base),
             |qs AS (SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
             |                      CAST(0.75 AS DOUBLE)]) AS q),
             |sel AS (
             |  SELECT rk.event_type, qs.q, min(rk.iv) AS iv
             |  FROM rk, qs
             |  WHERE rk.rk = CAST(ceil(qs.q * rk.n) AS BIGINT)
             |  GROUP BY 1, 2),
             |ed AS (
             |  SELECT event_type,
             |    max(CASE WHEN q = CAST(0.25 AS DOUBLE) THEN iv END) AS e25,
             |    max(CASE WHEN q = CAST(0.5 AS DOUBLE) THEN iv END) AS e50,
             |    max(CASE WHEN q = CAST(0.75 AS DOUBLE) THEN iv END) AS e75
             |  FROM sel GROUP BY 1),
             |census AS MATERIALIZED (
             |  SELECT b.event_type,
             |    CASE WHEN b.t <= rng.t0 + (rng.t1 - rng.t0) // 2
             |         THEN 0 ELSE 1 END AS half,
             |    (CASE WHEN b.cents > ed.e25 THEN 1 ELSE 0 END +
             |     CASE WHEN b.cents > ed.e50 THEN 1 ELSE 0 END +
             |     CASE WHEN b.cents > ed.e75 THEN 1 ELSE 0 END) AS bucket,
             |    count(*) AS n
             |  FROM base b, rng
             |  JOIN ed ON ed.event_type = b.event_type
             |  GROUP BY 1, 2, 3),
             |cells AS (
             |  SELECT coalesce(a.event_type, b.event_type) AS event_type,
             |    coalesce(a.n, 0) AS na, coalesce(b.n, 0) AS nb
             |  FROM (SELECT event_type, bucket, n FROM census WHERE half = 0) a
             |  FULL OUTER JOIN
             |       (SELECT event_type, bucket, n FROM census WHERE half = 1) b
             |    ON a.event_type = b.event_type AND a.bucket = b.bucket),
             |tots AS (
             |  SELECT event_type,
             |    CAST(sum(CASE WHEN half = 0 THEN n ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(sum(CASE WHEN half = 1 THEN n ELSE 0 END) AS BIGINT) AS n_b
             |  FROM census GROUP BY 1)
             |SELECT c.event_type, t.n_a, t.n_b,
             |  floor(CAST(sum(abs(c.na * t.n_b - c.nb * t.n_a)) AS DOUBLE) /
             |        nullif(CAST(2 AS DOUBLE) * CAST(t.n_a AS DOUBLE)
             |               * CAST(t.n_b AS DOUBLE), CAST(0 AS DOUBLE))
             |        * 1e6 + 0.5) / 1e6 AS tv
             |FROM cells c JOIN tots t USING (event_type)
             |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin)),

    // ---- q175: week-over-week growth per type ------------------------------
    // Integer week grid, census lag window, contiguity-gated growth; the
    // oracle replays the grid, the lag, and the quantized rational.
    QueryDef(
      "q175_wow_growth",
      (s, d) => weeklyGrowth(Tables.events(s, d)),
      Some("""WITH c AS (
             |  SELECT event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS week,
             |    count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |l AS (
             |  SELECT event_type, week, n,
             |    lag(week) OVER (PARTITION BY event_type ORDER BY week) AS pw,
             |    lag(n) OVER (PARTITION BY event_type ORDER BY week) AS pn
             |  FROM c)
             |SELECT event_type, week, CAST(n AS BIGINT) AS n,
             |  CASE WHEN pw = week - 1 THEN
             |    floor(CAST(n - pn AS DOUBLE) / CAST(pn AS DOUBLE) * 1e6 + 0.5)
             |      / 1e6
             |  END AS wow_growth
             |FROM l ORDER BY event_type, week""".stripMargin)),

    // ---- q178: multi-touch attribution (integer micro-credits) ------------
    // Even split across in-window touches with the remainder on the last
    // touch — per-purchase credit conserves exactly; the oracle replays
    // the ordered touch-list window, the split, and the census.
    QueryDef(
      "q178_multitouch_attribution",
      (s, d) => multiTouchAttribution(Tables.events(s, d)),
      Some("""WITH ev AS (
             |  SELECT user_id, event_id, event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS t
             |  FROM events),
             |tr AS (
             |  SELECT event_type, t,
             |    list(CASE WHEN event_type <> 'purchase'
             |              THEN {'tt': t, 'tid': event_id, 'ty': event_type} END)
             |      OVER (PARTITION BY user_id ORDER BY t
             |            RANGE BETWEEN 604800000000 PRECEDING
             |                  AND 1 PRECEDING) AS tl0
             |  FROM ev),
             |p AS (
             |  SELECT t, list_filter(coalesce(tl0, []), x -> x IS NOT NULL) AS tl2
             |  FROM tr WHERE event_type = 'purchase'),
             |p2 AS (
             |  SELECT t, tl2, list_aggregate(list_transform(tl2,
             |    x -> {'tt': x.tt, 'tid': x.tid}), 'max') AS mx
             |  FROM p),
             |cr AS (
             |  SELECT tl2[i].ty AS touch,
             |    1000000 // len(tl2) +
             |      CASE WHEN tl2[i].tt = mx.tt AND tl2[i].tid = mx.tid
             |           THEN 1000000 % len(tl2) ELSE 0 END
             |      AS credit
             |  FROM p2, unnest(range(1, len(tl2) + 1)) AS r(i)
             |  WHERE len(tl2) > 0
             |  UNION ALL
             |  SELECT 'none', 1000000 FROM p2 WHERE len(tl2) = 0),
             |c AS (SELECT touch, CAST(sum(credit) AS BIGINT) AS credit_micro
             |      FROM cr GROUP BY 1)
             |SELECT touch, credit_micro,
             |  floor(CAST(credit_micro AS DOUBLE) /
             |        CAST((SELECT sum(credit_micro) FROM c) AS DOUBLE)
             |        * 1e6 + 0.5) / 1e6 AS share
             |FROM c ORDER BY touch""".stripMargin),
      // headline: the r8 RANGE-frame rewrite is the flagship attribution
      // shape — regression-visible at bench SF from now on
      headline = true),

    // ---- q179: per-user engagement diversity (Gini-Simpson) ----------------
    // Integer-exact numerator (n² − Σnᵢ²) over n², one IEEE division; the
    // oracle replays both censuses and the same rational.
    QueryDef(
      "q179_user_diversity",
      (s, d) => userDiversity(Tables.events(s, d)),
      Some("""WITH c AS (
             |  SELECT user_id, event_type, count(*) AS ni
             |  FROM events GROUP BY 1, 2),
             |u AS (
             |  SELECT user_id, CAST(sum(ni) AS BIGINT) AS n_events,
             |    CAST(count(*) AS BIGINT) AS n_types,
             |    CAST(sum(ni * ni) AS BIGINT) AS ss
             |  FROM c GROUP BY 1)
             |SELECT user_id, n_events, n_types,
             |  floor(CAST(n_events * n_events - ss AS DOUBLE) /
             |        CAST(n_events * n_events AS DOUBLE) * 1e6 + 0.5) / 1e6
             |    AS diversity
             |FROM u ORDER BY user_id""".stripMargin)),

    // ---- q180: time-decay attribution (exact halving weights) --------------
    // W = 2^(window - age_days) per touch, micro-credits split ∝ W with
    // the remainder on the last touch; the oracle replays the list
    // window, the shift weights, both folds, and the census.
    QueryDef(
      "q180_decay_attribution",
      (s, d) => timeDecayAttribution(Tables.events(s, d)),
      Some("""WITH ev AS (
             |  SELECT user_id, event_id, event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS t
             |  FROM events),
             |tr AS (
             |  SELECT event_type, t,
             |    list(CASE WHEN event_type <> 'purchase'
             |              THEN {'tt': t, 'tid': event_id, 'ty': event_type} END)
             |      OVER (PARTITION BY user_id ORDER BY t
             |            RANGE BETWEEN 604800000000 PRECEDING
             |                  AND 1 PRECEDING) AS tl0
             |  FROM ev),
             |p1 AS (
             |  SELECT t, list_filter(coalesce(tl0, []), x -> x IS NOT NULL) AS tl2
             |  FROM tr WHERE event_type = 'purchase'),
             |p2 AS (
             |  SELECT t, tl2,
             |    list_aggregate(list_transform(tl2,
             |      x -> {'tt': x.tt, 'tid': x.tid}), 'max') AS mx,
             |    list_sum(list_transform(tl2, x -> CAST(1 AS BIGINT) <<
             |      CAST(7 - (t - x.tt) // 86400000000 AS INT))) AS sw
             |  FROM p1),
             |p3 AS (
             |  SELECT t, tl2, mx, sw,
             |    1000000 - list_sum(list_transform(tl2,
             |      x -> (1000000 * (CAST(1 AS BIGINT) <<
             |        CAST(7 - (t - x.tt) // 86400000000 AS INT))) // sw)) AS rem
             |  FROM p2),
             |cr AS (
             |  SELECT tl2[i].ty AS touch,
             |    (1000000 * (CAST(1 AS BIGINT) <<
             |       CAST(7 - (t - tl2[i].tt) // 86400000000 AS INT))) // sw +
             |      CASE WHEN tl2[i].tt = mx.tt AND tl2[i].tid = mx.tid
             |           THEN rem ELSE 0 END AS credit
             |  FROM p3, unnest(range(1, len(tl2) + 1)) AS r(i)
             |  WHERE len(tl2) > 0
             |  UNION ALL
             |  SELECT 'none', 1000000 FROM p3 WHERE len(tl2) = 0),
             |c AS (SELECT touch, CAST(sum(credit) AS BIGINT) AS credit_micro
             |      FROM cr GROUP BY 1)
             |SELECT touch, credit_micro,
             |  floor(CAST(credit_micro AS DOUBLE) /
             |        CAST((SELECT sum(credit_micro) FROM c) AS DOUBLE)
             |        * 1e6 + 0.5) / 1e6 AS share
             |FROM c ORDER BY touch""".stripMargin)),

    // ---- q184: cohort lifetime-value curves --------------------------------
    // First-active-week cohorts, integer-cents spend grid, census running
    // sum, integer-division per-user LTV; the oracle replays every stage.
    QueryDef(
      "q184_cohort_ltv",
      (s, d) => cohortLtv(Tables.events(s, d)),
      Some("""WITH base AS MATERIALIZED (
             |  SELECT user_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS week,
             |    CAST(floor(value * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
             |  FROM events),
             |co AS (SELECT user_id, min(week) AS cohort FROM base GROUP BY 1),
             |sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_users
             |       FROM co GROUP BY 1),
             |cells AS (
             |  SELECT co.cohort, b.week - co.cohort AS age,
             |    CAST(sum(b.cents) AS BIGINT) AS week_cents
             |  FROM base b JOIN co ON co.user_id = b.user_id
             |  GROUP BY 1, 2),
             |cum AS (
             |  SELECT cohort, age, week_cents,
             |    CAST(sum(week_cents) OVER (PARTITION BY cohort ORDER BY age
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |      AS cum_cents
             |  FROM cells)
             |SELECT c.cohort, c.age, sz.n_users, c.week_cents, c.cum_cents,
             |  CAST(c.cum_cents // sz.n_users AS BIGINT) AS ltv_cents
             |FROM cum c JOIN sz USING (cohort)
             |ORDER BY c.cohort, c.age""".stripMargin)),

    // ---- q185: fulfillment-lag quantiles per priority ----------------------
    // Integer-day order→ship gaps through the bounded-state bisection;
    // the oracle replays the join, the day grid, and the k-th smallest.
    QueryDef(
      "q185_ship_lag_quantiles",
      (s, d) => {
        val dayUs = 86400000000L
        import graft.core.Lineage.CutOps
        val gaps = Tables.orders(s, d)
          .join(Tables.lineitem(s, d),
            col("o_orderkey") === col("l_orderkey"))
          // orderdate/shipdate ship as TIMESTAMP_NTZ parquet — cast to
          // TimestampType first (identity under the UTC session; the
          // events.ts rule from the project notes)
          .select(col("o_orderpriority"),
            expr(s"(unix_micros(cast(l_shipdate as timestamp)) - " +
              s"unix_micros(cast(o_orderdate as timestamp))) div $dayUs")
              .as("lag_days"))
          .cutLineage()
        Sketches.bisectQuantiles(gaps, "lag_days", "o_orderpriority",
          Seq(0.5, 0.9), scale = 1)
          .orderBy(col("grp"), col("q"))
      },
      Some("""WITH g AS (
             |  SELECT o.o_orderpriority AS grp,
             |    (epoch_us(CAST(l.l_shipdate AS TIMESTAMP))
             |     - epoch_us(CAST(o.o_orderdate AS TIMESTAMP))) // 86400000000
             |      AS iv
             |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
             |r AS (
             |  SELECT grp, iv,
             |    row_number() OVER (PARTITION BY grp ORDER BY iv) AS rk,
             |    count(*) OVER (PARTITION BY grp) AS n
             |  FROM g),
             |qs AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE)]) AS q),
             |sel AS (
             |  SELECT r.grp, qs.q, min(r.iv) AS iv
             |  FROM r, qs
             |  WHERE r.rk = CAST(ceil(qs.q * r.n) AS BIGINT)
             |  GROUP BY 1, 2)
             |SELECT CAST(grp AS VARCHAR) AS grp, q, iv / CAST(1 AS DOUBLE) AS val
             |FROM sel ORDER BY grp, q""".stripMargin)),

    // ---- q191: truncated EWMA hourly trend (exact halving weights) ---------
    // Per-type hourly census smoothed over an 8-hour RANGE frame with
    // 2^-j weights; the oracle replays the census, the frame, the HOF
    // fold, and the single /256 division.
    QueryDef(
      "q191_ewma_trend",
      (s, d) => ewmaTrend(Tables.events(s, d)),
      Some("""WITH cells AS (
             |  SELECT event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
             |    count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |tr AS (
             |  SELECT event_type, h, CAST(n AS BIGINT) AS n,
             |    list({'hh': h, 'n': n})
             |      OVER (PARTITION BY event_type ORDER BY h
             |            RANGE BETWEEN 7 PRECEDING AND CURRENT ROW) AS tl
             |  FROM cells)
             |SELECT event_type, h, n,
             |  CAST(list_sum(list_transform(tl,
             |    x -> x.n * (CAST(1 AS BIGINT) << CAST(7 - (h - x.hh) AS INT))))
             |    AS DOUBLE) / 256.0 AS ewma
             |FROM tr ORDER BY event_type, h""".stripMargin)),

    // ---- q192: Fano-factor burstiness audit --------------------------------
    // Var/Mean of per-hour counts over the global hour grid, integer-
    // exact numerator; the oracle replays the census, the span, and the
    // same rational.
    QueryDef(
      "q192_fano_burstiness",
      (s, d) => fanoBurstiness(Tables.events(s, d)),
      Some("""WITH cells AS (
             |  SELECT event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
             |    count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |span AS (SELECT max(h) - min(h) + 1 AS m FROM cells),
             |agg AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_active_hours,
             |    CAST(sum(c) AS BIGINT) AS sc, CAST(sum(c * c) AS BIGINT) AS scc
             |  FROM cells GROUP BY 1)
             |SELECT event_type, n_active_hours,
             |  floor(CAST((SELECT m FROM span) * scc - sc * sc AS DOUBLE) /
             |        CAST((SELECT m FROM span) * sc AS DOUBLE) * 1e6 + 0.5) / 1e6
             |    AS fano
             |FROM agg ORDER BY event_type""".stripMargin)),

    // ---- q193: CUSUM change-point scan -------------------------------------
    // Max |m1*runsum_k - k*s1| over each type's active-hour census, tie
    // to the earliest hour; the oracle replays the census, both halves,
    // the integer partial sums, and the (|T|, -h) argmax.
    QueryDef(
      "q193_cusum_changepoint",
      (s, d) => cusumChangePoint(Tables.events(s, d)),
      Some("""WITH cells AS (
             |  SELECT event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
             |    count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |rk AS (
             |  SELECT event_type, h, c,
             |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS k,
             |    sum(c) OVER (PARTITION BY event_type ORDER BY h
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runsum
             |  FROM cells),
             |fh AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
             |    (count(*) + 1) // 2 AS m1
             |  FROM rk GROUP BY 1),
             |s1 AS (
             |  SELECT rk.event_type, CAST(sum(c) AS BIGINT) AS s1
             |  FROM rk JOIN fh ON fh.event_type = rk.event_type
             |  WHERE rk.k <= fh.m1 GROUP BY 1),
             |t AS (
             |  SELECT rk.event_type, fh.n_hours, fh.m1, rk.h,
             |    abs(fh.m1 * rk.runsum - rk.k * s1.s1) AS a
             |  FROM rk JOIN fh ON fh.event_type = rk.event_type
             |          JOIN s1 ON s1.event_type = rk.event_type),
             |best AS (
             |  SELECT event_type, n_hours, m1,
             |    max({'a': a, 'nh': -h}) AS best
             |  FROM t GROUP BY 1, 2, 3)
             |SELECT event_type, n_hours, CAST(-(best.nh) AS BIGINT) AS cp_hour,
             |  floor(CAST(best.a AS DOUBLE) / CAST(m1 AS DOUBLE) * 1e6 + 0.5) / 1e6
             |    AS cusum
             |FROM best ORDER BY event_type""".stripMargin)),

    // ---- q198: customer segment migration ----------------------------------
    // Per-half (freq, monetary) quadrant labels against per-half exact
    // medians, full-outer joined per user into a migration census; the
    // oracle replays the span midpoint, per-half k-th-smallest medians,
    // the labeling, and the census.
    QueryDef(
      "q198_segment_migration",
      (s, d) => segmentMigration(Tables.events(s, d)),
      Some("""WITH base AS MATERIALIZED (
             |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
             |    CAST(floor(value * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
             |  FROM events),
             |span AS (SELECT min(day) AS dmin, max(day) AS dmax FROM base),
             |hv AS MATERIALIZED (
             |  SELECT CASE WHEN day <
             |      (SELECT (dmin + dmax + 1) // 2 FROM span) THEN '0' ELSE '1' END
             |      AS half,
             |    user_id, CAST(count(*) AS BIGINT) AS freq,
             |    CAST(sum(cents) AS BIGINT) AS mon
             |  FROM base GROUP BY 1, 2),
             |mf AS (
             |  SELECT half, min(freq) AS med_freq FROM (
             |    SELECT half, freq,
             |      row_number() OVER (PARTITION BY half ORDER BY freq) AS rk,
             |      count(*) OVER (PARTITION BY half) AS n
             |    FROM hv) WHERE rk = CAST(ceil(CAST(0.5 AS DOUBLE) * n) AS BIGINT)
             |  GROUP BY half),
             |mm AS (
             |  SELECT half, min(mon) AS med_mon FROM (
             |    SELECT half, mon,
             |      row_number() OVER (PARTITION BY half ORDER BY mon) AS rk,
             |      count(*) OVER (PARTITION BY half) AS n
             |    FROM hv) WHERE rk = CAST(ceil(CAST(0.5 AS DOUBLE) * n) AS BIGINT)
             |  GROUP BY half),
             |lab AS (
             |  SELECT hv.half, hv.user_id,
             |    (CASE WHEN hv.freq > mf.med_freq THEN 'F+' ELSE 'F-' END) ||
             |    (CASE WHEN hv.mon > mm.med_mon THEN 'M+' ELSE 'M-' END) AS seg
             |  FROM hv JOIN mf USING (half) JOIN mm USING (half)),
             |h0 AS (SELECT user_id, seg FROM lab WHERE half = '0'),
             |h1 AS (SELECT user_id, seg FROM lab WHERE half = '1')
             |SELECT coalesce(h0.seg, 'absent') AS seg_from,
             |  coalesce(h1.seg, 'absent') AS seg_to,
             |  CAST(count(*) AS BIGINT) AS n_users
             |FROM h0 FULL OUTER JOIN h1 USING (user_id)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- q202: cross-type rate correlation ---------------------------------
    // Pearson r per type pair over co-active hours from exact integer
    // moments; the oracle replays the census, the pair join, and the
    // moment dag.
    QueryDef(
      "q202_rate_correlation",
      (s, d) => rateCorrelation(Tables.events(s, d)),
      Some("""WITH cells AS (
             |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1, 2),
             |pr AS (
             |  SELECT a.event_type AS type_a, b.event_type AS type_b,
             |    a.n AS x, b.n AS y
             |  FROM cells a JOIN cells b ON a.h = b.h AND a.event_type < b.event_type),
             |mo AS (
             |  SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS m,
             |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
             |    CAST(sum(x * y) AS BIGINT) AS sxy
             |  FROM pr GROUP BY 1, 2 HAVING count(*) >= 3)
             |SELECT type_a, type_b, m,
             |  floor(CAST(m * sxy - sx * sy AS DOUBLE) /
             |    nullif(sqrt(CAST(m * sxx - sx * sx AS DOUBLE) *
             |                CAST(m * syy - sy * sy AS DOUBLE)), CAST(0 AS DOUBLE))
             |    * 1e6 + 0.5) / 1e6 AS r
             |FROM mo ORDER BY type_a, type_b""".stripMargin)),

    // ---- q203: peak-hour concentration -------------------------------------
    // Top-3-hour traffic share per type, rank ties to the earlier hour;
    // the oracle replays the census, the rank, and the share.
    QueryDef(
      "q203_peak_concentration",
      (s, d) => peakConcentration(Tables.events(s, d)),
      Some("""WITH cells AS (
             |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1, 2),
             |rk AS (
             |  SELECT event_type, n,
             |    row_number() OVER (PARTITION BY event_type ORDER BY n DESC, h) AS rk
             |  FROM cells)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
             |  floor(CAST(sum(CASE WHEN rk <= 3 THEN n ELSE 0 END) AS DOUBLE) /
             |        CAST(sum(n) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS top3_share
             |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q204: weekly growth accounting ------------------------------------
    // New / retained / resurrected / churned per week from per-user week
    // windows; the oracle replays the distinct grid, the three windows,
    // the churn shift, and the full-outer ledger.
    QueryDef(
      "q204_growth_accounting",
      (s, d) => growthAccounting(Tables.events(s, d)),
      Some("""WITH uw AS MATERIALIZED (
             |  SELECT DISTINCT user_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS week
             |  FROM events),
             |hz AS (SELECT max(week) AS wmax FROM uw),
             |st AS MATERIALIZED (
             |  SELECT user_id, week,
             |    min(week) OVER (PARTITION BY user_id) AS first_w,
             |    lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_w,
             |    lead(week) OVER (PARTITION BY user_id ORDER BY week) AS next_w
             |  FROM uw),
             |led AS (
             |  SELECT week,
             |    CAST(sum(CASE WHEN week = first_w THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_new,
             |    CAST(sum(CASE WHEN week != first_w AND prev_w = week - 1
             |      THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
             |    CAST(sum(CASE WHEN week != first_w
             |      AND (prev_w IS NULL OR prev_w < week - 1)
             |      THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
             |  FROM st GROUP BY 1),
             |ch AS (
             |  SELECT week + 1 AS week, CAST(count(*) AS BIGINT) AS n_churned
             |  FROM st
             |  WHERE (next_w IS NULL OR next_w > week + 1)
             |    AND week + 1 <= (SELECT wmax FROM hz)
             |  GROUP BY 1)
             |SELECT coalesce(led.week, ch.week) AS week,
             |  coalesce(n_new, 0) AS n_new,
             |  coalesce(n_retained, 0) AS n_retained,
             |  coalesce(n_resurrected, 0) AS n_resurrected,
             |  coalesce(n_churned, 0) AS n_churned
             |FROM led FULL OUTER JOIN ch ON led.week = ch.week
             |ORDER BY week""".stripMargin),
      // headline: three user-partitioned windows over the distinct grid —
      // the heaviest of the r8 analytics tier, benched at SF
      headline = true),

    // ---- q205: engagement Gini ---------------------------------------------
    // Exact Gini over events-per-user from the activity DISTRIBUTION
    // census (rank-weighted sums telescoping per level); the oracle
    // replays the two censuses, the running rank start, and the same
    // rational.
    QueryDef(
      "q205_engagement_gini",
      (s, d) => engagementGini(Tables.events(s, d)),
      Some("""WITH uc AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1),
             |dist AS (SELECT c, CAST(count(*) AS BIGINT) AS k FROM uc GROUP BY 1),
             |rked AS (
             |  SELECT c, k,
             |    coalesce(sum(k) OVER (ORDER BY c
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS kcum
             |  FROM dist),
             |agg AS (
             |  SELECT CAST(sum(k) AS BIGINT) AS n_users,
             |    CAST(sum(c * k) AS BIGINT) AS total_events,
             |    CAST(sum(c * (k * (kcum + 1) + (k * (k - 1)) // 2)) AS BIGINT) AS s
             |  FROM rked)
             |SELECT n_users, total_events,
             |  floor(CAST(2 * s - (n_users + 1) * total_events AS DOUBLE) /
             |        CAST(n_users * total_events AS DOUBLE) * 1e6 + 0.5) / 1e6
             |    AS gini
             |FROM agg""".stripMargin)),

    // ---- q206: day-of-week-adjusted outlier days ---------------------------
    // Each day vs its weekday's exact median, integer spike test; the
    // oracle computes the same per-dow order statistics by ranking.
    QueryDef(
      "q206_dow_outlier_days",
      (s, d) => dowOutlierDays(Tables.events(s, d)),
      Some("""WITH census AS (
             |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1),
             |dc AS (SELECT day, n, (day + 4) % 7 AS dow FROM census),
             |md AS (
             |  SELECT dow, min(n) AS med_dow FROM (
             |    SELECT dow, n,
             |      row_number() OVER (PARTITION BY dow ORDER BY n) AS rk,
             |      count(*) OVER (PARTITION BY dow) AS cnt
             |    FROM dc) WHERE rk = CAST(ceil(CAST(0.5 AS DOUBLE) * cnt) AS BIGINT)
             |  GROUP BY dow)
             |SELECT dc.day, dc.dow, dc.n, md.med_dow,
             |  dc.n * 2 > md.med_dow * 3 AS spike
             |FROM dc JOIN md USING (dow) ORDER BY dc.day""".stripMargin)),

    // ---- q207: period revenue decomposition --------------------------------
    // Volume vs price effects per 30-day period; the oracle replays the
    // cents census, the lag, and the identical IEEE effect dag.
    QueryDef(
      "q207_revenue_decomposition",
      (s, d) => revenueDecomposition(Tables.lineitem(s, d), Tables.orders(s, d)),
      Some("""WITH cells AS (
             |  SELECT epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) // 2592000000000
             |      AS period,
             |    CAST(sum(CAST(floor(l.l_quantity + CAST(0.5 AS DOUBLE)) AS BIGINT))
             |      AS BIGINT) AS qty,
             |    CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100
             |      + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS rev_cents
             |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
             |  GROUP BY 1),
             |lg AS (
             |  SELECT period, qty, rev_cents,
             |    lag(qty) OVER (ORDER BY period) AS qty_p,
             |    lag(rev_cents) OVER (ORDER BY period) AS rev_p
             |  FROM cells)
             |SELECT period, qty, rev_cents,
             |  rev_cents - rev_p AS d_rev_cents,
             |  CAST(floor(CAST(qty - qty_p AS DOUBLE) *
             |    (CAST(rev_p AS DOUBLE) / CAST(qty_p AS DOUBLE))
             |    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS vol_effect_cents,
             |  CAST(floor((CAST(rev_cents AS DOUBLE) / CAST(qty AS DOUBLE)
             |    - CAST(rev_p AS DOUBLE) / CAST(qty_p AS DOUBLE))
             |    * CAST(qty AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             |    AS price_effect_cents
             |FROM lg ORDER BY period""".stripMargin)),

    // ---- q209: touch-recency coverage curve --------------------------------
    // Last-touch age per purchase (running-last fold) bucketed into
    // horizon bands; the oracle replays the q167 window and the bands.
    QueryDef(
      "q209_touch_coverage",
      (s, d) => touchCoverage(Tables.events(s, d)),
      Some("""WITH ev AS (
             |  SELECT user_id, event_id, event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS t
             |  FROM events),
             |tr AS (
             |  SELECT event_type, t,
             |    last_value(CASE WHEN event_type <> 'purchase' THEN t END
             |      IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY t, event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      AS last_tt
             |  FROM ev),
             |bands AS (
             |  SELECT CASE
             |      WHEN last_tt IS NULL THEN 'no_touch'
             |      WHEN t - last_tt <= 3600000000 THEN 'within_1h'
             |      WHEN t - last_tt <= 86400000000 THEN 'within_1d'
             |      WHEN t - last_tt <= 604800000000 THEN 'within_7d'
             |      ELSE 'older' END AS band
             |  FROM tr WHERE event_type = 'purchase'),
             |census AS (
             |  SELECT band, CAST(count(*) AS BIGINT) AS n_purchases
             |  FROM bands GROUP BY 1)
             |SELECT band, n_purchases,
             |  floor(CAST(n_purchases AS DOUBLE) /
             |    CAST((SELECT sum(n_purchases) FROM census) AS DOUBLE)
             |    * 1e6 + 0.5) / 1e6 AS share
             |FROM census ORDER BY band""".stripMargin)),

    // ---- q217: k-step purchase absorption ----------------------------------
    // 4 fixed rounds of v <- P v with purchase absorbing, over the q118
    // transition census; the oracle replays the census, the row-
    // normalization, and every round as MATERIALIZED CTEs (the q145
    // inlining rule).
    QueryDef(
      "q217_purchase_absorption",
      (s, d) => purchaseAbsorption(Tables.events(s, d)),
      Some(absorptionOracle(4)),
      // headline: the iterative-census contract gains an events consumer
      headline = true),

    // ---- q212: conversion by engagement decile ------------------------------
    // Global activity deciles via the bisection (nine literals), buyer
    // share per decile; the oracle computes the same order statistics by
    // ranking and replays the strict-greater bucketing.
    QueryDef(
      "q212_conversion_by_decile",
      (s, d) => conversionByDecile(Tables.events(s, d)),
      Some("""WITH uc AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS bought
             |  FROM events GROUP BY 1),
             |r AS (
             |  SELECT n_events, row_number() OVER (ORDER BY n_events) AS rk,
             |    count(*) OVER () AS cnt
             |  FROM uc),
             |cuts AS (
             |  SELECT qq.q, min(r.n_events) AS cut
             |  FROM r, (SELECT unnest([CAST(0.1 AS DOUBLE), CAST(0.2 AS DOUBLE),
             |    CAST(0.3 AS DOUBLE), CAST(0.4 AS DOUBLE), CAST(0.5 AS DOUBLE),
             |    CAST(0.6 AS DOUBLE), CAST(0.7 AS DOUBLE), CAST(0.8 AS DOUBLE),
             |    CAST(0.9 AS DOUBLE)]) AS q) qq
             |  WHERE r.rk = CAST(ceil(qq.q * r.cnt) AS BIGINT)
             |  GROUP BY 1),
             |dec AS (
             |  SELECT (SELECT count(*) FROM cuts WHERE uc.n_events > cuts.cut)
             |      AS decile,
             |    bought
             |  FROM uc),
             |census AS (
             |  SELECT CAST(decile AS BIGINT) AS decile,
             |    CAST(count(*) AS BIGINT) AS n_users,
             |    CAST(sum(bought) AS BIGINT) AS n_buyers
             |  FROM dec GROUP BY 1)
             |SELECT decile, n_users, n_buyers,
             |  floor(CAST(n_buyers AS DOUBLE) / CAST(n_users AS DOUBLE)
             |    * 1e6 + 0.5) / 1e6 AS conversion
             |FROM census ORDER BY decile""".stripMargin)),
  )
}
