package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{QueryDef, Tables}

/** Event-log operators over `events` — the batch expressions of the
  * streaming pipeline (graft.streaming.EventStream runs the same logic
  * incrementally; StreamingSpec proves batch/stream agreement).
  *
  * Timestamp discipline for the oracle: `events.ts` is nanosecond parquet;
  * Spark reads µs-truncated TIMESTAMP, so every oracle first CASTs the
  * TIMESTAMP_NS to µs TIMESTAMP — after that, epoch arithmetic is
  * bit-identical on both engines. Window starts are emitted as epoch-second
  * BIGINTs (integer-exact) rather than raw timestamps, dodging tz/precision
  * representation differences entirely.
  */
object Streams {

  val defs: Seq[QueryDef] = Seq(

    // ---- q51: tumbling-window aggregation ----------------------------------
    QueryDef(
      "q51_window_tumbling",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy(window($"ts", "5 minutes").as("w"), $"event_type")
          .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
          .select(unix_timestamp($"w.start").as("win_start"), $"event_type", $"n", $"sum_value")
          .orderBy($"win_start", $"event_type")
      },
      Some("""SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 300) * 300 AS BIGINT) AS win_start,
             |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
             |FROM events
             |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin),
      headline = true),

    // ---- q52: sliding (hopping) windows ------------------------------------
    // 10-minute windows every 5 minutes: each event lands in exactly two
    // windows; the oracle materializes both membership assignments.
    QueryDef(
      "q52_window_sliding",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy(window($"ts", "10 minutes", "5 minutes").as("w"))
          .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
          .select(unix_timestamp($"w.start").as("win_start"), $"n", $"sum_value")
          .orderBy($"win_start")
      },
      Some("""WITH e AS (SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 300) * 300 AS BIGINT) AS slot, value FROM events),
             |m AS (
             |  SELECT slot AS win_start, value FROM e
             |  UNION ALL
             |  SELECT slot - 300 AS win_start, value FROM e)
             |SELECT win_start, count(*) AS n, round(sum(value), 2) AS sum_value
             |FROM m GROUP BY 1 ORDER BY win_start""".stripMargin)),

    // ---- q53: semi-structured JSON property extraction ---------------------
    // avg of integers is pure-rational: never round() it (tie-sensitive
    // across engines). Both sides derive avg_k from the integer-exact
    // (sum_k, n) pair with the same two IEEE ops + floor-quantization.
    QueryDef(
      "q53_json_props",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .select($"event_type", get_json_object($"props", "$.k").cast("int").as("k"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"))
          .withColumn("avg_k",
            floor($"sum_k".cast("double") / $"n".cast("double") * 1e4 + 0.5) / 1e4)
          .orderBy($"event_type")
      },
      Some("""WITH a AS (
             |  SELECT event_type, count(*) AS n,
             |    sum(CAST(json_extract_string(props, '$.k') AS INT)) AS sum_k
             |  FROM events GROUP BY event_type)
             |SELECT event_type, n, CAST(sum_k AS BIGINT) AS sum_k,
             |  floor(CAST(sum_k AS DOUBLE) / CAST(n AS DOUBLE) * 1e4 + 0.5) / 1e4 AS avg_k
             |FROM a ORDER BY event_type""".stripMargin)),

    // ---- q54: gap-based sessionization --------------------------------------
    // 30-minute inactivity gap; a gap of exactly 1800 s starts a new session
    // (matches Spark session_window's half-open [start, last+gap) semantics,
    // which StreamingSpec cross-checks). All time arithmetic is integer
    // microseconds (unix_micros / epoch_us) — no float time, no rounding —
    // and every window orders by (t, event_id) so ties can't diverge.
    QueryDef(
      "q54_sessionization",
      (s, d) => {
        import s.implicits._
        val byUser = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
        val runFrame = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sessions = Tables.events(s, d)
          .withColumn("t", unix_micros($"ts"))
          .withColumn("gap", $"t" - lag($"t", 1).over(byUser))
          .withColumn("new_s", when($"gap".isNull || $"gap" >= 1800000000L, 1).otherwise(0))
          .withColumn("session_id", sum($"new_s").over(runFrame))
          .groupBy($"user_id", $"session_id")
          .agg(count(lit(1)).as("n_ev"), (max($"t") - min($"t")).as("dur_us"))
        sessions.groupBy($"user_id")
          .agg(count(lit(1)).as("n_sessions"), sum($"n_ev").as("n_events"),
            sum($"dur_us").as("total_dur_us"))
          .orderBy($"user_id")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t
             |  FROM events),
             |g AS (
             |  SELECT user_id, event_id, t,
             |    CASE WHEN t - lag(t, 1) OVER w IS NULL
             |           OR t - lag(t, 1) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_s
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
             |sid AS (
             |  SELECT user_id, t,
             |    sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
             |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM g),
             |s AS (
             |  SELECT user_id, session_id, count(*) AS n_ev, max(t) - min(t) AS dur_us
             |  FROM sid GROUP BY 1, 2)
             |SELECT user_id, count(*) AS n_sessions, CAST(sum(n_ev) AS BIGINT) AS n_events,
             |  CAST(sum(dur_us) AS BIGINT) AS total_dur_us
             |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin),
      headline = true),

    // ---- q55: per-day top-user leaderboard (windowed rank over time bucket) --
    QueryDef(
      "q55_daily_top_users",
      (s, d) => {
        import s.implicits._
        val daily = Tables.events(s, d)
          .groupBy(date_trunc("day", $"ts").cast("date").as("day"), $"user_id")
          .agg(round(sum($"value"), 2).as("day_value"))
        val w = Window.partitionBy($"day").orderBy($"day_value".desc, $"user_id")
        daily.withColumn("rnk", row_number().over(w))
          .filter($"rnk" <= 3)
          .orderBy($"day", $"rnk")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             |    user_id, round(sum(value), 2) AS day_value
             |  FROM events GROUP BY 1, 2)
             |SELECT day, user_id, day_value,
             |  row_number() OVER (PARTITION BY day ORDER BY day_value DESC, user_id) AS rnk
             |FROM daily QUALIFY rnk <= 3 ORDER BY day, rnk""".stripMargin)),

    // ---- q106: windowed approximate-distinct registers (HLL per day) -------
    // The batch twin of EventStream.windowedDistinctUsers: daily HyperLogLog
    // register tables over user_id — ≤ m rows per window whatever the event
    // volume, mergeable by max across shards/restarts. The gate
    // value-checks the REGISTERS (integer-exact cross-engine); estimate
    // math is q103's gate-checked formula, and the per-window read path is
    // hllEstimateCorrected (n ≪ 2.5m here — linear-counting regime), whose
    // accuracy the streaming spec pins. StreamingSpec also asserts the
    // streaming register table equals this one.
    QueryDef(
      "q106_windowed_distinct",
      (s, d) => {
        import s.implicits._
        val (reg, rho) = Sketches.hllCols($"user_id", Sketches.Hll.a, Sketches.Hll.b)
        Tables.events(s, d)
          .select(window($"ts", "1 day").as("w"), reg.as("reg"), rho.as("rho"))
          .select(unix_timestamp($"w.start").as("win_start"), $"reg", $"rho")
          .groupBy($"win_start", $"reg")
          .agg(max($"rho").as("rho"))
          .orderBy($"win_start", $"reg")
      },
      Some(s"""WITH k0 AS (
             |  SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) * 86400 AS BIGINT) AS win_start,
             |    ((user_id * ${Sketches.Hll.a} + ${Sketches.Hll.b}) % ${Sketches.P} + ${Sketches.P}) % ${Sketches.P} AS h1
             |  FROM events),
             |k AS (SELECT win_start, ((h1 * h1) % ${Sketches.P}) * h1 % ${Sketches.P} AS h FROM k0),
             |zt AS (SELECT win_start, h % ${Sketches.HllM} AS reg, h // ${Sketches.HllM} AS z FROM k)
             |SELECT win_start, reg, max(${Sketches.Hll.rhoSql}) AS rho
             |FROM zt GROUP BY 1, 2
             |ORDER BY win_start, reg""".stripMargin)),
  )
}
