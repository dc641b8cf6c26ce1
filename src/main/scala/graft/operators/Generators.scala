package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{QueryDef, Tables}

/** Generator (row-producing) and temporal-correlation operators. */
object Generators {

  val defs: Seq[QueryDef] = Seq(

    // ---- q26: explode / posexplode (generator surface) ---------------------
    // Flatten embedding vectors to (vec_id, pos, value) rows and aggregate
    // back per position bucket — the lateral-view shape.
    QueryDef(
      "q26_explode_stats",
      (s, d) => {
        import s.implicits._
        Tables.embeddings(s, d)
          .filter($"vec_id" < 100)
          .select($"vec_id", posexplode($"embedding").as(Seq("pos", "v")))
          .groupBy(($"pos" % 8).as("pos_mod"))
          .agg(count(lit(1)).as("n"),
            round(sum($"v".cast("double")), 4).as("sum_v"),
            round(max($"v".cast("double")), 6).as("max_v"))
          .orderBy($"pos_mod")
      },
      // DuckDB's generate_series cannot reference lateral columns — use a
      // literal upper bound (vectors are 64-dim) guarded by len().
      Some("""WITH u AS (
             |  SELECT vec_id, g.pos - 1 AS pos, embedding[g.pos] AS v
             |  FROM embeddings CROSS JOIN generate_series(1, 4096) AS g(pos)
             |  WHERE vec_id < 100 AND g.pos <= len(embedding))
             |SELECT pos % 8 AS pos_mod, count(*) AS n,
             |  round(sum(CAST(v AS DOUBLE)), 4) AS sum_v,
             |  round(max(CAST(v AS DOUBLE)), 6) AS max_v
             |FROM u GROUP BY 1 ORDER BY pos_mod""".stripMargin)),

    // ---- q27: as-of join (temporal correlation) -----------------------------
    // For every 'purchase' event, the most recent preceding 'click' by the
    // same user — the as-of join, composed from built-ins (union + window
    // last_value over preceding rows) so it shuffles each side once on the
    // join key and never materializes a range product.
    QueryDef(
      "q27_asof_join",
      (s, d) => {
        import s.implicits._
        // integer-microsecond epochs: the gap is a BIGINT difference, so no
        // floating-point formulation can diverge between engines.
        val ev = Tables.events(s, d)
          .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("t"))
          .filter($"event_type".isin("purchase", "click"))
        val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.withColumn("last_click_t",
            last(when($"event_type" === "click", $"t"), ignoreNulls = true).over(w))
          .filter($"event_type" === "purchase")
          .select($"user_id", $"event_id",
            ($"t" - $"last_click_t").as("us_since_click"))
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
             |SELECT user_id, event_id, t - last_click_t AS us_since_click
             |FROM m WHERE event_type = 'purchase'
             |ORDER BY user_id, event_id""".stripMargin),
      headline = true),

    // ---- q67: NATIVE as-of join (custom LogicalPlan/Strategy/SparkPlan) ----
    // Same question as q27, answered by the engine's own physical operator
    // (graftbridge.AsOfJoinExec: co-partitioned merge, O(|L|+|R|) per
    // partition, one candidate row of state). Oracle = DuckDB's native
    // ASOF JOIN — both engines' built-in as-of semantics, checked against
    // each other. Tie semantics (click at exactly the purchase timestamp
    // matches) differ from q27's (event_id-ordered window), so the two
    // queries are intentionally separate gate entries.
    QueryDef(
      "q67_asof_native",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("t"))
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"event_id", $"t")
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id".as("c_user"), $"t".as("c_t"))
        // merge variant pinned (gate determinism); the broadcast variant is
        // spec-covered with result parity against this one
        graft.plans.AsOfJoin.asofJoin(purchases, clicks, "user_id", "c_user", "t", "c_t",
            broadcastRight = Some(false))
          .select($"user_id", $"event_id", ($"t" - $"c_t").as("us_since_click"))
          .orderBy($"user_id", $"event_id")
      },
      Some("""WITH p AS (
             |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t
             |  FROM events WHERE event_type = 'purchase'),
             |c AS (
             |  SELECT user_id AS c_user, epoch_us(CAST(ts AS TIMESTAMP)) AS c_t
             |  FROM events WHERE event_type = 'click')
             |SELECT p.user_id, p.event_id, p.t - c.c_t AS us_since_click
             |FROM p ASOF LEFT JOIN c ON p.user_id = c.c_user AND p.t >= c.c_t
             |ORDER BY p.user_id, p.event_id""".stripMargin)),

    // ---- q68: range (interval) join ----------------------------------------
    // Every purchase joined to ALL clicks by the same user in the preceding
    // hour, aggregated per purchase. Scalable shape: EQUI-join on the user
    // key (the range predicate rides along as the join's secondary
    // condition), so cost is per-key purchase×click cardinality — bounded
    // by per-user activity — never a time-range cross product. For dense
    // keys the same query composes with coarse time-bucketing (join on
    // (key, t div W) for adjacent buckets); the streaming twin is the
    // watermarked stream-stream interval join (EventStream/StreamingSpec).
    QueryDef(
      "q68_range_join",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("t"))
        val p = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"event_id", $"t")
        val c = ev.filter($"event_type" === "click")
          .select($"user_id".as("c_user"), $"t".as("c_t"))
        p.join(c,
            $"user_id" === $"c_user" &&
              $"c_t" <= $"t" && $"c_t" > $"t" - lit(3600L * 1000000L),
            "left")
          .groupBy($"user_id", $"event_id")
          .agg(count($"c_t").as("n_clicks_1h"),
            min($"t" - $"c_t").as("min_gap_us"))
          .orderBy($"user_id", $"event_id")
      },
      Some("""WITH p AS (
             |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t
             |  FROM events WHERE event_type = 'purchase'),
             |c AS (
             |  SELECT user_id AS c_user, epoch_us(CAST(ts AS TIMESTAMP)) AS c_t
             |  FROM events WHERE event_type = 'click')
             |SELECT p.user_id, p.event_id, count(c.c_t) AS n_clicks_1h,
             |  min(p.t - c.c_t) AS min_gap_us
             |FROM p LEFT JOIN c ON p.user_id = c.c_user
             |  AND c.c_t <= p.t AND c.c_t > p.t - 3600000000
             |GROUP BY p.user_id, p.event_id
             |ORDER BY p.user_id, p.event_id""".stripMargin)),
  )
}
