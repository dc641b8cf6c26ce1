package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{QueryDef, Tables}

/** General relational operator suite over the TPC-H-ish star schema.
  *
  * Each query is a declarative DataFrame plan — Catalyst handles predicate
  * pushdown, column pruning, join strategy (broadcast for the small dims),
  * and partial (map-side) aggregation. Scale notes are on each query; the
  * global rules for 100 TB:
  *   - dimension tables (region/nation/supplier/part/customer) are orders of
  *     magnitude smaller than the fact table → `broadcast()` hints where the
  *     dim is bounded, AQE otherwise;
  *   - every aggregate is keyed so the shuffle is the reduced (post partial
  *     agg) stream, never raw rows;
  *   - window queries partition by a high-cardinality key (custkey/suppkey)
  *     so per-partition state stays small.
  */
object Relational {

  private def ts(s: String) = lit(s).cast("timestamp")

  val defs: Seq[QueryDef] = Seq(

    // ---- q01: pricing summary (TPC-H Q1 shape) --------------------------
    // Single scan + hash agg on 6 groups; partial agg makes the shuffle
    // 6 rows/partition regardless of input size — scales linearly.
    QueryDef(
      "q01_pricing_summary",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .filter($"l_shipdate" <= ts("1998-09-01"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            round(sum($"l_quantity"), 2).as("sum_qty"),
            round(sum($"l_extendedprice"), 2).as("sum_base_price"),
            round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
            round(sum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")), 2).as("sum_charge"),
            round(avg($"l_quantity"), 4).as("avg_qty"),
            round(avg($"l_extendedprice"), 4).as("avg_price"),
            round(avg($"l_discount"), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  round(avg(l_extendedprice), 4) AS avg_price,
             |  round(avg(l_discount), 4) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      headline = true),

    // ---- q02: projection + selective filter (pushdown check) ------------
    // Both the quantity predicate and the 4-column projection must reach the
    // Parquet scan (PushedFilters / ReadSchema) — verified in BenchSpec.
    QueryDef(
      "q02_filter_pushdown",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .filter($"l_quantity" > 45 && $"l_shipdate" >= ts("1999-01-01"))
          .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
          .orderBy($"l_orderkey", $"l_linenumber")
          .limit(100)
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem
             |WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '1999-01-01'
             |ORDER BY l_orderkey, l_linenumber
             |LIMIT 100""".stripMargin)),

    // ---- q03: join + agg + top-k (TPC-H Q3 shape) ------------------------
    // customer is the small side → broadcast; top-k via orderBy+limit is a
    // TakeOrderedAndProject (per-partition heap, no global sort) in Spark.
    QueryDef(
      "q03_join_topk",
      (s, d) => {
        import s.implicits._
        // Aggregate lineitem BY ITS JOIN KEY before joining: o_orderkey is
        // orders' pk, so per-order revenue is determined by lineitem alone —
        // map-side partial agg shrinks the shuffle ~4× (one skinny row per
        // order instead of every line), and the join probes pre-aggregated
        // rows. Dims filter first: orders ⋈ broadcast(filtered customers)
        // bounds the other side before it ever meets the fact table.
        val cust = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
          .select($"c_custkey")
        val ord = Tables.orders(s, d)
          .join(broadcast(cust), $"o_custkey" === $"c_custkey")
          .select($"o_orderkey")
        Tables.lineitem(s, d)
          .groupBy($"l_orderkey")
          .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
          .join(ord, $"l_orderkey" === $"o_orderkey")
          .select($"o_orderkey", $"revenue")
          .orderBy($"revenue".desc, $"o_orderkey")
          .limit(10)
      },
      Some("""SELECT o_orderkey,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |GROUP BY o_orderkey
             |ORDER BY revenue DESC, o_orderkey
             |LIMIT 10""".stripMargin),
      headline = true),

    // ---- q04: existential semi-join (TPC-H Q4 shape) ---------------------
    // left_semi never duplicates or materializes the probe side's payload.
    QueryDef(
      "q04_exists_semijoin",
      (s, d) => {
        import s.implicits._
        val hot = Tables.lineitem(s, d).filter($"l_quantity" > 49).select($"l_orderkey")
        Tables.orders(s, d)
          .join(hot, $"o_orderkey" === $"l_orderkey", "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_quantity > 49)
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // ---- q05: multiway star join (TPC-H Q5 shape) ------------------------
    // region/nation broadcast (bounded size at any SF); customer joins via
    // shuffle at 100 TB — keyed on the join column so AQE can coalesce.
    QueryDef(
      "q05_multiway_join",
      (s, d) => {
        import s.implicits._
        // Same two levers as q03: (1) dims-first — region bounds nation,
        // nation bounds customer, customer bounds orders — so the fact
        // table only ever joins the already-restricted order set; (2) the
        // fact table pre-aggregates per order key (map-side combine), so
        // the big shuffle carries one (rev, cnt) row per order, not every
        // line item, and the wide join output never re-shuffles on custkey.
        val nr = Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d).filter($"r_name" === "ASIA")),
            $"n_regionkey" === $"r_regionkey")
          .select($"n_nationkey", $"n_name")
        val custAsia = Tables.customer(s, d)
          .join(broadcast(nr), $"c_nationkey" === $"n_nationkey")
          .select($"c_custkey", $"n_name")
        val ord = Tables.orders(s, d)
          .join(custAsia, $"o_custkey" === $"c_custkey")
          .select($"o_orderkey", $"n_name")
        Tables.lineitem(s, d)
          .groupBy($"l_orderkey")
          .agg(sum($"l_extendedprice" * (lit(1) - $"l_discount")).as("rev"),
            count(lit(1)).as("cnt"))
          .join(ord, $"l_orderkey" === $"o_orderkey")
          .groupBy($"n_name")
          .agg(round(sum($"rev"), 2).as("revenue"), sum($"cnt").as("n_items"))
          .orderBy($"n_name")
      },
      Some("""SELECT n_name,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             |  count(*) AS n_items
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name
             |ORDER BY n_name""".stripMargin),
      headline = true),

    // ---- q06: selective scan-agg (TPC-H Q6 shape) ------------------------
    QueryDef(
      "q06_selective_agg",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .filter($"l_shipdate" >= ts("1997-01-01") && $"l_shipdate" < ts("1998-01-01") &&
            $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
          .agg(round(sum($"l_extendedprice" * $"l_discount"), 2).as("revenue"),
            count(lit(1)).as("n_rows"))
      },
      Some("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
             |  count(*) AS n_rows
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate <  TIMESTAMP '1998-01-01'
             |  AND l_discount >= 0.05 AND l_discount <= 0.07
             |  AND l_quantity < 24""".stripMargin),
      headline = true),

    // ---- q07: anti-join ---------------------------------------------------
    QueryDef(
      "q07_antijoin",
      (s, d) => {
        import s.implicits._
        val big = Tables.lineitem(s, d).filter($"l_quantity" > 45).select($"l_partkey")
        Tables.part(s, d)
          .join(big, $"p_partkey" === $"l_partkey", "left_anti")
          .select($"p_partkey", $"p_name")
          .orderBy($"p_partkey")
          .limit(50)
      },
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE NOT EXISTS (SELECT 1 FROM lineitem
             |                  WHERE l_partkey = p_partkey AND l_quantity > 45)
             |ORDER BY p_partkey
             |LIMIT 50""".stripMargin)),

    // ---- q08: window ranking (top-3 orders per customer) ------------------
    QueryDef(
      "q08_window_rank",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 3)
          .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
          .orderBy($"o_custkey", $"rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) t
             |WHERE rn <= 3
             |ORDER BY o_custkey, rn""".stripMargin)),

    // ---- q09: running aggregate window ------------------------------------
    // Rows-frame running sum: both engines accumulate in identical frame
    // order, so even the doubles agree bit-for-bit; rounded anyway.
    QueryDef(
      "q09_window_running",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"l_suppkey")
          .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.lineitem(s, d)
          .filter($"l_suppkey" <= 10)
          .withColumn("running_rev", round(sum($"l_extendedprice").over(w), 2))
          .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"running_rev")
          .orderBy($"l_suppkey", $"l_shipdate", $"l_orderkey", $"l_linenumber")
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
             |  round(sum(l_extendedprice) OVER (
             |    PARTITION BY l_suppkey
             |    ORDER BY l_shipdate, l_orderkey, l_linenumber
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev
             |FROM lineitem
             |WHERE l_suppkey <= 10
             |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin)),

    // ---- q10: lead/lag window --------------------------------------------
    QueryDef(
      "q10_lead_lag",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        Tables.orders(s, d)
          .filter($"o_custkey" <= 20)
          .withColumn("prev_price", lag($"o_totalprice", 1).over(w))
          .withColumn("next_date", lead($"o_orderdate", 1).over(w))
          .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"prev_price",
            datediff($"next_date".cast("date"), $"o_orderdate".cast("date")).as("gap_days"))
          .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |  lag(o_totalprice, 1) OVER w AS prev_price,
             |  date_diff('day', CAST(o_orderdate AS DATE),
             |            CAST(lead(o_orderdate, 1) OVER w AS DATE)) AS gap_days
             |FROM orders
             |WHERE o_custkey <= 20
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)),

    // ---- q11: global top-k ------------------------------------------------
    QueryDef(
      "q11_topk_orders",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .select($"o_orderkey", $"o_custkey", $"o_totalprice")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
          .limit(10)
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // ---- q12: distinct aggregation ----------------------------------------
    QueryDef(
      "q12_distinct_agg",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d).agg(
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"),
          countDistinct($"l_orderkey").as("n_orders"))
      },
      Some("""SELECT count(DISTINCT l_partkey) AS n_parts,
             |  count(DISTINCT l_suppkey) AS n_supps,
             |  count(DISTINCT l_orderkey) AS n_orders
             |FROM lineitem""".stripMargin)),

    // ---- q13: set operations ---------------------------------------------
    QueryDef(
      "q13_setops",
      (s, d) => {
        import s.implicits._
        val cn = Tables.customer(s, d).select($"c_nationkey".as("nationkey")).distinct()
        val sn = Tables.supplier(s, d).select($"s_nationkey".as("nationkey")).distinct()
        val both = cn.intersect(sn).withColumn("tag", lit("both"))
        val custOnly = cn.except(sn).withColumn("tag", lit("cust_only"))
        val any = cn.union(sn).distinct().withColumn("tag", lit("any"))
        both.union(custOnly).union(any)
          .select($"tag", $"nationkey")
          .orderBy($"tag", $"nationkey")
      },
      Some("""WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
             |     sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
             |SELECT tag, nationkey FROM (
             |  SELECT 'both' AS tag, nationkey FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
             |  UNION ALL
             |  SELECT 'cust_only' AS tag, nationkey FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)
             |  UNION ALL
             |  SELECT 'any' AS tag, nationkey FROM (SELECT nationkey FROM cn UNION SELECT nationkey FROM sn)
             |) ORDER BY tag, nationkey""".stripMargin)),

    // ---- q14: scalar function zoo ----------------------------------------
    QueryDef(
      "q14_scalar_funcs",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .filter($"o_orderkey" <= 400)
          .select(
            $"o_orderkey",
            upper(substring($"o_orderpriority", 3, 100)).as("prio_name"),
            length($"o_orderstatus").as("status_len"),
            concat($"o_orderstatus", lit("-"), $"o_orderpriority").as("status_prio"),
            year($"o_orderdate").as("o_year"),
            month($"o_orderdate").as("o_month"),
            dayofmonth($"o_orderdate").as("o_day"),
            when($"o_totalprice" > 200000, "big")
              .when($"o_totalprice" > 50000, "mid")
              .otherwise("small").as("bucket"),
            abs(negate($"o_totalprice")).as("abs_price"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  upper(substr(o_orderpriority, 3)) AS prio_name,
             |  length(o_orderstatus) AS status_len,
             |  o_orderstatus || '-' || o_orderpriority AS status_prio,
             |  CAST(year(o_orderdate) AS INT) AS o_year,
             |  CAST(month(o_orderdate) AS INT) AS o_month,
             |  CAST(day(o_orderdate) AS INT) AS o_day,
             |  CASE WHEN o_totalprice > 200000 THEN 'big'
             |       WHEN o_totalprice > 50000 THEN 'mid'
             |       ELSE 'small' END AS bucket,
             |  abs(-o_totalprice) AS abs_price
             |FROM orders WHERE o_orderkey <= 400
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- q15: range predicates (op.in_range parity) -----------------------
    QueryDef(
      "q15_between_range",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .filter($"l_shipdate".between(ts("1996-01-01"), ts("1997-06-30")) &&
            $"l_quantity".between(10, 20))
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n_rows"),
            round(sum($"l_extendedprice"), 2).as("sum_price"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n_rows,
             |  round(sum(l_extendedprice), 2) AS sum_price
             |FROM lineitem
             |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-06-30'
             |  AND l_quantity BETWEEN 10 AND 20
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- q16: bit operations (bitmask working-point parity) ---------------
    // Mirrors the reference's `idpass & (1<<2)` working-point tests
    // (reference phaseII-analysis.py:319,342).
    QueryDef(
      "q16_bitops",
      (s, d) => {
        import s.implicits._
        Tables.part(s, d)
          .select(
            $"p_partkey",
            ($"p_size".bitwiseAND(7)).as("size_and7"),
            ($"p_size".bitwiseOR(8)).as("size_or8"),
            ($"p_size".bitwiseXOR(5)).as("size_xor5"),
            shiftleft($"p_size", 2).as("size_shl2"),
            shiftright($"p_size", 1).as("size_shr1"),
            ($"p_size".bitwiseAND(lit(1 << 2)) =!= 0).as("wp_medium"))
          .orderBy($"p_partkey")
          .limit(200)
      },
      Some("""SELECT p_partkey,
             |  p_size & 7 AS size_and7,
             |  p_size | 8 AS size_or8,
             |  xor(p_size, 5) AS size_xor5,
             |  p_size << 2 AS size_shl2,
             |  p_size >> 1 AS size_shr1,
             |  (p_size & 4) != 0 AS wp_medium
             |FROM part ORDER BY p_partkey LIMIT 200""".stripMargin)),

    // ---- q17: correlated-style subquery (TPC-H Q17 shape) ------------------
    // Decorrelated into an aggregate + self-join — the plan Spark and any
    // modern optimizer produce anyway; avg of integral quantities is exact.
    QueryDef(
      "q17_avg_subquery",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
        val partAvg = li.groupBy($"l_partkey".as("pk"))
          .agg((avg($"l_quantity") * 0.5).as("half_avg"))
        li.join(partAvg, $"l_partkey" === $"pk")
          .filter($"l_quantity" < $"half_avg")
          .agg(round(sum($"l_extendedprice") / 7.0, 2).as("avg_yearly"),
            count(lit(1)).as("n_rows"))
      },
      Some("""SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
             |  count(*) AS n_rows
             |FROM lineitem l
             |JOIN (SELECT l_partkey AS pk, avg(l_quantity) * 0.5 AS half_avg
             |      FROM lineitem GROUP BY l_partkey) a
             |  ON l.l_partkey = a.pk
             |WHERE l.l_quantity < a.half_avg""".stripMargin)),

    // ---- q18: rollup (hierarchical aggregation) ----------------------------
    QueryDef(
      "q18_rollup",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
          .rollup($"n_name", $"c_mktsegment")
          .agg(count(lit(1)).as("n_cust"),
            round(sum($"c_acctbal"), 2).as("sum_bal"))
          .orderBy($"n_name".asc_nulls_first, $"c_mktsegment".asc_nulls_first)
      },
      Some("""SELECT n_name, c_mktsegment, count(*) AS n_cust,
             |  round(sum(c_acctbal), 2) AS sum_bal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY ROLLUP(n_name, c_mktsegment)
             |ORDER BY n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""".stripMargin)),

    // ---- q19: disjunctive multi-clause predicate (TPC-H Q19 shape) ---------
    QueryDef(
      "q19_disjunctive_pred",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)), $"l_partkey" === $"p_partkey")
          .filter(
            ($"p_brand" === "Brand#1" && $"p_size".between(1, 15) && $"l_quantity".between(1, 11)) ||
            ($"p_brand" === "Brand#2" && $"p_size".between(1, 30) && $"l_quantity".between(10, 20)) ||
            ($"p_brand" === "Brand#3" && $"p_size".between(1, 50) && $"l_quantity".between(20, 30)))
          .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"),
            count(lit(1)).as("n_rows"))
      },
      Some("""SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             |  count(*) AS n_rows
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
             |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 10 AND 20)
             |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    // ---- q20: statistical aggregates --------------------------------------
    QueryDef(
      "q20_stats_agg",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(
            round(stddev_samp($"l_extendedprice"), 4).as("sd_price"),
            round(var_samp($"l_quantity"), 4).as("var_qty"),
            min($"l_extendedprice").as("min_price"),
            max($"l_extendedprice").as("max_price"),
            round(corr($"l_quantity", $"l_extendedprice"), 6).as("qty_price_corr"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  round(stddev_samp(l_extendedprice), 4) AS sd_price,
             |  round(var_samp(l_quantity), 4) AS var_qty,
             |  min(l_extendedprice) AS min_price,
             |  max(l_extendedprice) AS max_price,
             |  round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- q21: group-filter (HAVING) ----------------------------------------
    QueryDef(
      "q21_having",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_suppkey")
          .agg(count(lit(1)).as("n_items"),
            round(sum($"l_quantity"), 2).as("sum_qty"))
          .filter($"n_items" > 400)
          .orderBy($"l_suppkey")
      },
      Some("""SELECT l_suppkey, count(*) AS n_items, round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem GROUP BY l_suppkey HAVING count(*) > 400
             |ORDER BY l_suppkey""".stripMargin)),

    // ---- q22: LIKE pattern matching ----------------------------------------
    QueryDef(
      "q22_like_patterns",
      (s, d) => {
        import s.implicits._
        Tables.part(s, d)
          .filter($"p_type".like("%ECONOMY%") || $"p_name".like("%widget%"))
          .groupBy($"p_brand")
          .agg(count(lit(1)).as("n_parts"),
            round(avg($"p_retailprice"), 4).as("avg_price"))
          .orderBy($"p_brand")
      },
      Some("""SELECT p_brand, count(*) AS n_parts, round(avg(p_retailprice), 4) AS avg_price
             |FROM part
             |WHERE p_type LIKE '%ECONOMY%' OR p_name LIKE '%widget%'
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),
  )
}
