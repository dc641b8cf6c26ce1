package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}

/** Harness-extension relational operators beyond the reference surface:
  * exact percentiles, cube grouping sets, and sketch-based distinct counts.
  */
object RelationalExt {

  val defs: Seq[QueryDef] = Seq(

    // ---- q23: exact interpolated percentiles -------------------------------
    // Both engines implement the continuous (type-7) quantile: order
    // statistics + linear interpolation on identical doubles — exact parity.
    QueryDef(
      "q23_percentiles",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(
            round(expr("percentile(l_extendedprice, 0.5)"), 4).as("median_price"),
            round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"),
            round(expr("percentile(l_quantity, 0.25)"), 4).as("q1_qty"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
             |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
             |  round(quantile_cont(l_quantity, 0.25), 4) AS q1_qty
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      headline = true),

    // ---- q24: cube grouping sets -------------------------------------------
    QueryDef(
      "q24_cube",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .cube($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("sum_qty"))
          .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // ---- q64: typed per-group imperative logic (mapGroups) -----------------
    // The KeyValueGroupedDataset tier: arbitrary Scala per group, shuffled
    // once on the key — the batch twin of the streaming state operator.
    // Order-insensitive group logic (sorted copy inside) keeps it exact.
    QueryDef(
      "q64_typed_mapgroups",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .select($"l_suppkey", $"l_extendedprice")
          .as[(Long, Double)]
          .groupByKey(_._1)
          .mapGroups { (k, it) =>
            val prices = it.map(_._2).toArray
            java.util.Arrays.sort(prices)
            val n = prices.length
            (k, n.toLong, prices(n - 1), if (n > 1) prices(n - 2) else Double.NaN)
          }
          .toDF("l_suppkey", "n_items", "max_price", "second_price")
          .select($"l_suppkey", $"n_items",
            round($"max_price", 2).as("max_price"),
            round($"second_price", 2).as("second_price"))
          .orderBy($"l_suppkey")
      },
      Some("""SELECT l_suppkey, count(*) AS n_items,
             |  round(max(l_extendedprice), 2) AS max_price,
             |  round(list_sort(list(l_extendedprice), 'DESC')[2], 2) AS second_price
             |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin)),

    // ---- q25: sketch-based distinct count (HLL++) --------------------------
    // Rows-only: HLL implementations differ across engines by design.
    // RelationalExtSpec asserts <5% relative error vs the exact count.
    QueryDef(
      "q25_approx_distinct",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(
            approx_count_distinct($"l_partkey").as("approx_parts"),
            countDistinct($"l_partkey").as("exact_parts"),
            round(expr("percentile_approx(l_extendedprice, 0.5, 1000)"), 2).as("approx_median"))
          .orderBy($"l_returnflag")
      },
      None),
  )
}
