package graft

import org.apache.spark.sql.functions._
import graft.operators.Maintenance

/** Bucketed-layout shuffle elimination: a join and an aggregation on the
  * bucket key must run with zero exchanges, and equal the unbucketed
  * results exactly. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = java.nio.file.Files.createTempDirectory("bucketed").toString
  private lazy val tables: Unit = {
    Maintenance.writeBucketed(graft.core.Tables.orders(spark, sf0001),
      s"$base/o", "bj_orders", Seq("o_orderkey"), 8)
    Maintenance.writeBucketed(
      graft.core.Tables.lineitem(spark, sf0001)
        .withColumnRenamed("l_orderkey", "o_orderkey"),
      s"$base/l", "bj_lineitem", Seq("o_orderkey"), 8)
  }

  private def withoutBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("join + agg on the bucket key: zero exchanges, equals the shuffled twin") {
    tables
    withoutBroadcast {
      val joined = spark.table("bj_orders")
        .join(spark.table("bj_lineitem"), "o_orderkey")
        .groupBy($"o_orderkey").agg(count(lit(1)).as("n"), sum($"l_quantity").as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join + bucket-key agg must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true") && plan.contains("SelectedBucketsCount"),
        s"scans must be bucketed reads:\n$plan")
      val got = joined.collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      val exp = graft.core.Tables.orders(spark, sf0001)
        .join(graft.core.Tables.lineitem(spark, sf0001)
          .withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
        .groupBy($"o_orderkey").agg(count(lit(1)).as("n"), sum($"l_quantity").as("q"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got == exp)
    }
  }

  test("aggregation on the bucket key needs no exchange either") {
    tables
    val agg = spark.table("bj_lineitem")
      .groupBy($"o_orderkey").agg(sum($"l_quantity").as("q"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucket-key aggregation must not shuffle:\n$plan")
    assert(agg.count() == graft.core.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey").distinct().count())
  }

  test("off-bucket-key grouping still shuffles only the aggregate, never the join") {
    tables
    withoutBroadcast {
      // the realistic pipeline: co-located join, then a small shuffle on a
      // DIFFERENT key. The only exchange must be the post-join aggregate's
      // (grouping key, not the join key) — the fact-table join stays local.
      val q = spark.table("bj_orders")
        .join(spark.table("bj_lineitem"), "o_orderkey")
        .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      val plan = q.queryExecution.executedPlan.toString
      val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
      assert(exchanges.size == 1 && exchanges.head.contains("o_orderstatus"),
        s"expected exactly the post-join o_orderstatus exchange:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"join should be sort-merge:\n$plan")
    }
  }
}
