package graft

import org.apache.spark.sql.functions._

/** Source/sink scale behaviors: bucketed co-located joins, partition-pruned
  * reads, CSV/JSON round-trips. These pin the 100 TB I/O design: a bucketed
  * fact-dim join must not shuffle either side, and a partition filter must
  * prune directories at planning time, not scan-and-filter.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      graft.core.Tables.lineitem(spark, sf0001)
        .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      graft.core.Tables.orders(spark, sf0001)
        .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("ord_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 6000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitioned parquet read prunes partitions at plan time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    graft.core.Tables.events(spark, sf0001)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val q = spark.read.parquet(dir).filter($"event_type" === "click")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "no partition filters in scan")
    assert(plan.contains("event_type"), s"partition column not in filters:\n$plan")
    val full = graft.core.Tables.events(spark, sf0001)
      .filter($"event_type" === "click").count()
    assert(q.count() == full)
  }

  test("csv and json sinks/sources round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select($"doc_id", $"lang", $"n_chars")
    docs.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    docs.write.mode("overwrite").json(s"$dir/json")
    val backCsv = spark.read.option("header", "true")
      .schema("doc_id LONG, lang STRING, n_chars LONG").csv(s"$dir/csv")
    val backJson = spark.read.json(s"$dir/json")
      .select($"doc_id", $"lang", $"n_chars")
    assert(backCsv.count() == 500 && backJson.count() == 500)
    val origSum = docs.agg(sum("n_chars")).head().getLong(0)
    assert(backCsv.agg(sum("n_chars")).head().getLong(0) == origSum)
    assert(backJson.agg(sum("n_chars")).head().getLong(0) == origSum)
  }
}
