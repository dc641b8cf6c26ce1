package graft

import org.apache.spark.sql.functions._
import graft.core.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on a skewed key distribution") {
    // 90% of fact rows share one hot key
    val large = spark.range(10000)
      .select(when($"id" % 10 =!= 0, 1L).otherwise($"id" % 100).as("k"), $"id".as("v"))
    val small = (0L until 100L).map(k => (k, s"dim$k")).toDF("dk", "name")
    val plain = large.join(small, $"k" === $"dk")
      .agg(count(lit(1)), sum($"v")).head()
    val salted = Skew.saltedJoin(large, small, col("k"), col("dk"), buckets = 8)
      .agg(count(lit(1)), sum($"v")).head()
    assert(plain == salted)
  }

  test("salt actually spreads the hot key across buckets") {
    val large = spark.range(1000).select(lit(7L).as("k"), $"id".as("v"))
    val salts = large.withColumn("__salt",
      pmod(xxhash64(col("k"), col("v")), lit(8)))
      .select("__salt").distinct().count()
    assert(salts == 8, "hot key should hit every salt bucket")
  }
}
