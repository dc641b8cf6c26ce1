package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables

/** One-shot sizing probe for the q224b capped-dedup gate: the histogram of
  * LSH (band, sig) bucket occupancies over the DISTINCT-TEXT corpus at the
  * gate fixture. q224b's oracle can replay the over-cap shed ONLY through
  * identity groups (byte-equality is SQL-expressible; minhash buckets are
  * not), so its `maxBucket` must sit strictly above the maximum
  * distinct-text bucket occupancy — otherwise `capBuckets` sheds pairs the
  * DuckDB oracle keeps. Run at sf0.01 after every testdata regeneration if
  * q224b ever mismatches. */
object BucketOccupancy {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val hist = graft.operators.Dedup.bucketOccupancyHistogram(docs)
      .orderBy(col("occupancy"))
      .collect()
    hist.foreach(r => println(s"[occ] occupancy=${r.getLong(0)} buckets=${r.getLong(1)}"))
    spark.stop()
  }
}
