package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet-backed table registry for the harness testdata star schema.
  *
  * Mirrors the reference's source model — a fixed, declared schema bound at
  * scan time (`decorateCMSPhase2SimTree`, reference `phaseII-analysis.py:16-18`)
  * — except the physical format is Parquet and the schema is carried by the
  * files themselves. At 100 TB each `table(...)` is a distributed columnar
  * scan; Catalyst prunes columns and pushes predicates into the Parquet
  * reader, so callers should never pre-materialize.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts has shipped in two physical shapes across testdata
    * generations: TIMESTAMP(NANOS), which Spark 4 refuses to map to its µs
    * TimestampType (read as a raw nanosecond long via `nanosAsLong`, then
    * floor-truncated to µs — the same floor DuckDB's
    * CAST(TIMESTAMP_NS AS TIMESTAMP) applies), and timestamp[us] with
    * isAdjustedToUTC=false, which Spark reads as TIMESTAMP_NTZ (cast to
    * TimestampType — an identity on the stored micros because every
    * session here pins spark.sql.session.timeZone=UTC, matching DuckDB's
    * naive-TIMESTAMP read of the same file). Both normalizations keep
    * oracle arithmetic bit-identical. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    // `ts div 1000`: integer division — `/` would go through double and
    // lose microsecond accuracy at 1.7e18-scale nanosecond values.
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
