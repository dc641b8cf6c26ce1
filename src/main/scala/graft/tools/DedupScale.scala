package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Dedup

/** Scaling probe for the two remaining pair-surface dedup operators the
  * r9 identity-collapse audit flagged as sharing the duplication-cliff
  * SHAPE (array payloads at pair cardinality when keys duplicate) but
  * whose regimes were not yet measured:
  *
  *  - q47 simhashPairs: identical-copy replication makes every tokset
  *    group r× larger — r² pairs per group, each comparing full token
  *    arrays in the join's verification conjunct;
  *  - containmentPairs: identical copies share EVERY CDC chunk, so the
  *    chunk self-join fans r² per chunk and verification joins shingle
  *    arrays at pair cardinality (probed capped at maxChunkDocs=64 too —
  *    the operator's own guard for exactly this regime).
  *
  * Reps via SPARK_GRAFT_SCALE_REPS (default "1,16"). Numbers recorded in
  * SCALING.md §Round-9.
  */
object DedupScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dedupscale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val reps = sys.env.get("SPARK_GRAFT_SCALE_REPS")
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(1, 16))
    val docBase = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("source"))
    val nd = docBase.count()
    for (r <- reps) {
      val docs = (0 until r).map(i =>
          docBase.select((col("doc_id") + lit(i * 10L * nd)).as("doc_id"),
            col("text"), col("source")))
        .reduce(_ union _).repartition(32).localCheckpoint(true)
      println(s"[dedupscale] corpus ${r}x = ${docs.count()} docs")
      val sp = time(s"q47 simhash pairs ${r}x") { Dedup.simhashPairs(docs).count() }
      println(s"[dedupscale]   q47 pairs=$sp")
      val cp = time(s"containment pairs capped(64) ${r}x") {
        Dedup.containmentPairs(docs, maxChunkDocs = 64).count()
      }
      println(s"[dedupscale]   capped containment pairs=$cp")
      val cu = time(s"containment pairs UNCAPPED ${r}x") {
        Dedup.containmentPairs(docs).count()
      }
      println(s"[dedupscale]   uncapped containment pairs=$cu")
      docs.unpersist()
    }
    spark.stop()
  }
}
