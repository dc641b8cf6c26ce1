package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Sketches

/** Negative probe for the bounded-driver-state guards (r8 directive:
  * the `require` contracts are spec-tested at toy sizes but were never
  * exercised at BENCH scale — this drives them over the real sf corpus
  * with a deliberately unbounded group column and records that the
  * failure is a POINTED message, arriving fast, not an OOM after
  * minutes of driver accumulation).
  *
  * The group column is `event_id` (one group per row — the worst case a
  * caller can hand these operators); maxGroups is left at its default
  * 100000 so the cap triggers exactly as it would in production. The
  * probe PASSES when both calls raise IllegalArgumentException whose
  * message names the operator, the cap, and the remediation. Output
  * cited in SCALING.md §contracts.
  */
object GuardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"))
    val ne = base.agg(max(col("event_id"))).head().getLong(0) + 1
    // 4x id-shifted replication: sf0.1 has exactly 100000 events — the
    // default maxGroups — so the raw corpus SATISFIES the contract; the
    // probe needs a group population strictly past it
    val ev = (0 until 4).map(i =>
        base.select((col("event_id") + lit(i * ne)).cast("string").as("event_id"),
          col("user_id"), col("value")))
      .reduce(_ union _).repartition(32).localCheckpoint(true)
    val heapMb = Runtime.getRuntime.maxMemory() / (1 << 20)
    println(s"[guardprobe] corpus ${ev.count()} events (4x replicated), driver heap ${heapMb} MB")

    def probe(label: String)(f: => Unit): Boolean = {
      val t0 = System.nanoTime()
      try {
        f
        println(s"[guardprobe] $label: FAILED — no guard fired"); false
      } catch {
        case e: IllegalArgumentException =>
          val secs = (System.nanoTime() - t0) / 1e9
          println(f"[guardprobe] $label: guard fired in $secs%.2f s — ${e.getMessage}")
          true
        case e: Throwable =>
          println(s"[guardprobe] $label: FAILED — wrong failure mode: " +
            s"${e.getClass.getSimpleName}: ${e.getMessage}")
          false
      }
    }

    val ok1 = probe("groupedHeavyHitters over per-row groups") {
      Sketches.groupedHeavyHitters(ev, "event_id", "user_id", k = 10).count()
    }
    val ok2 = probe("bisectQuantiles over per-row groups") {
      Sketches.bisectQuantiles(ev, "value", "event_id", Seq(0.5)).count()
    }
    spark.stop()
    if (!(ok1 && ok2)) sys.exit(1)
    println("[guardprobe] PASS — both contracts fail pointedly, not by OOM")
  }
}
