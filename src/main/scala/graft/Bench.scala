package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times the headline queries over
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology: each query is forced end-to-end through the `noop` sink
  * (full plan execution, no result materialization on the driver, no disk
  * write in the timing), after one warmup pass of the cheapest query to
  * amortize JVM/codegen startup out of the numbers.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val headline = SparkEntry.allDefs.filter(_.headline)
    // JVM + codegen warmup on the cheapest headline query (untimed).
    // A warmup failure must not abort the run — the same query fails
    // VISIBLY in its own timed iteration below.
    headline.headOption.foreach { q =>
      try q.build(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => System.err.println(s"[bench] warmup: ${e.getMessage}") }
    }
    // Best-of-N per query, N = 3 by default: the official r4 artifact was
    // destroyed by host contention on byte-identical code (unchanged plans
    // "slowed" 90×); a single contended iteration must never be the
    // reported number. Override with SPARK_GRAFT_BENCH_ITERS.
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt.max(1)
    // 1-min system load at start/end makes a contaminated run self-
    // diagnosing: load >> allotted CPUs means foreign processes were
    // competing for the vCPUs during the measurement.
    def load1: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val loadStart = load1
    // Only successful iterations produce a time; a query with zero successes
    // is reported as failed (never a near-zero "fast" number) and fails the
    // whole bench via exit code, so a broken headline query cannot hide.
    val results = headline.map { q =>
      val times = (1 to iters).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          q.build(spark, sfDir).write.mode("overwrite").format("noop").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] FAILED ${q.name}: ${e.getMessage}")
            None
        }
      }
      q.name -> times
    }
    val ok = results.collect { case (n, ts) if ts.nonEmpty => n -> ts.min }
    val failed = results.collect { case (n, ts) if ts.isEmpty => n }
    val qs = (ok.map { case (k, v) => "\"" + k + f"\":$v%.3f" } ++
      failed.map(n => "\"" + n + "\":\"failed\"")).mkString("{", ",", "}")
    // Per-query iteration stddev alongside best-of-n: a delta between
    // rounds is only a regression when it clears the jitter band — sd
    // makes noise (the r7 q05/q23 "+5-9%" wobble) separable from real
    // slowdowns without re-running the bench.
    val sds = results.collect { case (n, ts) if ts.nonEmpty =>
      val mean = ts.sum / ts.length
      val sd = math.sqrt(ts.map(t => (t - mean) * (t - mean)).sum / ts.length)
      "\"" + n + f"\":$sd%.3f"
    }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val failedJson =
      if (failed.isEmpty) ""
      else failed.map("\"" + _ + "\"").mkString(""","failed":[""", ",", "]")
    val loadEnd = load1
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"queries_sd":$sds$failedJson,"iters":$iters,"load1_start":$loadStart%.2f,"load1_end":$loadEnd%.2f,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
