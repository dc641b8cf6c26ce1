package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time ONE gate query N times in a single JVM (isolates
  * per-query variance from whole-bench interference). Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.BenchOne q46_minhash_lsh 5 [conf=v ...]"
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 3
    val extra = args.drop(2).map { kv => val Array(k, v) = kv.split("=", 2); k -> v }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = graft.core.SessionTuning.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
    extra.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      // allDefs, not queries: headline-only twins (gate = false) are
      // exactly the ones this tool most often needs to time in isolation.
      graft.SparkEntry.allDefs.find(_.name == name).get.build(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      println(f"[benchone] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
