package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Dedup

/** Round-11 directive 6: measure the MinHash banding curve — bands × rows
  * against recall and cost — on the NearDupScale honest corpus, so the
  * bands/rowsPerBand parameters ship with a measured sizing rule instead
  * of a fixed 16×2 constant.
  *
  * Truth at each rung is the exact-by-theorem prefix join's pair count
  * (q104 — 661,006 at 16×, independently confirmed by the 16×2 LSH run);
  * each (b, r) variant reports pairs found (→ recall), wall time, and the
  * finalized join census. Variants via SPARK_GRAFT_BANDING
  * (default "8x2,16x2,32x2,32x1,8x4,16x4"), rungs via
  * SPARK_GRAFT_SCALE_REPS (default "16").
  */
object BandingScale {
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
      println(f"[banding] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val reps = sys.env.get("SPARK_GRAFT_SCALE_REPS")
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(16))
    val variants = sys.env.getOrElse("SPARK_GRAFT_BANDING",
        "8x2,16x2,32x2,32x1,8x4,16x4")
      .split(",").toSeq.map(_.trim.split("x") match {
        case Array(b, r) => (b.toInt, r.toInt)
      })
    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val nd = base.count()
    println(s"[banding] base corpus = $nd docs ($sfDir)")
    for (r <- reps) {
      val docs = (0 until r).map { j =>
          val t = if (j == 0) col("text")
            else concat(col("text"), lit(s" nd$j"))
          base.select((col("doc_id") + lit(j * 10L * nd)).as("doc_id"), t.as("text"))
        }
        .reduce(_ union _).repartition(32).localCheckpoint(true)
      println(s"[banding] corpus ${r}x = ${docs.count()} docs")
      // exact truth (prefix join is lossless by theorem)
      val truth = time(s"truth prefixJaccardPairs ${r}x")(
        Dedup.prefixJaccardPairs(docs, 4, 5).count())
      println(s"[banding]   truth pairs=$truth")
      for ((b, rb) <- variants) {
        val n = time(s"${b}x$rb bands ${r}x")(
          Dedup.minhashLshPairs(docs, 4, 5, bands = b, rowsPerBand = rb).count())
        val recall = n.toDouble / truth
        println(f"[banding]   ${b}x$rb pairs=$n recall=$recall%.6f")
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
