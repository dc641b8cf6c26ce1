package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Sketches

/** Scaling probe for the round-7 sketch operators: heavy hitters (q124)
  * and bisection quantiles (q128) on 1×/4×/16× replications of the sf0.1
  * tables. Replication keeps the DISTRIBUTION fixed while multiplying the
  * row count — exactly the axis both operators claim to be flat-ish in
  * (bounded sketch / bounded brackets; only the scans grow). Numbers
  * recorded in SCALING.md.
  */
object SketchScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[sketchscale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docsBase = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val nd = docsBase.count()
    val liBase = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"))
    val mainReps = sys.env.get("SPARK_GRAFT_MAIN_REPS")
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(1, 4, 16))
    for (r <- mainReps) {
      val docs = (0 until r).map(i =>
          docsBase.select((col("doc_id") + lit(i * 10L * nd)).as("doc_id"), col("text")))
        .reduce(_ union _).repartition(32).localCheckpoint(true)
      val bigrams = docs.select(
        explode(graft.functions.TextOps.ngrams(col("text"), 2)).as("bigram"))
      val hh = time(s"q124 heavy hitters ${r}x (${docs.count()} docs)") {
        Sketches.heavyHitters(bigrams, "bigram", k = 1000).count()
      }
      val (cand, _) = Sketches.hhCandidates(bigrams, "bigram", 1000, 1024, 4, 124L)
      val total = bigrams.count(); val c = cand.count()
      println(f"[sketchscale]   hh=$hh candidates=$c/$total (${c * 100.0 / total}%.0f%%)")
      val li = (0 until r).map(_ => liBase).reduce(_ union _)
        .repartition(32).localCheckpoint(true)
      val q = time(s"q128 bisect quantiles ${r}x (${li.count()} rows)") {
        Sketches.bisectQuantiles(li, "l_extendedprice", "l_returnflag",
          qs = Seq(0.5, 0.9)).count()
      }
      println(s"[sketchscale]   quantile rows=$q")
    }
    spark.stop()
  }
}
