package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Native-vs-composed as-of join scaling probe: replicates sf0.1 events by
  * shifting user_id, times both formulations (numbers in SCALING.md). */
object AsOfScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[asof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val base = Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("t"))
      .filter($"event_type".isin("purchase", "click"))
    val maxU = base.agg(max($"user_id")).head().getLong(0) + 1
    for (r <- Seq(1, 8)) {
      val ev = (0 until r).map(i =>
          base.select(($"user_id" + lit(i * maxU)).as("user_id"),
            $"event_id", $"event_type", $"t"))
        .reduce(_ union _).localCheckpoint(true)
      println(s"[asof] events ${r}x = ${ev.count()}")
      time(s"composed (window) ${r}x") {
        val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.withColumn("last_click_t",
            last(when($"event_type" === "click", $"t"), ignoreNulls = true).over(w))
          .filter($"event_type" === "purchase")
          .select($"user_id", $"event_id", ($"t" - $"last_click_t").as("gap"))
          .write.mode("overwrite").format("noop").save()
      }
      for (bc <- Seq(Some(false), Some(true))) {
        val label = if (bc.contains(true)) "broadcast" else "merge"
        time(s"native ($label) ${r}x") {
          val p = ev.filter($"event_type" === "purchase").select($"user_id", $"event_id", $"t")
          val c = ev.filter($"event_type" === "click")
            .select($"user_id".as("c_user"), $"t".as("c_t"))
          graft.plans.AsOfJoin.asofJoin(p, c, "user_id", "c_user", "t", "c_t", bc)
            .select($"user_id", $"event_id", ($"t" - $"c_t").as("gap"))
            .write.mode("overwrite").format("noop").save()
        }
      }
    }
    spark.stop()
  }
}
