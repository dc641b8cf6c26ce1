package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Dev probe: exact-percentile formulations compared (hashmap-based
  * `percentile` aggregate vs sort/window rank interpolation). */
object P23 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p23] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    def current: DataFrame = Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.9))").as("pe"),
        round(expr("percentile(l_quantity, 0.25)"), 4).as("q1_qty"))
      .select($"l_returnflag",
        round(element_at($"pe", 1), 4).as("median_price"),
        round(element_at($"pe", 2), 4).as("p90_price"),
        $"q1_qty")

    // sort/window formulation: rank rows per group, pick the two rows
    // bracketing each type-7 position h = (n-1)p + 1, interpolate.
    def ranked(valueCol: String, ps: Seq[(String, Double)]): DataFrame = {
      val w = Window.partitionBy($"l_returnflag").orderBy(col("v"))
      val wc = Window.partitionBy($"l_returnflag")
      val base = Tables.lineitem(spark, sfDir)
        .select($"l_returnflag", col(valueCol).as("v"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wc))
      val picks = ps.map { case (name, p) =>
        val h = (col("n") - 1) * p + 1
        val take = col("rn") === floor(h) || col("rn") === floor(h) + 1
        (name, p, take)
      }
      val anyTake = picks.map(_._3).reduce(_ || _)
      val taken = base.filter(anyTake)
      val aggs = picks.map { case (name, p, _) =>
        val h = (col("n") - 1) * p + 1
        val lowV = max(when(col("rn") === floor(h), col("v")))
        val highV = max(when(col("rn") === floor(h) + 1, col("v")))
        val frac = max(when(col("rn") === floor(h), h - floor(h)))
        round(lowV + coalesce(frac * (highV - lowV), lit(0.0)), 4).as(name)
      }
      taken.groupBy($"l_returnflag").agg(aggs.head, aggs.tail: _*)
    }

    def alt: DataFrame =
      ranked("l_extendedprice", Seq(("median_price", 0.5), ("p90_price", 0.9)))
        .join(ranked("l_quantity", Seq(("q1_qty", 0.25))), Seq("l_returnflag"))

    // warm both paths once, then time
    time("current (warmup)")(current.write.mode("overwrite").format("noop").save())
    time("alt     (warmup)")(alt.write.mode("overwrite").format("noop").save())
    time("current (warm)")(current.write.mode("overwrite").format("noop").save())
    time("alt     (warm)")(alt.write.mode("overwrite").format("noop").save())
    val a = current.orderBy($"l_returnflag").collect().toSeq
    val b = alt.orderBy($"l_returnflag").collect().toSeq
    println(s"[p23] values equal: ${a.map(_.toString) == b.map(_.toString)}")
    println(a.mkString("\n")); println(b.mkString("\n"))
    spark.stop()
  }
}
