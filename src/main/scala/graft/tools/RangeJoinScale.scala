package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Relational2

/** Scaling probe for the key-free range join: the banded hash join (q135)
  * against the theta-join spelling Catalyst nested-loops, on 1×/4×/16×
  * replications of the sf0.1 sides. Numbers recorded in SCALING.md. */
object RangeJoinScale {
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
      println(f"[rangescale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val supBase = Tables.supplier(spark, sfDir)
      .select($"s_suppkey", ($"s_acctbal" - 50).as("lo"), ($"s_acctbal" + 50).as("hi"))
    val custBase = Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_acctbal".as("v"))
    val ns = supBase.count(); val nc = custBase.count()
    for (r <- Seq(1, 4, 16)) {
      val sup = (0 until r).map(i =>
          supBase.select(($"s_suppkey" + lit(i * 10L * ns)).as("s_suppkey"), $"lo", $"hi"))
        .reduce(_ union _).repartition(32).localCheckpoint(true)
      val cust = (0 until r).map(i =>
          custBase.select(($"c_custkey" + lit(i * 10L * nc)).as("c_custkey"), $"v"))
        .reduce(_ union _).repartition(32).localCheckpoint(true)
      val banded = time(s"banded ${r}x (${sup.count()} x ${cust.count()})") {
        Relational2.bandedRangeJoin(sup, cust, width = 100.0).count()
      }
      val theta = time(s"theta  ${r}x") {
        sup.join(cust, $"v" >= $"lo" && $"v" <= $"hi").count()
      }
      println(s"[rangescale]   pairs banded=$banded theta=$theta")
      assert(banded == theta)
    }
    spark.stop()
  }
}
