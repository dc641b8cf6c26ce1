package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Dev probe: native L2SqExpr vs the interpreted HOF fold, head-to-head on
  * a probe-vectors × corpus distance sweep (the IVF/k-means assignment
  * shape). Prints best-of-N seconds for each path. */
object ProfL2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val emb = graft.core.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val probes = emb.filter($"vec_id" < 16)
      .select($"vec_id".as("pid"), $"v".as("pv"))
    def run(name: String, d: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit = {
      val t = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        emb.crossJoin(broadcast(probes))
          .select(d($"pv").as("d2"))
          .agg(sum($"d2")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profl2] $name best=${t.min}%.2f s all=${t.map(x => f"$x%.2f").mkString(",")}")
    }
    run("native", pv => VectorOps.l2sq($"v", pv))
    run("hof   ", pv => VectorOps.l2sqHof($"v", pv))
    spark.stop()
  }
}
