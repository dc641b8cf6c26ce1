package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Dedup

/** Dev profiling entry: sub-stage timing of the CURRENT q46 pipeline shape. */
object Prof46 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof46] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = Tables.documents(spark, sfDir)
    time("docs count warm")(docs.count())
    time("docs count warm2")(docs.count())

    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
    time("tokenize noop")(toks.write.mode("overwrite").format("noop").save())
    println("  avg tokens = " + toks.select(avg(size(col("t")))).head().getDouble(0))

    def trig(t: org.apache.spark.sql.Column) = {
      val h = transform(t, x => xxhash64(x))
      val m = size(t) - lit(2)
      val ab = zip_with(slice(h, lit(1), m), slice(h, lit(2), m), (x, y) => xxhash64(x, y))
      zip_with(ab, slice(h, lit(3), m), (x, y) => xxhash64(x, y))
    }
    val hdf = toks.select(col("doc_id"), trig(col("t")).as("h"))
    time("trigram hashes noop")(hdf.write.mode("overwrite").format("noop").save())
    val sigRL = hdf.select(col("doc_id") +: (0 until 32).map(p =>
      array_min(transform(col("h"), x => xxhash64(lit(p), x))).as(s"m$p")): _*)
    time("32 minhash row-local noop")(sigRL.write.mode("overwrite").format("noop").save())
    val ex = toks.select(col("doc_id"), explode(trig(col("t"))).as("th"))
    val minAggs = (0 until 32).map(p => min(xxhash64(lit(p), col("th"))).as(s"m$p"))
    val sigAgg = ex.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
    time("32 minhash explode+agg noop")(sigAgg.write.mode("overwrite").format("noop").save())

    val full = Dedup.minhashLshPairs(docs, 4, 5)
    val ord = full.orderBy(col("a_id"), col("b_id"))
    time("full q46 (collect)")(ord.collect())
    time("full q46 again")(ord.collect())
    val fin = ord.queryExecution.executedPlan.toString
    println("[prof46] ReusedExchange count in final plan: " +
      "ReusedExchange".r.findAllIn(fin).length)
    println("[prof46] Scan parquet count in final plan: " +
      "Scan parquet".r.findAllIn(fin).length)
    println("[prof46] WSCG spans: " + "WholeStageCodegen".r.findAllIn(fin).length)
    // stage-by-stage of the internal pipeline
    val toks2 = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
    val hdf2 = toks2.select(col("doc_id"), trig(col("t")).as("h"))
    val sig2 = hdf2.select(col("doc_id") +: (0 until 32).map(p =>
        array_min(transform(col("h"), x => xxhash64(lit(p), x))).as(s"m$p")): _*)
      .repartition(col("doc_id"))
    val bandStructs = (0 until 16).map { b =>
      struct(lit(b).as("band"),
        xxhash64(col(s"m${b * 2}"), col(s"m${b * 2 + 1}")).as("sig"))
    }
    val buckets = sig2.select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.sig").as("sig"))
    val cand = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id")).distinct()
    time("cand only")(println("  cand=" + cand.count()))
    time("cand only again")(println("  cand=" + cand.count()))
    spark.stop()
  }
}
