package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextOps

/** Dev profiling entry: sub-stage timing of the q104 prefix-join pipeline
  * over the HONEST near-dup corpus (NearDupScale's distinct-twin
  * construction), to locate the 16×/64× cliff the r10 probe measured
  * (124 s at 16× vs q46's 10.9 s on the same 661k-pair output; 64× blew
  * the disk watchdog). Measurement REPLICA of Dedup.prefixJaccardPairs's
  * stages — keep in sync with the operator when its shape changes. */
object Prof104 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "16").trim.toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof104] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val par = spark.sparkContext.defaultParallelism
    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val nd = base.count()
    val docs = (0 until rep).map { j =>
        val t = if (j == 0) col("text") else concat(col("text"), lit(s" nd$j"))
        base.select((col("doc_id") + lit(j * 10L * nd)).as("doc_id"), t.as("text"))
      }.reduce(_ union _).repartition(32).localCheckpoint(true)
    println(s"[prof104] corpus ${rep}x = ${docs.count()} docs")

    val (tNum, tDen) = (4, 5)
    val byText = docs.filter(col("doc_id").isNotNull && col("text").isNotNull)
      .repartition(par, col("text"))
    val reps = byText.groupBy(col("text")).agg(min(col("doc_id")).as("rep_id"))
    val toks = reps.select(col("rep_id").as("doc_id"), col("text"))
      .select(col("doc_id"), TextOps.shingles(col("text"), 3).as("sh"))
      .select(col("doc_id"), explode_outer(col("sh")).as("tok"))
      .filter(col("tok").isNotNull)
      .withColumn("salt", xxhash64(col("doc_id")).bitwiseAND(lit(15L)).cast("int"))
      .repartition(par, col("tok"), col("salt"))
    time("exploded toks")(println("  rows=" + toks.count()))
    val census = toks.groupBy(col("tok"), col("salt"))
      .agg(count(col("doc_id")).as("pc"))
      .groupBy(col("tok")).agg(sum(col("pc")).as("df"))
    time("census")(println("  vocab=" + census.count()))
    val censusFan = census.select(col("tok"), col("df"),
      explode(sequence(lit(0), lit(15)).cast("array<int>")).as("salt")).hint("merge")
    val ordered = toks.join(censusFan, Seq("tok", "salt"))
      .groupBy(col("doc_id"))
      .agg(transform(array_sort(collect_list(struct(col("df"), col("tok")))),
        t => t.getField("tok")).as("toks"))
      .repartition(par, col("doc_id"))
    time("ordered (census join-back + per-doc sort)")(println("  docs=" + ordered.count()))
    val n = size(col("toks"))
    val p = (n - floor((n * tNum + (tDen - 1)) / lit(tDen)) + 1).cast("int")
    val prefixes = ordered.select(col("doc_id"), n.as("n"), p.as("p"),
      explode(slice(col("toks"), lit(1), p)).as("tok"))
    time("prefixes")(println("  rows=" + prefixes.count()))
    val fulls = ordered.select(col("doc_id"), n.as("n"), p.as("p"),
      explode(col("toks")).as("tok"))
    val shared = prefixes.as("a").join(fulls.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") =!= col("b.doc_id") &&
          greatest(col("a.n"), col("b.n")) * tNum <=
            least(col("a.n"), col("b.n")) * tDen)
      .select(
        least(col("a.doc_id"), col("b.doc_id")).as("a_id"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("b_id"),
        col("a.tok").as("tok"),
        (col("a.n") + col("b.n")).as("nsum"),
        least(col("a.n"), col("b.n")).as("nmin"),
        least(col("a.n") - col("a.p"), col("b.n") - col("b.p")).as("smin"))
    time("prefix x full join (narrow rows)")(println("  rows=" + shared.count()))
    val counted = shared
      .groupBy(col("a_id"), col("b_id"), col("tok"))
      .agg(max(col("nsum")).as("nsum"), max(col("nmin")).as("nmin"),
        max(col("smin")).as("smin"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("cpf"), max(col("nsum")).as("nsum"),
        max(col("nmin")).as("nmin"), max(col("smin")).as("smin"))
    time("pair census pre-filter")(println("  co-occurring pairs=" + counted.count()))
    val cands = counted
      .withColumn("bound", least(col("cpf") + col("smin"), col("nmin")))
      .filter(col("bound") * tDen >= (col("nsum") - col("bound")) * tNum)
      .select(col("a_id"), col("b_id"))
    time("count-filter survivors")(println("  pairs=" + cands.count()))
    // mirrors the operator's r11 sorted-merge verify kernel (the profile
    // must replicate the shipped plan, not the pre-kernel spelling)
    val (inter, uni) = graft.operators.Dedup.jaccardColsSorted(
      col("a_sh"), col("b_sh"))
    val core = cands
      .join(ordered.select(col("doc_id").as("a_id"),
        array_sort(col("toks")).as("a_sh")), "a_id")
      .join(ordered.select(col("doc_id").as("b_id"),
        array_sort(col("toks")).as("b_sh")), "b_id")
      .select(col("a_id"), col("b_id"), inter.as("inter"), uni.as("uni"))
      .filter(col("inter") * tDen >= col("uni") * tNum)
    time("verification (array joins + jaccard)")(println("  verified=" + core.count()))
    spark.stop()
  }
}
