package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextOps

/** Dev profiling entry: isolate the per-combo cost of the bucket-local
  * prefix tier's self-join (r12). The first honest run measured ~20 µs per
  * key-matched combo (64× = 1.11G combos, 22.5k core-s in the join stage)
  * against a ~100 ns/combo model — this replica runs the SAME bucket
  * self-join with conjuncts/payload toggled to attribute the gap:
  *
  *   SPARK_GRAFT_BL_MODES (comma list, default "fanslim,fan,canon,full"):
  *     fanslim — hk + id< + length bound, NO array payload in the rows
  *     fan     — same condition, full (ph, sh) payload carried
  *     canon   — + FirstSharedPrefixExpr (exactly-once election)
  *     full    — + the Jaccard threshold AS A JOIN CONJUNCT (the REJECTED
  *               iteration-1 shape, kept as the attribution witness: this
  *               is what measures ~20 µs/combo because SMJ codegen
  *               extracts condition-referenced columns per combo)
  *     half    — full with the single-kernel threshold algebra
  *     k1/cmp0 — one always-true kernel eval / array-size-only conjunct
  *
  * The SHIPPED tier (thin condition + blocked filters + hash-bound count
  * filter) is measured by NearDupScale's q104bl op, not here. */
object Prof104BL {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "16").trim.toInt
    val modes = sys.env.getOrElse("SPARK_GRAFT_BL_MODES", "fanslim,fan,canon,full")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof104bl] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val par = spark.sparkContext.defaultParallelism
    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val nd = base.count()
    val docs = (0 until rep).map { j =>
        val t = if (j == 0) col("text") else concat(col("text"), lit(s" nd$j"))
        base.select((col("doc_id") + lit(j * 10L * nd)).as("doc_id"), t.as("text"))
      }.reduce(_ union _).repartition(32).localCheckpoint(true)
    println(s"[prof104bl] corpus ${rep}x = ${docs.count()} docs")

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
    val census = toks.groupBy(col("tok"), col("salt"))
      .agg(count(col("doc_id")).as("pc"))
      .groupBy(col("tok")).agg(sum(col("pc")).as("df"))
    val censusFan = census.select(col("tok"), col("df"),
      explode(sequence(lit(0), lit(15)).cast("array<int>")).as("salt")).hint("merge")
    val ordered = toks.join(censusFan, Seq("tok", "salt"))
      .groupBy(col("doc_id"))
      .agg(transform(array_sort(collect_list(struct(col("df"), col("tok")))),
        t => t.getField("tok")).as("toks"))
      .repartition(par, col("doc_id"))
      .localCheckpoint(true) // isolate the join cost from the front
    time("front (ordered, materialized)")(println("  docs=" + ordered.count()))
    val n = size(col("toks"))
    val p = (n - floor((n * tNum + (tDen - 1)) / lit(tDen)) + 1).cast("int")
    val perDoc = ordered.select(col("doc_id"), n.as("n"),
      array_distinct(transform(slice(col("toks"), lit(1), p),
        x => xxhash64(x))).as("ph"),
      array_sort(col("toks")).as("sh"))
    def join(bsh: DataFrame, extra: Option[org.apache.spark.sql.Column]) = {
      val cond0 = col("a.hk") === col("b.hk") &&
        col("a.doc_id") < col("b.doc_id") &&
        greatest(col("a.n"), col("b.n")) * tNum <=
          least(col("a.n"), col("b.n")) * tDen
      bsh.as("a").join(bsh.as("b"), extra.map(cond0 && _).getOrElse(cond0))
    }
    val canonical = graft.expressions.FirstSharedPrefixExpr
      .isFirstShared(col("a.ph"), col("b.ph"), col("a.hk"))
    val (inter, uni) = graft.operators.Dedup.jaccardColsSorted(
      col("a.sh"), col("b.sh"))
    val threshold = inter * tDen >= uni * tNum
    for (m <- modes) m match {
      case "fanslim" =>
        val slim = perDoc.select(col("doc_id"), col("n"),
          explode_outer(col("ph")).as("hk"))
        time(s"fanslim ${rep}x")(println("  combos=" +
          join(slim, None).count()))
      case "fan" =>
        val bsh = perDoc.select(col("doc_id"), col("n"), col("ph"), col("sh"),
          explode_outer(col("ph")).as("hk"))
        time(s"fan ${rep}x")(println("  combos=" +
          join(bsh, None).select(col("a.doc_id")).count()))
      case "canon" =>
        val bsh = perDoc.select(col("doc_id"), col("n"), col("ph"), col("sh"),
          explode_outer(col("ph")).as("hk"))
        time(s"canon ${rep}x")(println("  pairs=" +
          join(bsh, Some(canonical)).select(col("a.doc_id")).count()))
      case "full" =>
        val bsh = perDoc.select(col("doc_id"), col("n"), col("ph"), col("sh"),
          explode_outer(col("ph")).as("hk"))
        time(s"full ${rep}x")(println("  verified=" +
          join(bsh, Some(canonical && threshold)).select(col("a.doc_id")).count()))
      case "plan" =>
        val bsh = perDoc.select(col("doc_id"), col("n"), col("ph"), col("sh"),
          explode_outer(col("ph")).as("hk"))
        println(join(bsh, Some(canonical && threshold))
          .select(col("a.doc_id")).queryExecution.executedPlan.toString)
      case "half" =>
        // single-kernel algebra: inter·(tDen+tNum) >= (|A|+|B|)·tNum
        val bsh = perDoc.select(col("doc_id"), col("n"), col("ph"), col("sh"),
          explode_outer(col("ph")).as("hk"))
        val inter1 = graft.expressions.SortedInterSizeExpr.interSize(
          col("a.sh"), col("b.sh"))
        val th1 = inter1 * (tDen + tNum) >=
          (size(col("a.sh")) + size(col("b.sh"))) * tNum
        time(s"half ${rep}x")(println("  verified=" +
          join(bsh, Some(canonical && th1)).select(col("a.doc_id")).count()))
      case "k1" =>
        // ONE kernel eval per canon-passing combo, result always true —
        // isolates the merge kernel's in-condition cost from its selectivity
        val bsh = perDoc.select(col("doc_id"), col("n"), col("ph"), col("sh"),
          explode_outer(col("ph")).as("hk"))
        val k = graft.expressions.SortedInterSizeExpr.interSize(
          col("a.sh"), col("b.sh")) >= 0
        time(s"k1 ${rep}x")(println("  rows=" +
          join(bsh, Some(canonical && k)).select(col("a.doc_id")).count()))
      case "cmp0" =>
        // array ACCESS without the merge: sizes only
        val bsh = perDoc.select(col("doc_id"), col("n"), col("ph"), col("sh"),
          explode_outer(col("ph")).as("hk"))
        val k = size(col("a.sh")) + size(col("b.sh")) >= 0
        time(s"cmp0 ${rep}x")(println("  rows=" +
          join(bsh, Some(canonical && k)).select(col("a.doc_id")).count()))
      case other => println(s"[prof104bl] unknown mode $other")
    }
    spark.stop()
  }
}
