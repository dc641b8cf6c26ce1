package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.VectorOps
import graft.operators.Similarity

/** Round-10: the honest near-dup axis for the VECTOR tier. Every
  * embedding gets r−1 DISTINCT perturbed near-twins (one coordinate
  * nudged by a twin-specific epsilon — cosine to every family member
  * stays ≈ 1 ≫ τ, byte-identity never holds, so the r9 identity collapse
  * is vacuous and the in-cell pair scan sees the full family fan).
  *
  * What this measures: [[Similarity.semanticDedup]]'s pair scan is
  * O(Σ cell²) over distinct vectors. With the cell count FIXED (q91's
  * 4 sign bits = 16 cells) the honest fan grows r² — the probe times
  * that growth — and the operator's documented mitigation is that cell
  * count GROWS with the corpus (more sign bits): the scaled variant adds
  * log2(r) bits (cells ∝ r) and must flatten the curve. Unlike the q104
  * cliff there is no disk hazard either way: the in-cell join shuffles
  * only the corpus-sized rep table (the pair-cardinality rows exist only
  * inside the join operator, filtered on the fly), so the fixed-bit cost
  * is CPU-bound cosine evaluations. Numbers → SCALING.md §Round-10.
  */
object SemDupScale {
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
      println(f"[semdup] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def measure(label: String, mk: => DataFrame): Unit = {
      val n = time(label) { mk.groupBy().count().head().getLong(0) }
      println(s"[semdup]   $label rows=$n")
    }
    val reps = sys.env.get("SPARK_GRAFT_SCALE_REPS")
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(1, 16, 64))
    val base = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val ne = base.count()
    println(s"[semdup] base = $ne vectors ($sfDir)")
    for (r <- reps) {
      val embs = (0 until r).map { j =>
          val e = if (j == 0) col("embedding")
            else transform(col("embedding"), (x, i) =>
              when(i === lit(j % 64), x + lit(0.001f) * (j + 1)).otherwise(x))
          base.select((col("vec_id") + lit(j * 10L * ne)).as("vec_id"), e.as("embedding"))
        }
        .reduce(_ union _).repartition(32).localCheckpoint(true)
      println(s"[semdup] corpus ${r}x = ${embs.count()} vectors (all distinct)")
      // fixed 16 cells: the honest fan is r² per cell — the regime a
      // statically-sized quantizer degrades into as the corpus grows
      measure(s"semanticDedup 4-bit (16 cells) ${r}x",
        Similarity.semanticDedup(embs,
          VectorOps.rademacherSigns(4, 64, seed = 91), tau = 0.40))
      // scaled cells (the scaladoc's contract: cell count grows with the
      // corpus): +log2(r) bits keeps expected cell occupancy constant
      val bits = 4 + (math.log(r.toDouble) / math.log(2.0)).ceil.toInt
      if (r > 1) measure(s"semanticDedup $bits-bit (${1 << bits} cells) ${r}x",
        Similarity.semanticDedup(embs,
          VectorOps.rademacherSigns(bits, 64, seed = 91), tau = 0.40))
      embs.unpersist()
    }
    spark.stop()
  }
}
