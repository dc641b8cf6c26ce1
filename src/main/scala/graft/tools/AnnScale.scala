package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Dedup, IvfIndex}

/** Scaling probe for the two at-scale similarity paths the r8 verdict's
  * 64× directive names and no existing tool covers:
  *
  *  - IVF index build + probed search, on vec-shifted replication of the
  *    embeddings table (identical vectors, distinct ids: assignment and
  *    per-cell layout grow linearly, search cost stays ∝ probed cells,
  *    NOT corpus size — partition pruning is the claim); runs FIRST so
  *    its 64× row survives any q104 trouble downstream;
  *  - q104 prefix-filtered exact set-similarity join, on TWO replication
  *    regimes that stress different stages:
  *      (a) identical copies (doc-shifted ids, same text) — true pairs
  *          grow ∝ r², and before the r9 identity collapse the
  *          verification join carried two full shingle arrays per pair:
  *          64× = 11.1M pairs × ~KB arrays ≈ hundreds of GB of SMJ spill,
  *          measured DISK-FULL. After the collapse, array-carrying joins
  *          see only the replication-invariant representative pairs and
  *          the quadratic output rides narrow id joins — this regime now
  *          measures the collapse;
  *      (b) token-disjoint copies (every word suffixed with the replica
  *          id) — replicas share no shingles, so vocabulary and true
  *          pairs grow ∝ r: this is the linear-census claim (candidate
  *          generation ∝ r × prefix tokens) measured directly.
  *
  * Reps via SPARK_GRAFT_SCALE_REPS (default "1,16,64"). Numbers recorded
  * in SCALING.md §Round-9.
  */
object AnnScale {
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
      println(f"[annscale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val reps = sys.env.get("SPARK_GRAFT_SCALE_REPS")
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(1, 16, 64))

    val docBase = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val nd = docBase.count()
    val embBase = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val nv = embBase.count()

    for (r <- reps) {
      val embs = (0 until r).map(i =>
          embBase.select((col("vec_id") + lit(i * 10L * nv)).as("vec_id"),
            col("embedding")))
        .reduce(_ union _).repartition(32).localCheckpoint(true)
      println(s"[annscale] vectors ${r}x = ${embs.count()}")
      val dir = java.nio.file.Files.createTempDirectory(s"annscale_$r").toString
      time(s"ivf build ${r}x") { IvfIndex.build(spark, embs, dir, nCells = 16) }
      val queries = embBase.limit(100)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        .localCheckpoint(true)
      val hits = time(s"ivf search 100q ${r}x") {
        IvfIndex.search(spark, dir, queries, k = 5, nProbe = 2).count()
      }
      println(s"[annscale]   hits=$hits")
      // q91 semantic dedup on the identical-vector corpus: every replica
      // group must collapse to one representative BEFORE the in-cell pair
      // join (r9) — pre-collapse this regime is r² float-array pairs per
      // cell; post-collapse the cell join is replication-invariant
      val kept = time(s"q91 semantic dedup ${r}x") {
        graft.operators.Similarity.semanticDedup(
          embs.select(col("vec_id"), col("embedding")),
          graft.operators.Similarity.SemDedup.signs, tau = 0.40)
          .filter(col("kept") === 1).count()
      }
      println(s"[annscale]   kept=$kept")
      embs.unpersist(); queries.unpersist()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))

      val dupDocs = (0 until r).map(i =>
          docBase.select((col("doc_id") + lit(i * 10L * nd)).as("doc_id"),
            col("text")))
        .reduce(_ union _).repartition(32).localCheckpoint(true)
      println(s"[annscale] identical-copy corpus ${r}x = ${dupDocs.count()} docs")
      val dupPairs = time(s"q104 identical-copy pairs ${r}x") {
        Dedup.prefixJaccardPairs(dupDocs, tNum = 4, tDen = 5).count()
      }
      println(s"[annscale]   pairs=$dupPairs")
      dupDocs.unpersist()

      val disjDocs = (0 until r).map(i =>
          docBase.select((col("doc_id") + lit(i * 10L * nd)).as("doc_id"),
            regexp_replace(col("text"), "(\\S+)", "$1!" + i).as("text")))
        .reduce(_ union _).repartition(32).localCheckpoint(true)
      println(s"[annscale] token-disjoint corpus ${r}x = ${disjDocs.count()} docs")
      val disjPairs = time(s"q104 token-disjoint pairs ${r}x") {
        Dedup.prefixJaccardPairs(disjDocs, tNum = 4, tDen = 5).count()
      }
      println(s"[annscale]   pairs=$disjPairs")
      disjDocs.unpersist()
    }
    spark.stop()
  }
}
