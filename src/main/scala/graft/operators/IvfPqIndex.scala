package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Lineage.CutOps
import graft.functions.VectorOps

/** Persisted IVF-PQ index — the full FAISS-style 100 TB ANN architecture,
  * composing [[IvfIndex]]'s partition-pruned cell layout with [[Pq]]'s
  * code compression on the RESIDUALS (vector − its cell centroid; PQ on
  * residuals is what makes coarse+fine quantization additive: the coarse
  * step removes the cell mean, the codebooks only model what is left).
  *
  *  - `build`: coarse quantizer (distributed MLlib k-means on a sample)
  *    → cell assignment; residual per vector; per-subspace PQ codebooks
  *    trained by the declarative Lloyd loop on re-keyed residuals; then
  *    ONLY the code table (vec_id, sub, code — m small ints per vector)
  *    is persisted partitioned by cell, plus the tiny model tables
  *    (centroids, codebook, and a one-row geometry meta so search can
  *    never slice queries against a mismatched layout). The float corpus is not part of the index:
  *    a 64-dim float32 corpus stores 256 B/vector; m=4 byte-able codes
  *    store 4 — the serving I/O shrinks ~64×.
  *  - `search`: probe the `nProbe` nearest cells per query (centroid
  *    table broadcast); build per-(query, cell) residual distance tables
  *    (nQ·nProbe·m·k doubles — broadcast); read ONLY probed cell
  *    directories (partition pruning, asserted by `IvfPqIndexSpec`) and
  *    rank by ADC sums that partial-aggregate map-side. No float vector
  *    is read at query time — queries touch codes + two model tables.
  *
  * Like [[IvfIndex]], everything needed to serve is in the files — any
  * session can search without re-training. Spec-verified (recall against
  * exact search, probe monotonicity, plan pruning); the oracle-checked
  * faces of the same machinery are q63 (fixed-quantizer IVF) and q108
  * (learned PQ + ADC).
  */
object IvfPqIndex {

  /** Absolute cap on PQ codebook training rows. A fraction-only sample is
    * corpus-proportional — still 25 TB of a 100 TB corpus — while codebook
    * quality saturates at tens of thousands of residuals per subspace
    * (the FAISS default trains 256-entry codebooks on ≲64k samples); past the cap,
    * more rows buy nothing and the single-slice re-key would pay for them. */
  private val MaxPqTrainRows = 65536

  /** Train coarse + PQ models, persist `<dir>/codes` (partitioned by
    * cell), `<dir>/centroids`, `<dir>/codebook`. Returns cell count. */
  def build(spark: SparkSession, embeddings: DataFrame, dir: String,
      nCells: Int = 16, m: Int = 2, dim: Int = 64, kCodes: Int = 16,
      iters: Int = 4, trainFraction: Double = 0.25): Int = {
    import spark.implicits._
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feat = embeddings.select($"vec_id", $"embedding",
      array_to_vector($"embedding").as("fv"))
    val sample = feat.sample(withReplacement = false, trainFraction, seed = 42)
    val train = if (sample.count() >= nCells.toLong * 4) sample else feat
    val model = new KMeans().setK(nCells).setSeed(42)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(train)
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq.toDF("cell", "cvec")
    val assigned = model.transform(feat)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"), $"cell")
      .join(broadcast(centroids), Seq("cell"))
      .select($"vec_id", $"cell",
        zip_with($"v", $"cvec", (a, b) => a - b).as("rv"))
    // PQ codebooks on residuals, trained on an ABSOLUTELY bounded sample
    // (codebooks are model parameters; the corpus never needs to enter the
    // Lloyd loop). The fraction sample alone is corpus-proportional, so it
    // is capped at MaxPqTrainRows via orderBy(vec_id).limit — which plans
    // as a distributed TakeOrderedAndProject (per-partition top-N, no
    // global sort) and is deterministic. The bounded slice is checkpointed
    // so the guard count, the re-key, and every Lloyd round read ~64k
    // materialized rows instead of re-executing the coarse-assignment
    // lineage; kmeansFit seeds from ids 0..k−1, so the slice re-keys to
    // contiguous ids — the row_number window is over the capped,
    // single-partition slice by construction, never a corpus fraction.
    def boundedSlice(df: DataFrame): DataFrame = df
      .orderBy($"vec_id").limit(MaxPqTrainRows)
      .select($"vec_id", $"rv").cutLineage()
    val pqSample = boundedSlice(
      assigned.sample(withReplacement = false, trainFraction, seed = 43))
    val pqView = if (pqSample.count() >= kCodes.toLong * 4) pqSample
      else boundedSlice(assigned)
    val rekeyed = pqView
      .withColumn("rid", row_number().over(
        Window.orderBy($"vec_id")).cast("long") - 1)
      .select($"rid".as("vec_id"), $"rv")
    val codebook = Pq.pqTrain(rekeyed, m, dim, kCodes, iters, vecCol = "rv")
    // cell rides through the encode as a pass-through group key: the
    // previous join-back to `assigned` re-executed the coarse-assignment
    // lineage a second time just to recover the cell column
    val codes = Pq.pqEncode(
      assigned.select($"vec_id", $"cell", $"rv"), codebook, m, dim,
      vecCol = "rv", passThrough = Seq("cell"))
      .select($"vec_id", $"sub", $"code", $"cell")
    codes.write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(s"$dir/codes")
    centroids.write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
    codebook.write.mode(SaveMode.Overwrite).parquet(s"$dir/codebook")
    // geometry rides with the index: search must slice queries exactly the
    // way the codes were built, so (m, dim) are index facts, not caller
    // arguments (a mismatched caller guess silently NULLs every distance
    // through zip_with's length padding)
    Seq((m, dim, nCells)).toDF("m", "dim", "n_cells")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/meta")
    nCells
  }

  /** Incremental index maintenance at full compression — [[IvfIndex.append]]'s
    * contract for the PQ tier: each new vector is assigned to its nearest
    * FROZEN centroid (broadcast + min_by partial agg, one shuffled row per
    * vector), its residual encoded with the FROZEN codebook, and the m
    * code rows appended under the cell directory. Serving picks up
    * old + new immediately — still code-only I/O, same partition pruning,
    * no retraining. Codebook/centroid staleness under distribution drift
    * is the same monitored-rebuild decision as the coarse tier: watch the
    * assignment-distance profile of appended batches. Returns the number
    * of vectors appended. */
  def append(spark: SparkSession, dir: String, embeddings: DataFrame): Long = {
    encode(spark, dir, embeddings)
      .write.mode(SaveMode.Append).partitionBy("cell").parquet(s"$dir/codes")
    embeddings.count()
  }

  /** Frozen-model encode of a vector batch to (vec_id, sub, code, cell)
    * rows — the shared core of [[append]] and [[appendSegment]]. */
  private def encode(spark: SparkSession, dir: String,
      embeddings: DataFrame): DataFrame = {
    import spark.implicits._
    val meta = spark.read.parquet(s"$dir/meta").select("m", "dim").head()
    val (m, dim) = (meta.getInt(0), meta.getInt(1))
    val centroids = spark.read.parquet(s"$dir/centroids")
    val codebook = spark.read.parquet(s"$dir/codebook")
    val assigned = embeddings
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .crossJoin(broadcast(centroids))
      .select($"vec_id", $"v", $"cell", $"cvec",
        VectorOps.l2sq($"v", $"cvec").as("cdist"))
      .groupBy($"vec_id")
      .agg(min_by(struct($"cell", $"v", $"cvec"), struct($"cdist", $"cell")).as("best"))
      .select($"vec_id", $"best.cell".as("cell"),
        zip_with($"best.v", $"best.cvec", (a, b) => a - b).as("rv"))
    Pq.pqEncode(assigned.select($"vec_id", $"cell", $"rv"), codebook, m, dim,
        vecCol = "rv", passThrough = Seq("cell"))
      .select($"vec_id", $"sub", $"code", $"cell")
  }

  /** Commit one micro-batch of vectors as a SEALED SEGMENT of PQ codes —
    * [[IvfIndex.appendSegment]]'s exactly-once contract extended to the
    * compressed tier (r9 directive): the batch is encoded with the FROZEN
    * coarse centroids + codebook and written under `<dir>/segments/b<id>`,
    * cell-partitioned like the base `codes` root, so probe-time partition
    * pruning covers segments identically. Committed iff `_SUCCESS`
    * dropped; a replayed committed batch is skipped (zero work, zero
    * duplicate code rows), a crashed half-write is overwritten in place —
    * [[graft.IvfPqIndexSpec]] replays a lost-checkpoint restart and counts. */
  def appendSegment(spark: SparkSession, dir: String, batch: DataFrame,
      batchId: Long): Boolean = {
    if (!Segments.needsCommit(spark, dir, batchId)) return false
    if (batch.isEmpty) return false // nothing to seal; no empty roots
    encode(spark, dir, batch)
      .write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(Segments.segmentRoot(dir, batchId))
    true
  }

  /** The SERVED code table: base codes plus every committed streamed
    * segment (numeric-batchId order, folded segments excluded). */
  def indexFrame(spark: SparkSession, dir: String): DataFrame =
    Segments.frame(spark, dir, "codes")

  /** Fold committed code segments into the base `codes` root — the same
    * result-checked, manifest-guarded swap as [[IvfIndex.compactSegments]]
    * (see [[Segments.compact]]). Returns the number folded. */
  def compactSegments(spark: SparkSession, dir: String): Int =
    Segments.compact(spark, dir, "codes", (df, path) =>
      df.write.mode(SaveMode.Overwrite).partitionBy("cell").parquet(path))

  /** Continuous compressed-index ingest — [[IvfIndex.appendStream]]'s
    * contract on the PQ tier: each micro-batch encodes against the frozen
    * models (read inside foreachBatch, so a rebuilt quantizer is picked up
    * without restarting the query) and commits as a sealed segment.
    * EXACTLY-ONCE on the served code table via the segment protocol;
    * compaction stays a throughput knob, never a correctness crutch. */
  def appendStream(spark: SparkSession, dir: String, stream: DataFrame,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        appendSegment(spark, dir, batch.toDF(), batchId); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** ADC top-k per query over the persisted index. `queries` needs
    * (qid, qv); returns (qid, nid, rank, ad) where `ad` approximates the
    * squared L2 distance. */
  def search(spark: SparkSession, dir: String, queries: DataFrame,
      topK: Int = 10, nProbe: Int = 4): DataFrame = {
    import spark.implicits._
    val meta = spark.read.parquet(s"$dir/meta").select("m", "dim").head()
    val (m, dim) = (meta.getInt(0), meta.getInt(1))
    val ds = dim / m
    val centroids = spark.read.parquet(s"$dir/centroids")
    val codebook = spark.read.parquet(s"$dir/codebook")
    val cdist = VectorOps.l2sq($"qv".cast("array<double>"), $"cvec")
    val probeW = Window.partitionBy($"qid").orderBy($"cd", $"cell")
    val probes = queries.crossJoin(broadcast(centroids))
      .select($"qid", $"qv", $"cell", $"cvec", cdist.as("cd"))
      .withColumn("pr", row_number().over(probeW))
      .filter($"pr" <= nProbe)
      .select($"qid", $"cell",
        zip_with($"qv".cast("array<double>"), $"cvec", (a, b) => a - b).as("rq"))
    // per-(query, cell) residual distance tables: nQ·nProbe·m·k rows
    val qsub = probes.select($"qid", $"cell",
        explode(array((0 until m).map(s =>
          struct(lit(s).as("sub"), slice($"rq", s * ds + 1, ds).as("sv"))): _*)).as("t"))
      .select($"qid", $"cell", $"t.sub".as("sub"), $"t.sv".as("sv"))
    val d2 = VectorOps.l2sq($"sv", $"c") // native fused loop, bit-equal to the HOF fold
    val dtab = qsub.join(codebook, Seq("sub"))
      .select($"qid", $"cell", $"sub", $"cluster".as("code"),
        (floor(d2 * lit(1e6) + lit(0.5)) / 1e6).as("qd"))
    // the probed-cell read: joining the partition column against the tiny
    // broadcast table prunes cell directories instead of scanning the
    // index; streamed segments are included — each is cell-partitioned,
    // so the same pruning reaches them
    val codes = indexFrame(spark, dir)
    val rankW = Window.partitionBy($"qid").orderBy($"ad", $"nid")
    codes.select($"vec_id".as("nid"), $"cell", $"sub", $"code")
      .join(broadcast(dtab), Seq("cell", "sub", "code"))
      .groupBy($"qid", $"nid")
      .agg(sum($"qd").as("ad0"))
      .select($"qid", $"nid", (floor($"ad0" * lit(1e6) + lit(0.5)) / 1e6).as("ad"))
      .withColumn("rank", row_number().over(rankW))
      .filter($"rank" <= topK)
      .select($"qid", $"nid", $"rank", $"ad")
      .orderBy($"qid", $"rank")
  }

  /** Two-stage production search: ADC shortlist of `candidates` per query
    * (compressed domain, code-only I/O), then EXACT re-ranking of just
    * that shortlist against the float corpus — the standard quality
    * recovery for PQ's quantization error. The re-rank join touches
    * `queries × candidates` corpus rows (a semi-join-sized point lookup,
    * broadcast of bare (qid, nid) pairs — never vectors), so the float
    * read is ∝ the shortlist, not the corpus: PQ still did its job. */
  def searchRerank(spark: SparkSession, dir: String, queries: DataFrame,
      corpus: DataFrame, topK: Int = 10, candidates: Int = 50,
      nProbe: Int = 4): DataFrame = {
    import spark.implicits._
    val shortlist = search(spark, dir, queries, topK = candidates, nProbe)
      .select($"qid", $"nid")
    val d2 = VectorOps.l2sq($"qv".cast("array<double>"), $"nv".cast("array<double>"))
    val w = Window.partitionBy($"qid").orderBy($"d", $"nid")
    broadcast(shortlist)
      .join(queries.select($"qid", $"qv"), Seq("qid"))
      .join(corpus.select($"vec_id".as("nid"), $"embedding".as("nv")), Seq("nid"))
      .select($"qid", $"nid",
        (floor(d2 * lit(1e6) + lit(0.5)) / 1e6).as("d"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= topK)
      .select($"qid", $"nid", $"rank", $"d")
      .orderBy($"qid", $"rank")
  }
}
