package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Persisted IVF index — the production build/search split that
  * [[Similarity.ivfTopK]] (one-shot, recompute-everything) deliberately is
  * not. The 100 TB ANN shape is: pay the quantizer + assignment cost ONCE,
  * write the corpus partitioned by cell, then serve every query batch by
  * reading ONLY the probed cells.
  *
  *  - `build`: k-means coarse quantizer trained on a sample (the driver
  *    never sees the corpus — MLlib trains distributed; sampling bounds
  *    iteration cost), one map pass to assign cells, then a write
  *    `partitionBy("cell")` — each cell becomes a parquet directory.
  *  - `search`: probes = the `nProbe` nearest centroids per query
  *    (centroids table is O(nCells), broadcast); the corpus read carries
  *    `cell IN (probed)` which Spark turns into PARTITION PRUNING — the
  *    scan touches only probed cell directories (`PartitionFilters` in the
  *    plan, asserted by `IvfIndexSpec`), i.e. I/O ∝ nProbe/nCells of the
  *    corpus instead of a full scan per query batch.
  *
  * Centroids are persisted next to the cells, so search needs no model
  * object — any session (or engine) can serve the index from the files.
  */
object IvfIndex {

  /** Train quantizer, assign cells, persist `<dir>/cells` (partitioned by
    * cell) + `<dir>/centroids`. Returns the cell count actually written. */
  def build(spark: SparkSession, embeddings: DataFrame, dir: String,
      nCells: Int = 16, trainFraction: Double = 0.25): Int = {
    import spark.implicits._
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feat = embeddings.select($"vec_id", $"embedding",
      array_to_vector($"embedding").as("fv"))
    val sample = feat.sample(withReplacement = false, trainFraction, seed = 42)
    val train = if (sample.count() >= nCells.toLong * 4) sample else feat
    val model = new KMeans().setK(nCells).setSeed(42)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(train)
    model.transform(feat)
      .select($"vec_id", $"embedding", $"cell")
      .write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(s"$dir/cells")
    model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }.toSeq
      .toDF("cell", "cvec")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
    model.clusterCenters.length
  }

  /** Incremental index maintenance: add vectors to a persisted index
    * WITHOUT retraining. Each new vector is assigned to its nearest
    * EXISTING centroid (the quantizer is frozen — cells, probing, and
    * partition pruning are unchanged) and appended as new files under its
    * cell directory; search serves old + new immediately with no
    * model object and no rebuild. This is the standing contract of IVF
    * serving at corpus scale: ingest is a pure append, and the quantizer
    * only goes stale if the DATA DISTRIBUTION drifts — monitor the
    * assignment-distance profile of appended batches against the build's
    * (e.g. via `Sketches.histogramQuantiles` on `cdist`) and rebuild when
    * it degrades, exactly the Curation split-drift discipline applied to
    * the vector space.
    *
    * Scale shape: centroids broadcast (O(nCells) rows); the ×nCells
    * candidate fan-out collapses MAP-SIDE via min_by partial aggregation
    * — the one shuffle carries a single row per appended vector, and the
    * corpus already in the index is never read or rewritten. Ties break
    * by lowest cell id (struct ordering), matching MLlib's first-minimum
    * transform. Returns the number of vectors appended. */
  def append(spark: SparkSession, dir: String, embeddings: DataFrame): Long = {
    assign(spark, dir, embeddings)
      .write.mode(SaveMode.Append).partitionBy("cell").parquet(s"$dir/cells")
    embeddings.count()
  }

  /** Frozen-quantizer assignment of a vector batch to its nearest existing
    * cell — the shared core of [[append]] and [[appendSegment]]. */
  private def assign(spark: SparkSession, dir: String,
      embeddings: DataFrame): DataFrame = {
    import spark.implicits._
    val centroids = spark.read.parquet(s"$dir/centroids")
    embeddings.select($"vec_id", $"embedding")
      .crossJoin(broadcast(centroids))
      .select($"vec_id", $"embedding", $"cell",
        VectorOps.l2sq($"embedding", $"cvec").as("cdist"))
      .groupBy($"vec_id")
      .agg(min_by(struct($"cell", $"embedding"), struct($"cdist", $"cell")).as("best"))
      .select($"vec_id", $"best.embedding".as("embedding"), $"best.cell".as("cell"))
  }

  /** Commit one micro-batch of vectors as a SEALED SEGMENT — the
    * idempotent unit of streaming ingest (r8 directive: the
    * `cdcSnapshotSink` write-new-then-swap discipline applied to the
    * index). The batch is assigned to frozen cells and written under the
    * batchId-named directory `<dir>/segments/b<id>`, itself partitioned
    * by cell, so probe-time partition pruning covers segments exactly as
    * it covers the base. A segment is COMMITTED iff the Spark write
    * finished and dropped `_SUCCESS`; readers ([[indexFrame]]) include
    * only committed segments, so a half-written segment is invisible.
    *
    * Replay safety without any dedup pass:
    *  - replayed batch, prior commit COMPLETE → the `_SUCCESS` probe
    *    skips it (returns false, zero work, zero duplicates);
    *  - replayed batch, prior attempt CRASHED mid-write → no `_SUCCESS`,
    *    so the Overwrite rewrite replaces the partial files in place.
    * Either way the segment holds the batch's rows exactly once. */
  def appendSegment(spark: SparkSession, dir: String, batch: DataFrame,
      batchId: Long): Boolean = {
    if (!Segments.needsCommit(spark, dir, batchId)) return false
    if (batch.isEmpty) return false // nothing to seal; no empty roots
    assign(spark, dir, batch)
      .write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(Segments.segmentRoot(dir, batchId))
    true
  }

  /** Roots of every COMMITTED streamed segment, oldest first in NUMERIC
    * batchId order (lexicographic order broke at b10 < b2 — ADVICE r9). */
  private[graft] def sealedSegments(spark: SparkSession, dir: String): Seq[String] =
    Segments.sealedRoots(spark, dir, "cells")

  /** The SERVED corpus: build-time cells plus every committed streamed
    * segment — see [[Segments.frame]] for the per-root scan rationale.
    * [[compactSegments]] periodically restores the single-root layout,
    * which also keeps the union width (planning cost) bounded. */
  def indexFrame(spark: SparkSession, dir: String): DataFrame =
    Segments.frame(spark, dir, "cells")

  /** Fold committed segments into the base cells directory (bounding the
    * root count that [[indexFrame]] unions — run at maintenance time,
    * like `Maintenance.compact`): write the merged corpus NEW, then swap
    * directories and drop the folded segments. The swap window is not
    * atomic for concurrent readers (two renames) — this is an offline
    * maintenance pass by contract, mirroring the snapshot discipline
    * rather than the pointer indirection it doesn't need. Every rename is
    * result-checked and a crashed cleanup is finished by the next call via
    * the `_folded` manifest (r10, ADVICE — see [[Segments.compact]]).
    * Returns the number of segments folded. */
  def compactSegments(spark: SparkSession, dir: String): Int =
    Segments.compact(spark, dir, "cells", (df, path) =>
      df.write.mode(SaveMode.Overwrite).partitionBy("cell").parquet(path))

  /** Continuous index ingest: the streaming face of [[append]] — each
    * micro-batch of an embeddings stream runs the same frozen-centroid
    * assignment and commits as a sealed segment ([[appendSegment]]), so
    * the served index trails the stream by one trigger. The centroid read
    * happens INSIDE foreachBatch (per batch): rebuilding the quantizer
    * between batches is picked up without restarting the query.
    *
    * Delivery contract: EXACTLY-ONCE on the served index. foreachBatch
    * replays are absorbed by the segment commit protocol — a committed
    * batchId is skipped, a half-written one is overwritten in place — so
    * no downstream dedup/compaction pass is needed for correctness
    * (`IvfIndexSpec` replays a batch after a simulated restart and counts
    * rows). [[compactSegments]] remains a throughput knob (bounding the
    * number of roots), not a correctness crutch. */
  def appendStream(spark: SparkSession, dir: String, stream: DataFrame,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        appendSegment(spark, dir, batch.toDF(), batchId); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Top-k cosine neighbors for each query vector, reading only probed
    * cells. `queries` needs (qid, qv) columns. */
  def search(spark: SparkSession, dir: String, queries: DataFrame,
      k: Int = 5, nProbe: Int = 2): DataFrame = {
    import spark.implicits._
    val centroids = spark.read.parquet(s"$dir/centroids")
    val probeW = Window.partitionBy($"qid").orderBy($"cdist", $"cell")
    val probes = queries
      .crossJoin(broadcast(centroids))
      .withColumn("cdist", VectorOps.l2sq($"qv", $"cvec"))
      .withColumn("pr", row_number().over(probeW))
      .filter($"pr" <= nProbe)
      .select($"qid", $"qv", $"cell")
    // The probed-cell set is tiny (≤ queries × nProbe distinct cells);
    // joining the partition column against it broadcast-style lets Spark
    // prune cell directories at planning/runtime (DPP) instead of
    // scanning the whole index. Streamed segments are included — each is
    // cell-partitioned, so the same pruning reaches them.
    val cells = indexFrame(spark, dir)
    val rankW = Window.partitionBy($"qid").orderBy(round($"cos", 6).desc, $"nid")
    probes.join(cells.select($"vec_id".as("nid"), $"embedding".as("nv"), $"cell"), Seq("cell"))
      .filter($"qid" =!= $"nid")
      .select($"qid", $"nid", VectorOps.cosine($"qv", $"nv").as("cos"))
      .withColumn("rank", row_number().over(rankW))
      .filter($"rank" <= k)
      .select($"qid", $"nid", $"rank", round($"cos", 4).as("cos"))
      .orderBy($"qid", $"rank")
  }
}
