package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sealed-segment layout shared by [[IvfIndex]] (float cells) and
  * [[IvfPqIndex]] (PQ codes) — the exactly-once unit of streaming index
  * ingest plus its crash-safe compaction.
  *
  * Layout under an index root `dir`:
  *  - `<dir>/<base>`          — the build-time corpus (cell-partitioned)
  *  - `<dir>/segments/b<id>`  — one sealed micro-batch per batchId,
  *    committed iff the Spark write dropped `_SUCCESS`
  *  - `<dir>/<base>/_folded`  — crash-recovery manifest: batchIds already
  *    merged into `<base>` whose segment directories may still exist
  *    (underscore-prefixed, so parquet readers ignore it)
  *
  * Replay safety (per segment): a committed batchId is skipped by the
  * `_SUCCESS` probe; a crashed half-write has no `_SUCCESS` and is
  * overwritten in place. Compaction safety (r10, ADVICE): Hadoop rename
  * FAILS BY RETURNING FALSE, not by throwing — every rename result is
  * checked, and an aborted swap leaves the committed segments intact
  * instead of deleting rows the new root never received. A crash between
  * the swap and the segment deletion cannot serve duplicates either: the
  * new root carries the `_folded` manifest of the batchIds it absorbed,
  * readers exclude exactly those segments, and the next compaction
  * finishes the deletion before folding anything new. A crash BETWEEN the
  * two swap renames (base moved aside, merged root not yet installed) is
  * healed at the next `frame()`/`compact()` entry (r11, ADVICE): the
  * in-tmp manifest proves the merge completed, so heal rolls the swap
  * forward; a manifest-less tmp rolls back to the preserved old base.
  */
private[operators] object Segments {

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Numeric batchId of a segment root path `.../segments/b<id>` —
    * lexicographic order breaks at b10 < b2 (ADVICE), so every consumer
    * that promises "oldest first" sorts on this instead. */
  private def batchIdOf(p: Path): Long = p.getName.stripPrefix("b").toLong

  private def manifestPath(dir: String, base: String): Path =
    new Path(s"$dir/$base/_folded")

  /** batchIds recorded as already folded into `<base>` (empty when no
    * compaction crashed mid-cleanup). */
  private def foldedIds(fs: FileSystem, dir: String, base: String): Set[Long] = {
    val m = manifestPath(dir, base)
    if (!fs.exists(m)) Set.empty
    else {
      val in = fs.open(m)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty).map(_.toLong).toSet
      finally in.close()
    }
  }

  private def writeManifest(fs: FileSystem, at: Path, ids: Set[Long]): Unit = {
    val out = fs.create(at, true)
    try out.write((ids.toSeq.sorted.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Roots of every COMMITTED, not-yet-folded streamed segment, oldest
    * first in NUMERIC batchId order. */
  def sealedRoots(spark: SparkSession, dir: String, base: String): Seq[String] = {
    val fs = fsOf(spark, dir)
    val root = new Path(s"$dir/segments")
    if (!fs.exists(root)) Nil
    else {
      val folded = foldedIds(fs, dir, base)
      fs.listStatus(root).toIndexedSeq
        .filter(s => s.isDirectory && fs.exists(new Path(s.getPath, "_SUCCESS")))
        .filterNot(s => folded.contains(batchIdOf(s.getPath)))
        .sortBy(s => batchIdOf(s.getPath))
        .map(_.getPath.toString)
    }
  }

  /** True iff batchId needs writing: false when a prior commit COMPLETED
    * (the `_SUCCESS` probe — replay skips it with zero work). A crashed
    * half-write has no `_SUCCESS`, so the caller's Overwrite write
    * replaces it in place. */
  def needsCommit(spark: SparkSession, dir: String, batchId: Long): Boolean =
    !fsOf(spark, dir).exists(new Path(s"$dir/segments/b$batchId/_SUCCESS"))

  def segmentRoot(dir: String, batchId: Long): String = s"$dir/segments/b$batchId"

  /** Finish (or roll back) a compaction swap that crashed BETWEEN the two
    * renames (r10 ADVICE, medium): after rename(base→old) and before
    * rename(tmp→base) there is no base dir — readers would throw
    * PATH_NOT_FOUND and the next compact() would delete the fully-merged
    * tmp before failing the same way, destroying the only merged copy. The
    * manifest is written INSIDE tmp strictly before the swap starts, so:
    *  - tmp carrying `_folded` ⇒ the merge write completed ⇒ roll FORWARD
    *    (install tmp as the base; the old base is absorbed in it);
    *  - otherwise an existing `_old` ⇒ roll BACK (restore it; a tmp
    *    without a manifest is an incomplete merge and is deleted).
    * Idempotent and cheap (three existence probes when the base is fine),
    * called at both [[frame]] and [[compact]] entry. */
  private def heal(fs: FileSystem, dir: String, base: String): Unit = {
    val basePath = new Path(s"$dir/$base")
    if (fs.exists(basePath)) return
    val tmp = new Path(s"$dir/${base}_compact_tmp")
    val old = new Path(s"$dir/${base}_old")
    if (fs.exists(new Path(tmp, "_folded"))) {
      require(fs.rename(tmp, basePath),
        s"heal: cannot install merged corpus $tmp as $basePath — recover manually")
      fs.delete(old, true) // absorbed by the merged corpus
    } else if (fs.exists(old)) {
      require(fs.rename(old, basePath),
        s"heal: cannot restore $old as $basePath — recover manually")
      fs.delete(tmp, true) // no manifest ⇒ incomplete merge
    }
    // neither: nothing to heal — the caller fails naturally on the missing base
  }

  /** The SERVED corpus: the base root plus every committed, unfolded
    * segment. Roots are read separately and unioned — one multi-path read
    * trips Spark's common-base-path partition discovery
    * (CONFLICTING_DIRECTORY_STRUCTURES); each branch keeps its own
    * cell-partitioned scan, so probe-time cell filters prune per branch. */
  def frame(spark: SparkSession, dir: String, base: String): DataFrame = {
    heal(fsOf(spark, dir), dir, base)
    frameOf(spark, dir, base, sealedRoots(spark, dir, base))
  }

  /** [[frame]] over an ALREADY-LISTED segment set — compact() merges
    * exactly the roots it will record in the manifest (ADVICE r10): a
    * segment committed between the listing and the merge read must NOT be
    * folded, or the installed base would contain rows the manifest does
    * not exclude — served twice until the next compaction. */
  private def frameOf(spark: SparkSession, dir: String, base: String,
      segRoots: Seq[String]): DataFrame =
    (Seq(s"$dir/$base") ++ segRoots)
      .map(spark.read.parquet(_)).reduce(_ unionByName _)

  /** Fold committed segments into the base root. `write(df, path)` is the
    * caller's partitioned parquet write (Overwrite). Returns the number of
    * segments folded this call. Abort-safe per the object scaladoc: a
    * failed rename throws AFTER restoring the old base, with all segments
    * still on disk; a crash after the swap is finished by the next call. */
  def compact(spark: SparkSession, dir: String, base: String,
      write: (DataFrame, String) => Unit): Int = {
    val fs = fsOf(spark, dir)
    heal(fs, dir, base)
    // finish a crashed predecessor: manifested batchIds are already in the
    // base (readers exclude them) — delete their leftover segment dirs,
    // then clear the manifest
    val prior = foldedIds(fs, dir, base)
    if (prior.nonEmpty) {
      val root = new Path(s"$dir/segments")
      if (fs.exists(root))
        fs.listStatus(root).toIndexedSeq
          .filter(s => prior.contains(batchIdOf(s.getPath)))
          .foreach { s =>
            require(fs.delete(s.getPath, true) || !fs.exists(s.getPath),
              s"cannot delete already-folded segment ${s.getPath}")
          }
      require(fs.delete(manifestPath(dir, base), false),
        s"cannot clear folded-batch manifest under $dir/$base")
    }
    val segs = sealedRoots(spark, dir, base)
    if (segs.isEmpty) return 0
    val tmpStr = s"$dir/${base}_compact_tmp"
    val tmp = new Path(tmpStr)
    fs.delete(tmp, true)
    // merge exactly `segs` (frameOf, not frame): a segment committed after
    // the listing stays unfolded and served from its own root — folding it
    // without a manifest entry would serve its rows twice after the swap
    write(frameOf(spark, dir, base, segs), tmpStr)
    // the manifest rides INSIDE the new root, written before the swap: the
    // moment the swap lands, readers know which segments it absorbed
    writeManifest(fs, new Path(tmp, "_folded"),
      segs.map(p => batchIdOf(new Path(p))).toSet)
    val basePath = new Path(s"$dir/$base")
    val old = new Path(s"$dir/${base}_old")
    fs.delete(old, true)
    if (!fs.rename(basePath, old)) {
      fs.delete(tmp, true)
      throw new IllegalStateException(
        s"compaction aborted: cannot move $basePath aside; base and segments left intact")
    }
    if (!fs.rename(tmp, basePath)) {
      // restore the old base before failing — segments are still on disk,
      // so the served corpus is exactly what it was before the call
      if (!fs.rename(old, basePath)) throw new IllegalStateException(
        s"compaction swap failed AND the old base could not be restored — " +
          s"recover manually: old base at $old, merged corpus at $tmpStr")
      fs.delete(tmp, true)
      throw new IllegalStateException(
        s"compaction aborted: cannot install merged corpus at $basePath; old base restored")
    }
    // swap durable: duplicates are impossible from here (manifest). Delete
    // folded segments + the old base; clear the manifest only once every
    // folded dir is verifiably gone, else leave it for the next call.
    val allGone = segs.forall { s =>
      val p = new Path(s); fs.delete(p, true) || !fs.exists(p)
    }
    fs.delete(old, true)
    if (allGone) fs.delete(manifestPath(dir, base), false)
    segs.length
  }
}
