package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, Similarity}

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = java.nio.file.Files.createTempDirectory("ivfindex").toString
  private lazy val emb = graft.core.Tables.embeddings(spark, sf0001)
  private lazy val nCells = IvfIndex.build(spark, emb, dir)

  test("build persists cell-partitioned corpus + centroids") {
    assert(nCells == 16)
    val cellDirs = new java.io.File(s"$dir/cells").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty && cellDirs.length <= 16)
    val back = spark.read.parquet(s"$dir/cells")
    assert(back.count() == emb.count())
    assert(spark.read.parquet(s"$dir/centroids").count() == 16)
  }

  test("search equals the one-shot ivfTopK on the same quantizer seed") {
    nCells // force build
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val fromIndex = IvfIndex.search(spark, dir, queries, k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val oneShot = Similarity.ivfTopK(spark, emb, k = 5, nProbe = 2, nQueries = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(fromIndex == oneShot,
      s"index-served results diverge: ${fromIndex.diff(oneShot)} vs ${oneShot.diff(fromIndex)}")
  }

  test("search prunes cell partitions (DPP reaches the index scan)") {
    nCells // force build
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val plan = IvfIndex.search(spark, dir, queries, k = 5, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("PartitionFilters: [isnotnull(cell"),
      s"cells scan should carry a partition filter:\n$plan")
  }

  test("append: frozen-centroid assignment replays exactly; new vectors served") {
    val adir = java.nio.file.Files.createTempDirectory("ivfappend").toString
    val base = emb.filter($"vec_id" < 300)
    val extra = emb.filter($"vec_id" >= 300 && $"vec_id" < 360)
    IvfIndex.build(spark, base, adir)
    val n = IvfIndex.append(spark, adir, extra)
    assert(n == extra.count())
    val back = spark.read.parquet(s"$adir/cells")
    assert(back.count() == base.count() + extra.count())
    // independent replay: driver-side argmin over the persisted centroids,
    // same summation order as the l2sq fold, same (dist, cell) tie-break
    val cents = spark.read.parquet(s"$adir/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val expected = extra.collect().map { r =>
      val v = r.getSeq[Float](1).toArray
      val best = cents.minBy { case (c, cv) =>
        (cv.zip(v).map { case (a, b) =>
          val d = b.toDouble - a.toDouble; d * d }.sum, c) }._1
      r.getLong(0) -> best
    }.toMap
    val got = back.filter($"vec_id" >= 300).select($"vec_id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expected)
    // appended vectors are immediately searchable through the same index
    val q = extra.filter($"vec_id" === 300)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val res = IvfIndex.search(spark, adir, q, k = 3, nProbe = 2).collect()
    assert(res.nonEmpty && res.forall(_.getInt(2) <= 3))
  }

  test("appendStream: micro-batched ingest lands in the same cells as batch append") {
    val adir = java.nio.file.Files.createTempDirectory("ivfstream").toString
    val srcDir = java.nio.file.Files.createTempDirectory("ivfstream_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ivfstream_ckpt").toString
    val base = emb.filter($"vec_id" < 300)
    val extra = emb.filter($"vec_id" >= 300 && $"vec_id" < 360)
    IvfIndex.build(spark, base, adir)
    extra.write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(extra.schema).parquet(srcDir)
    val q = IvfIndex.appendStream(spark, adir, stream, ckpt)
    q.awaitTermination()
    val back = IvfIndex.indexFrame(spark, adir)
    assert(back.count() == base.count() + extra.count())
    // streamed assignments must equal the deterministic batch-append ones
    val bdir = java.nio.file.Files.createTempDirectory("ivfbatch").toString
    IvfIndex.build(spark, base, bdir)
    IvfIndex.append(spark, bdir, extra)
    def cellsOf(df: org.apache.spark.sql.DataFrame) = df
      .filter($"vec_id" >= 300).select($"vec_id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cellsOf(IvfIndex.indexFrame(spark, adir)) ==
      cellsOf(spark.read.parquet(s"$bdir/cells")))

    // RESTART REPLAY (r8 directive): lose the checkpoint entirely — the
    // rerun reprocesses the same input as batch 0 again. The committed
    // segment b0's _SUCCESS probe must skip it: zero duplicate rows,
    // with NO dedup pass anywhere in the read path.
    deleteRecursively(new java.io.File(ckpt))
    val q2 = IvfIndex.appendStream(spark, adir,
      spark.readStream.schema(extra.schema).parquet(srcDir), ckpt)
    q2.awaitTermination()
    assert(IvfIndex.indexFrame(spark, adir).count() == base.count() + extra.count(),
      "a replayed batch must not duplicate index rows")
    // searched results include streamed vectors (served through segments)
    val sq = extra.filter($"vec_id" === 300)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    assert(IvfIndex.search(spark, adir, sq, k = 3, nProbe = 2).collect().nonEmpty)
  }

  test("appendSegment: committed batch skipped on replay; crashed write overwritten") {
    val adir = java.nio.file.Files.createTempDirectory("ivfseg").toString
    val base = emb.filter($"vec_id" < 200)
    val extra = emb.filter($"vec_id" >= 200 && $"vec_id" < 240)
    IvfIndex.build(spark, base, adir)
    assert(IvfIndex.appendSegment(spark, adir, extra, batchId = 7L))
    val n1 = IvfIndex.indexFrame(spark, adir).count()
    assert(n1 == base.count() + extra.count())
    // replay of a COMMITTED batch: skipped, count unchanged
    assert(!IvfIndex.appendSegment(spark, adir, extra, batchId = 7L))
    assert(IvfIndex.indexFrame(spark, adir).count() == n1)
    // crashed mid-write: simulate by removing _SUCCESS — replay rewrites
    // the segment in place, still no duplicates
    val succ = new java.io.File(s"$adir/segments/b7/_SUCCESS")
    assert(succ.delete())
    assert(IvfIndex.appendSegment(spark, adir, extra, batchId = 7L))
    assert(IvfIndex.indexFrame(spark, adir).count() == n1)
    // compaction folds segments into the base and drops them; the served
    // corpus is unchanged and future indexFrame reads one root
    assert(IvfIndex.compactSegments(spark, adir) == 1)
    assert(!new java.io.File(s"$adir/segments/b7").exists())
    assert(spark.read.parquet(s"$adir/cells").count() == n1)
    assert(IvfIndex.compactSegments(spark, adir) == 0)
  }

  test("segments list numerically (b2 before b10); _folded manifest excludes absorbed segments") {
    val adir = java.nio.file.Files.createTempDirectory("ivfseg2").toString
    val base = emb.filter($"vec_id" < 200)
    val e1 = emb.filter($"vec_id" >= 200 && $"vec_id" < 220)
    val e2 = emb.filter($"vec_id" >= 220 && $"vec_id" < 240)
    IvfIndex.build(spark, base, adir)
    assert(IvfIndex.appendSegment(spark, adir, e1, batchId = 2L))
    assert(IvfIndex.appendSegment(spark, adir, e2, batchId = 10L))
    // ADVICE r9: lexicographic path order puts b10 before b2 — the
    // oldest-first contract must sort on the NUMERIC batch id
    val segs = IvfIndex.sealedSegments(spark, adir)
    assert(segs.map(s => s.substring(s.lastIndexOf('/') + 1)) == Seq("b2", "b10"), segs.toString)
    // simulate a compaction that crashed AFTER the swap but BEFORE segment
    // deletion: b2's rows are already in the base (frozen assignment is
    // deterministic, so append() lands them identically) and the manifest
    // names it — the reader must NOT serve b2's rows twice
    IvfIndex.append(spark, adir, e1)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$adir/cells/_folded"), "2\n".getBytes("UTF-8"))
    val expect = base.count() + e1.count() + e2.count()
    assert(IvfIndex.indexFrame(spark, adir).count() == expect,
      "manifested segment must be excluded from the served corpus")
    // the next compaction finishes the crashed cleanup (deletes b2) and
    // folds the remaining b10; nothing is lost, nothing double-counted
    assert(IvfIndex.compactSegments(spark, adir) == 1)
    assert(!new java.io.File(s"$adir/segments/b2").exists())
    assert(!new java.io.File(s"$adir/segments/b10").exists())
    assert(!new java.io.File(s"$adir/cells/_folded").exists())
    assert(spark.read.parquet(s"$adir/cells").count() == expect)
    assert(IvfIndex.compactSegments(spark, adir) == 0)
  }

  test("mid-swap crash heals: roll forward with manifested tmp, roll back without (ADVICE r10)") {
    val adir = java.nio.file.Files.createTempDirectory("ivfheal").toString
    val base = emb.filter($"vec_id" < 200)
    val e1 = emb.filter($"vec_id" >= 200 && $"vec_id" < 220)
    IvfIndex.build(spark, base, adir)
    assert(IvfIndex.appendSegment(spark, adir, e1, batchId = 3L))
    val expect = base.count() + e1.count()

    // ROLL FORWARD: crash after rename(base→old), before rename(tmp→base),
    // with the merge COMPLETE (tmp carries the _folded manifest — it is
    // written strictly before the swap starts). Stage the exact on-disk
    // state: a fully-merged tmp + manifest, base moved aside, segment still
    // on disk.
    val tmp = new java.io.File(s"$adir/cells_compact_tmp")
    IvfIndex.indexFrame(spark, adir).write.mode("overwrite")
      .partitionBy("cell").parquet(tmp.toString)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$adir/cells_compact_tmp/_folded"), "3\n".getBytes("UTF-8"))
    assert(new java.io.File(s"$adir/cells").renameTo(new java.io.File(s"$adir/cells_old")))
    // the next read heals by installing the merged tmp; no duplicates (the
    // healed base's manifest excludes b3), nothing lost
    assert(IvfIndex.indexFrame(spark, adir).count() == expect,
      "roll-forward heal must serve the merged corpus exactly once")
    assert(new java.io.File(s"$adir/cells").exists())
    assert(!new java.io.File(s"$adir/cells_old").exists())
    assert(!tmp.exists())
    // the next compaction finishes the crashed cleanup (deletes b3)
    assert(IvfIndex.compactSegments(spark, adir) == 0)
    assert(!new java.io.File(s"$adir/segments/b3").exists())
    assert(IvfIndex.indexFrame(spark, adir).count() == expect)

    // ROLL BACK: crash after rename(base→old) with an INCOMPLETE merge
    // (tmp exists but has no manifest) — heal restores the old base and
    // discards the partial tmp; the served corpus is exactly pre-call.
    assert(IvfIndex.appendSegment(spark, adir, e1.withColumn("vec_id", $"vec_id" + 1000), batchId = 4L))
    val expect2 = expect + e1.count()
    assert(new java.io.File(s"$adir/cells").renameTo(new java.io.File(s"$adir/cells_old")))
    assert(tmp.mkdirs()) // partial merge: no _folded inside
    assert(IvfIndex.indexFrame(spark, adir).count() == expect2,
      "roll-back heal must restore the old base with segments intact")
    assert(new java.io.File(s"$adir/cells").exists())
    assert(!new java.io.File(s"$adir/cells_old").exists())
    assert(!tmp.exists())
    assert(IvfIndex.compactSegments(spark, adir) == 1)
    assert(IvfIndex.indexFrame(spark, adir).count() == expect2)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete(); ()
  }
}
