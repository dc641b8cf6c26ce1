package graft

import org.apache.spark.sql.functions._
import graft.operators.IvfPqIndex

/** Persisted IVF-PQ: index layout, code-only serving, ADC recall against
  * exact search, probe monotonicity, and partition pruning. */
class IvfPqIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
  private lazy val emb = graft.core.Tables.embeddings(spark, sf0001)
  // Measured mean recall@10 on this corpus: 0.21 (m=2/k=8), 0.33
  // (m=4/k=16), 0.29 (m=8/k=16): the corpus is largely unstructured
  // noise — PQ's worst case, where neighbors are near-equidistant and
  // recall saturates at the distance-concentration limit instead of
  // tracking code bits. The corpus test therefore asserts the measured
  // noise-regime floor; the clustered-blob test below is where PQ must
  // genuinely reconstruct ranking.
  private lazy val nCells = IvfPqIndex.build(spark, emb, dir, nCells = 8,
    m = 4, dim = 64, kCodes = 16, iters = 3, trainFraction = 1.0)

  private def exactTopK(k: Int, nQ: Int): Map[Long, Set[Long]] = {
    val e = emb.select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val q = e.filter($"vec_id" < nQ).select($"vec_id".as("qid"), $"v".as("qv"))
    val d2 = aggregate(zip_with($"qv", $"nv", (a, b) => (a - b) * (a - b)),
      lit(0.0d), (acc, x) => acc + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"d", $"nid")
    q.crossJoin(e.select($"vec_id".as("nid"), $"v".as("nv")))
      .filter($"qid" =!= $"nid")
      .select($"qid", $"nid", d2.as("d"))
      .withColumn("rk", row_number().over(w)).filter($"rk" <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, g) => q -> g.map(_._2).toSet }
  }

  test("build persists code-only cells + the two model tables") {
    assert(nCells == 8)
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.count() == emb.count() * 4) // m rows per vector
    assert(codes.columns.sorted.toSeq == Seq("cell", "code", "sub", "vec_id"))
    // the serving payload really is code-only: no float vector column
    assert(!codes.columns.contains("embedding") && !codes.columns.contains("rv"))
    assert(spark.read.parquet(s"$dir/centroids").count() == 8)
    val cb = spark.read.parquet(s"$dir/codebook")
    assert(cb.count() <= 4 * 16 && cb.count() >= 4) // ≤ m·k centroids
  }

  test("ADC recall against exact L2 top-k; self is its own nearest match") {
    nCells // force build
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val got = IvfPqIndex.search(spark, dir, queries, topK = 10, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val byQ = got.groupBy(_._1).map { case (q, g) => q -> g.sortBy(_._3) }
    // full probe (nProbe = nCells) isolates pure PQ quantization error;
    // the query itself has the smallest reachable ADC distance (its own
    // centroid-code error) → TIED for best. Not necessarily rank 1: the
    // corpus has planted near-duplicates that share every code, and the
    // deterministic id tie-break can put a lower-id twin first.
    for ((q, ns) <- byQ) {
      val selfAd = ns.find(_._2 == q)
        .getOrElse(fail(s"query $q missing from its own results"))._4
      assert(selfAd == ns.head._4,
        s"query $q: self ad $selfAd above best ${ns.head._4} (nid ${ns.head._2})")
    }
    val exact = exactTopK(10, 10)
    val recalls = byQ.map { case (q, ns) =>
      (ns.map(_._2).toSet - q).intersect(exact(q)).size.toDouble / 10.0 }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.25, s"mean recall@10 $mean under full probe")
  }

  test("more probes only widen the candidate set (uncapped topK makes sets observable)") {
    nCells // force build
    val queries = emb.filter($"vec_id" < 6)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    // topK beyond the corpus size returns EVERY scored candidate, so the
    // result sets are exactly the probed-cell coverage — which IS monotone
    // (capped top-k sets are not: better far-cell candidates displace
    // near-cell ones, by design)
    def hits(nProbe: Int): Map[Long, Set[Long]] =
      IvfPqIndex.search(spark, dir, queries, topK = 100000, nProbe = nProbe)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, g) => q -> g.map(_._2).toSet }
    val one = hits(1); val all = hits(8)
    for ((q, ns) <- one) {
      assert(ns.subsetOf(all(q)), s"query $q lost ${ns.diff(all(q))} at full probe")
      assert(all(q).size > ns.size, s"query $q: full probe added no candidates")
    }
  }

  test("clustered data: ADC recovers within-blob neighbors (recall >= 0.8)") {
    // 4 well-separated prototypes x 16 deterministic small perturbations:
    // the regime PQ is built for. Every query's true top-10 lies inside
    // its blob; ADC over the persisted index must recover most of it.
    val blobDir = java.nio.file.Files.createTempDirectory("ivfpq_blob").toString
    val vecs = for (b <- 0 until 4; i <- 0 until 16) yield {
      val base = Array.tabulate(64)(d => if (d % 4 == b) 10.0f else 0.0f)
      ((b * 16 + i).toLong,
        base.zipWithIndex.map { case (x, d) => x + ((i * 7 + d * 3) % 5 - 2) * 0.05f })
    }
    val df = vecs.toDF("vec_id", "embedding")
    IvfPqIndex.build(spark, df, blobDir, nCells = 4, m = 4, dim = 64,
      kCodes = 4, iters = 3, trainFraction = 1.0)
    val queries = df.filter($"vec_id" % 16 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val got = IvfPqIndex.search(spark, blobDir, queries, topK = 10, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, g) => q -> g.map(_._2).toSet }
    val recalls = got.map { case (q, ns) =>
      val blob = (q / 16 * 16 until q / 16 * 16 + 16).toSet - q
      (ns - q).count(blob.contains).toDouble / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"blob recall@10 $mean")
  }

  test("exact re-ranking recovers what ADC quantization loses") {
    nCells // force build
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val reranked = IvfPqIndex.searchRerank(spark, dir, queries, emb,
      topK = 11, candidates = 100, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1).map { case (q, g) => q -> g.map(_._2).toSet }
    val exact = exactTopK(10, 10)
    // within the shortlist the re-rank ordering IS the exact ordering, so
    // recall is bounded only by shortlist coverage: measured 0.81 with a
    // 100-candidate shortlist on this noise-like corpus, vs 0.33 ADC-only
    // — the two-stage design recovers most of what quantization loses
    val recalls = reranked.map { case (q, ns) =>
      (ns - q).intersect(exact(q)).size.toDouble / 10.0 }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.7, s"mean rerank recall@10 $mean (ADC-only measured 0.33)")
    // and self is rank 1 outright: exact distance to self is 0, no tie
    val top1 = IvfPqIndex.searchRerank(spark, dir, queries, emb,
      topK = 1, candidates = 100, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    for ((q, n) <- top1) assert(n == q, s"query $q top-1 after rerank is $n")
  }

  test("search prunes cell partitions (the codes scan never reads unprobed cells)") {
    nCells // force build
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val plan = IvfPqIndex.search(spark, dir, queries, topK = 5, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("PartitionFilters: [isnotnull(cell"),
      s"codes scan should carry a partition filter:\n$plan")
  }

  test("append: frozen-model encode, assignment replay, appended self findable") {
    val adir = java.nio.file.Files.createTempDirectory("ivfpq_append").toString
    val base = emb.filter($"vec_id" < 300)
    val extra = emb.filter($"vec_id" >= 300 && $"vec_id" < 340)
    IvfPqIndex.build(spark, base, adir, nCells = 8, m = 4, dim = 64,
      kCodes = 16, iters = 3, trainFraction = 1.0)
    val n = IvfPqIndex.append(spark, adir, extra)
    assert(n == extra.count())
    val codes = spark.read.parquet(s"$adir/codes")
    assert(codes.count() == (base.count() + extra.count()) * 4) // m rows per vector
    // assignment replay: appended cells equal the driver-side argmin over
    // the persisted centroids (same fold order, same (dist, cell) tiebreak)
    val cents = spark.read.parquet(s"$adir/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val expected = extra.collect().map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      val best = cents.minBy { case (c, cv) =>
        (v.zip(cv).map { case (x, y) => val d = x - y; d * d }.sum, c) }._1
      r.getLong(0) -> best
    }.toMap
    val got = codes.filter($"vec_id" >= 300).select($"vec_id", $"cell").distinct()
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expected)
    // appended vectors serve immediately: querying with an appended vector
    // reaches its own code row at the minimal reachable ADC distance
    val qs = extra.filter($"vec_id" < 310)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val res = IvfPqIndex.search(spark, adir, qs, topK = 1000, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    for (q <- qs.collect().map(_.getLong(0))) {
      val ns = res.filter(_._1 == q)
      val selfAd = ns.find(_._2 == q).map(_._3)
      assert(selfAd.nonEmpty && selfAd.get == ns.map(_._3).min,
        s"appended query $q: self ad $selfAd above min ${ns.map(_._3).min}")
    }
  }

  test("streamed segments: restart replay appends zero duplicate code rows; compaction folds") {
    // r9 directive: the exactly-once segment commit extended to the PQ
    // tier — lose the checkpoint, replay the same input, and the served
    // code table must hold each vector's m code rows exactly once with NO
    // dedup pass anywhere in the read path.
    val adir = java.nio.file.Files.createTempDirectory("ivfpq_stream").toString
    val srcDir = java.nio.file.Files.createTempDirectory("ivfpq_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ivfpq_ckpt").toString
    val base = emb.filter($"vec_id" < 300)
    val extra = emb.filter($"vec_id" >= 300 && $"vec_id" < 340)
    IvfPqIndex.build(spark, base, adir, nCells = 8, m = 4, dim = 64,
      kCodes = 16, iters = 3, trainFraction = 1.0)
    extra.write.mode("overwrite").parquet(srcDir)
    val q1 = IvfPqIndex.appendStream(spark, adir,
      spark.readStream.schema(extra.schema).parquet(srcDir), ckpt)
    q1.awaitTermination()
    val expect = (base.count() + extra.count()) * 4 // m rows per vector
    assert(IvfPqIndex.indexFrame(spark, adir).count() == expect)
    // restart replay: checkpoint gone, batch 0 reprocessed — the committed
    // segment's _SUCCESS probe must skip it
    deleteRecursively(new java.io.File(ckpt))
    val q2 = IvfPqIndex.appendStream(spark, adir,
      spark.readStream.schema(extra.schema).parquet(srcDir), ckpt)
    q2.awaitTermination()
    assert(IvfPqIndex.indexFrame(spark, adir).count() == expect,
      "a replayed batch must not duplicate code rows")
    // streamed codes equal batch-append codes (frozen models, same batch)
    val bdir = java.nio.file.Files.createTempDirectory("ivfpq_batch").toString
    IvfPqIndex.build(spark, base, bdir, nCells = 8, m = 4, dim = 64,
      kCodes = 16, iters = 3, trainFraction = 1.0)
    IvfPqIndex.append(spark, bdir, extra)
    def codesOf(df: org.apache.spark.sql.DataFrame) = df
      .filter($"vec_id" >= 300).select($"vec_id", $"sub", $"code", $"cell")
      .collect().map(_.toSeq.map(String.valueOf).mkString(",")).toSet
    assert(codesOf(IvfPqIndex.indexFrame(spark, adir)) ==
      codesOf(spark.read.parquet(s"$bdir/codes")))
    // streamed vectors serve through segments: an appended query reaches
    // its own code rows at the minimal reachable ADC distance
    val sq = extra.filter($"vec_id" === 300)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val res = IvfPqIndex.search(spark, adir, sq, topK = 1000, nProbe = 8)
      .collect().map(r => (r.getLong(1), r.getDouble(3)))
    assert(res.nonEmpty && res.find(_._1 == 300L).map(_._2).contains(res.map(_._2).min))
    // compaction folds the segment into the base; the served table is
    // unchanged and re-compaction is a no-op
    assert(IvfPqIndex.compactSegments(spark, adir) == 1)
    assert(spark.read.parquet(s"$adir/codes").count() == expect)
    assert(IvfPqIndex.compactSegments(spark, adir) == 0)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete(); ()
  }
}
