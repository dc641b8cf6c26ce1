package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf = graft.core.Tables.documents(spark, sf0001)

  test("capPerDomain: at most k per domain, ordered by quality then doc_id") {
    val capped = Curation.capPerDomain(docsDf, "source", 3)
    val perDomain = capped.groupBy($"source").count().collect()
    assert(perDomain.nonEmpty && perDomain.forall(_.getLong(1) <= 3))
    // the rank-1 doc per domain must carry that domain's max quality
    val best = capped.filter($"rk" === 1)
      .select($"source", $"quality").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val trueMax = Curation.capPerDomain(docsDf, "source", Int.MaxValue)
      .groupBy($"source").agg(max($"quality").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(best == trueMax)
  }

  test("qualityFilter: planted pass/fail documents") {
    val good = "the a " + (1 to 28).map(i => s"word$i").mkString(" ") // 30 tokens, all distinct, stopwords present
    val short = "the a dog" // too few tokens
    val repetitive = ("spam " * 40).trim + " the" // 41 tokens but 2 distinct
    val noStop = (1 to 30).map(i => s"tok$i").mkString(" ") // no stopword
    val df = Seq((1L, good), (2L, short), (3L, repetitive), (4L, noStop)).toDF("doc_id", "text")
    val kept = Curation.qualityFilter(df).select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("bloomReferenceDedup: exact drops even at absurd fpp") {
    val ref = Seq("fp_a", "fp_b", "fp_c").toDF("fp")
    val incoming = (1 to 100).map(i => (i.toLong, s"fp_new_$i")).toDF("doc_id", "fp")
      .union(Seq((101L, "fp_a"), (102L, "fp_c")).toDF("doc_id", "fp"))
    // fpp 0.5: half the new rows go through verification — output must be
    // identical to the exact anti-join regardless
    val out = Curation.bloomReferenceDedup(incoming, ref, "fp", 100L, 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(out == (1 to 100).map(_.toLong).toSet)
  }

  test("bloomReferenceDedup: bloom probe in plan, definite-new branch join-free") {
    // parquet-backed input so ConvertToLocalRelation can't fold the plan away
    val plan = SparkEntry.queries("q71_bloom_refdedup")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), s"bloom probe missing:\n$plan")
    assert(plan.contains("Union"), s"two-branch union expected:\n$plan")
    // first Union branch (definitely-new) is a pure scan+filter — no join
    val firstBranch = plan.split("Union")(1).split("Join")(0)
    assert(firstBranch.contains("bloom_might_contain"),
      s"definite-new branch must be the bloom filter itself:\n$plan")
  }

  test("stratifiedSample: deterministic, bucketed in [0,1000), rates honored") {
    val rates = Map("en" -> 100, "de" -> 500, "es" -> 500, "fr" -> 500, "zh" -> 500)
    val s1 = Curation.stratifiedSample(docsDf, "lang", rates)
    val s2 = Curation.stratifiedSample(docsDf, "lang", rates)
    val rows1 = s1.select($"doc_id").as[Long].collect().sorted.toSeq
    assert(rows1 == s2.select($"doc_id").as[Long].collect().sorted.toSeq)
    assert(s1.filter($"bucket" < 0 || $"bucket" >= 1000).count() == 0)
    // per-stratum keep fraction lands near its rate (coarse at sf0.001)
    val frac = s1.groupBy($"lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docsDf.groupBy($"lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val enFrac = frac.getOrElse("en", 0L).toDouble / total("en")
    assert(enFrac < 0.35, s"en kept fraction $enFrac should be near 0.10")
  }

  test("stratifiedSample: unknown stratum is dropped (rate 0)") {
    val df = Seq((1L, "xx"), (2L, "en")).toDF("doc_id", "lang")
    val out = Curation.stratifiedSample(df, "lang", Map("en" -> 1000))
      .select($"doc_id").as[Long].collect().toSet
    assert(out == Set(2L))
  }

  test("packSequences: bins respect start-offset budget; cum is a prefix sum") {
    val out = Curation.packSequences(docsDf, "source", 256)
    // start offset of every doc lies inside its bin's [bin*256, (bin+1)*256)
    val bad = out.filter(($"cum" - $"n") < $"bin" * 256 || ($"cum" - $"n") >= ($"bin" + 1) * 256)
    assert(bad.count() == 0)
    // per-shard max cum equals the shard's token total
    val lhs = out.groupBy($"source").agg(max($"cum").as("m"))
    val rhs = out.groupBy($"source").agg(sum($"n").as("t"))
    val joined = lhs.join(rhs, "source").filter($"m" =!= $"t")
    assert(joined.count() == 0)
  }

  test("quantizeInt8: range, sign, max-element saturation, reconstruction") {
    val embs = graft.core.Tables.embeddings(spark, sf0001)
    val q = Curation.quantizeInt8(embs, "embedding")
    assert(q.filter(exists($"qvec", x => abs(x) > 127)).count() == 0)
    // the max-|x| element quantizes to exactly ±127
    val sat = q.filter(!exists($"qvec", x => abs(x) === 127)).count()
    assert(sat == 0, "every vector must saturate at its max element")
    // reconstruction: |x − q/scale| ≤ 0.5/scale element-wise on one vector
    val row = embs.select($"vec_id", $"embedding").head()
    val vec = row.getSeq[Float](1).map(_.toDouble)
    val qr = q.filter($"vec_id" === row.getLong(0)).head()
    val scale = qr.getLong(1).toDouble / 1e6
    val qvec = qr.getSeq[Long](2)
    vec.zip(qvec).foreach { case (x, qi) =>
      assert(math.abs(x - qi / scale) <= 0.5 / scale + 1e-9, s"x=$x q=$qi scale=$scale")
    }
  }

  test("quantizeInt8: native expression is bit-equal to the HOF twin (edges included)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // real corpus: every (scale_q, qvec) pair identical
    val embs = graft.core.Tables.embeddings(spark, sf0001)
    def dump(df: org.apache.spark.sql.DataFrame) = df.orderBy($"vec_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getSeq[Any](2).toList)).toList
    assert(dump(Curation.quantizeInt8(embs, "embedding")) ==
      dump(Curation.quantizeInt8Hof(embs, "embedding")))
    // planted edges: null vector, empty, all-zero, null elements, mixed
    val schema = StructType(Seq(StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(DoubleType, containsNull = true), nullable = true)))
    val edge = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, Seq(0.5, -1.0, 0.25)),
        Row(2L, Seq.empty[Double]),
        Row(3L, null),
        Row(4L, Seq(0.0, -0.0)),
        Row(5L, Seq[Any](null, 2.0)),
        Row(6L, Seq[Any](null, null))), schema)
    assert(dump(Curation.quantizeInt8(edge, "embedding")) ==
      dump(Curation.quantizeInt8Hof(edge, "embedding")))
    // interpreted eval path (no codegen) agrees with the HOF dag too
    import org.apache.spark.sql.catalyst.expressions.Literal
    val res = graft.expressions.QuantizeInt8Expr(
        Literal.create(Seq(0.5, -1.0, 0.25), ArrayType(DoubleType)))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(res.getDouble(0) == 127.0)
    assert(res.getArray(1).toLongArray.toList == List(64L, -127L, 32L))
  }

  test("q75 cluster retention: best member = independent per-cluster quality argmax") {
    val clusters = SparkEntry.queries("q66_dedup_clusters")(spark, sf0001) // (doc_id, rep_id)
    val qual = docsDf.select($"doc_id",
      graft.functions.TextOps.qualityScore($"text").as("q"))
    // independent argmax: max (quality, −doc_id) struct per cluster ≡
    // highest quality with min-doc_id tiebreak
    val expected = clusters.join(qual, "doc_id")
      .groupBy($"rep_id")
      .agg(count(lit(1)).as("n_members"), max(struct($"q", -$"doc_id")).as("m"))
      .select($"rep_id", $"n_members", (-$"m.col2").as("best_doc_id"), $"m.q".as("best_quality"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val got = SparkEntry.queries("q75_cluster_best")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got.nonEmpty && got == expected)
  }

  test("mixtureResample: integer rate formula and budget proximity") {
    val weights = Map("en" -> 500, "de" -> 125, "es" -> 125, "fr" -> 125, "zh" -> 125)
    val out = Curation.mixtureResample(docsDf, "lang", weights, budget = 100L)
    // every row's rate_pm must equal min(1000, budget*w div n_s) recomputed
    // from an independent census
    val census = docsDf.groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.select($"lang", $"n_s", $"rate_pm").distinct().collect().foreach { r =>
      val (lang, ns, rate) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(ns == census(lang))
      assert(rate == math.min(1000L, 100L * weights(lang) / ns), s"$lang")
    }
    // deterministic: two runs identical
    val a = out.select($"doc_id").as[Long].collect().toSet
    val b = Curation.mixtureResample(docsDf, "lang", weights, budget = 100L)
      .select($"doc_id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("globalShuffle: a reproducible permutation with contiguous shard positions") {
    val s1 = Curation.globalShuffle(docsDf, 8)
    val n = docsDf.count()
    // every doc appears exactly once
    assert(s1.select($"doc_id").distinct().count() == n && s1.count() == n)
    // positions are 1..count(shard) within each shard
    val bad = s1.groupBy($"shard")
      .agg(count(lit(1)).as("c"), max($"pos").as("mx"), min($"pos").as("mn"))
      .filter($"mx" =!= $"c" || $"mn" =!= 1)
    assert(bad.isEmpty)
    // identical across runs (no RNG state)
    val p1 = s1.select($"doc_id", $"shard", $"pos").collect().toSet
    val p2 = Curation.globalShuffle(docsDf, 8)
      .select($"doc_id", $"shard", $"pos").collect().toSet
    assert(p1 == p2)
    // and it actually permutes: within some shard, consecutive positions
    // are not consecutive doc_ids
    val shard0 = s1.filter($"shard" === 0).orderBy($"pos")
      .select($"doc_id").as[Long].collect()
    assert(shard0.length > 2 && !shard0.sliding(2).forall(w => w(1) == w(0) + 1))
  }

  test("buildVocab: frequencies match a manual census") {
    val df = Seq((1L, "x y x z"), (2L, "y x w w")).toDF("doc_id", "text")
    val got = Curation.buildVocab(df, 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // freqs: x=3, w=2, y=2, z=1 → top3 by (freq desc, token): x, w, y
    assert(got.toSeq == Seq((1, "x", 3L), (2, "w", 2L), (3, "y", 2L)))
  }

  test("chunkDocuments: stride grid, overlap, and tail chunk") {
    val df = Seq((1L, "t1 t2 t3 t4 t5"), (2L, "solo")).toDF("doc_id", "text")
    val out = Curation.chunkDocuments(df, chunkTokens = 3, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3))).toSet
    assert(out == Set(
      (1L, 0L, "t1 t2 t3", 3), (1L, 1L, "t3 t4 t5", 3), (1L, 2L, "t5", 1),
      (2L, 0L, "solo", 1)))
  }

  test("chunkDocuments: generator input carries only the index sequence (explode rule)") {
    val plan = Curation.chunkDocuments(docsDf, 32, 24).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must be map-only:\n$plan")
    val generateLine = plan.linesIterator.find(_.contains("Generate")).getOrElse("")
    assert(generateLine.contains("sequence") && !generateLine.contains("slice"),
      s"slice must run after the generate, not inside it:\n$generateLine")
  }

  test("chunkDocuments: every token position is covered, chunk count = ceil(n/stride)") {
    val out = Curation.chunkDocuments(docsDf, 32, 24)
    val perDoc = out.groupBy($"doc_id")
      .agg(count(lit(1)).as("chunks"), sum($"n_chunk_tokens").as("tok_sum"))
    val n = docsDf.select($"doc_id",
      size(graft.functions.TextOps.tokens($"text")).as("n"))
    val joined = perDoc.join(n, "doc_id")
    val badCount = joined.filter($"chunks" =!= expr("(n + 23) div 24")).count()
    assert(badCount == 0)
    // with stride 24 / window 32, each interior chunk re-reads 8 tokens
    val badCoverage = joined
      .filter($"tok_sum" < $"n") // must at least cover every token once
      .count()
    assert(badCoverage == 0)
  }

  test("q86 pipeline: yields are consistent with running the stages separately") {
    val docs = docsDf
    val passing = docs.join(Curation.qualityFilter(docs).select($"doc_id"), Seq("doc_id"), "left_semi")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"fp").orderBy($"doc_id")
    val deduped = passing
      .withColumn("fp", graft.functions.TextOps.fingerprint($"text"))
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("fp", "rn")
    val clean = graft.operators.Compliance.decontaminate(
      deduped, docs.filter($"doc_id" % 97 === 0), 3, 2L)
    val sampled = Curation.stratifiedSample(clean, "lang",
      Map("en" -> 500, "de" -> 500, "es" -> 500, "fr" -> 500, "zh" -> 500))
    // the pipeline's reported doc yield equals the stagewise doc count
    val stagewise = sampled.groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val piped = graft.operators.Pipeline.curate(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(piped.view.mapValues(_._1).toMap == stagewise)
    // chunk yield >= doc yield (every surviving doc emits >= 1 chunk)
    piped.values.foreach { case (nd, nc) => assert(nc >= nd) }
    // and each stage only shrinks the corpus
    val counts = Seq(docs.count(), passing.count(), deduped.count(), clean.count(), sampled.count())
    assert(counts.sliding(2).forall { case Seq(a, b) => b <= a })
  }

  test("bpeTrain: learned merges, tie-breaks, and leftmost-greedy rewrite") {
    val df = Seq((1L, "a a a b c"), (2L, "a b a b x"), (3L, "c c c c"))
      .toDF("doc_id", "text")
    val (merges, toks) = Curation.bpeTrain(df, iterations = 3)
    // iter0: (a,b) and (c,c) tie at 3 → (a,b) on lex order; iter1: (c,c);
    // iter2: all pairs tie at 1 → (a,a) lex-min
    assert(merges == Seq(("a", "b"), ("c", "c"), ("a", "a")))
    val got = toks.orderBy($"doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("a a", "a b", "c"), "run parity: 'a a a' merges once")
    assert(got(2L) == Seq("a b", "a b", "x"))
    assert(got(3L) == Seq("c c", "c c"), "'c c c c' merges twice, no chaining")
  }

  test("bpeEncode: replays bpeTrain's rewrite; applies learned merges to new text") {
    val train = Seq((1L, "a a a b c"), (2L, "a b a b x"), (3L, "c c c c"))
      .toDF("doc_id", "text")
    val (merges, trained) = Curation.bpeTrain(train, iterations = 3)
    // encoding the training corpus with the learned merges = training rewrite
    val enc = Curation.bpeEncode(train, merges)
    val l = trained.orderBy($"doc_id").collect().map(_.getSeq[String](1)).toSeq
    val r = enc.orderBy($"doc_id").collect().map(_.getSeq[String](1)).toSeq
    assert(l == r)
    // unseen text: merges (a,b) then (c,c) then (a,a) apply in order
    val fresh = Seq((9L, "c c a b a a b")).toDF("doc_id", "text")
    val got = Curation.bpeEncode(fresh, merges).collect()(0).getSeq[String](1)
    // (a,b): c c [a b] a [a b] → (c,c): [c c] ab a ab → (a,a): no a-a pair left
    assert(got == Seq("c c", "a b", "a", "a b"))
  }

  /** Plain-Scala statement of the encode semantics — merges in list order,
    * each one leftmost-greedy pass — the independent reference the sweep
    * expression is checked against (the fold twin states the same thing as
    * a Spark plan; this states it as ten lines of loop). */
  private def refBpe(toks: Seq[String], merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(toks) { case (ts, (w1, w2)) =>
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < ts.length) {
        if (i + 1 < ts.length && ts(i) == w1 && ts(i + 1) == w2) { out += (w1 + " " + w2); i += 2 }
        else { out += ts(i); i += 1 }
      }
      out.toSeq
    }

  test("bpeEncode sweep: parity with the fold twin on a random corpus") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (1L to 40L).map(i =>
      (i, Seq.fill(3 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .toDF("doc_id", "text")
    // cascades ((a b, c), (a b c, d)), w1=w2 runs, and a DUPLICATE pair at
    // two ranks ((c, d) again after (a b, c) can recreate c-d adjacency
    // consumers... the second pass fuses pairs the first could not see)
    val merges = Seq(("a", "b"), ("c", "d"), ("a b", "c"), ("a b c", "d"),
      ("e", "e"), ("c", "d"), ("b", "a"))
    val viaExpr = Curation.bpeEncode(docs, merges)
      .orderBy($"doc_id").collect().map(_.getSeq[String](1)).toSeq
    val viaFold = Curation.bpeEncodeFold(docs, merges)
      .orderBy($"doc_id").collect().map(_.getSeq[String](1)).toSeq
    assert(viaExpr == viaFold)
    // and both match the loop statement of the semantics
    val raw = docs.orderBy($"doc_id").collect().map(_.getString(1).split(" ").toSeq)
    assert(viaExpr == raw.map(refBpe(_, merges)).toSeq)
  }

  test("bpeEncode sweep: planted cascade, run, and duplicate-rank edge cases") {
    def enc(text: String, merges: Seq[(String, String)]): Seq[String] =
      Curation.bpeEncode(Seq((1L, text)).toDF("doc_id", "text"), merges)
        .collect()(0).getSeq[String](1)
    // cascades: rank 0 creates the left token rank 1 needs, then rank 2
    assert(enc("x a b c y", Seq(("a", "b"), ("a b", "c"))) == Seq("x", "a b c", "y"))
    assert(enc("a b b", Seq(("a", "b"), ("a b", "b"))) == Seq("a b b"))
    // staleness: once fused, the left token no longer matches later ranks
    assert(enc("x a b", Seq(("a", "b"), ("x", "a"))) == Seq("x", "a b"))
    // in-order contract: an adjacency matching an EARLIER rank, created by
    // a later pass, is never revisited ("p q" only exists after pass 1,
    // but ("p q","r")'s pass 0 is already over)
    assert(enc("p q r", Seq(("p q", "r"), ("p", "q"))) == Seq("p q", "r"))
    // ...unless the pair is listed AGAIN at a later rank (duplicate entry:
    // the second pass fuses what the first could not see)
    assert(enc("p q r", Seq(("p q", "r"), ("p", "q"), ("p q", "r"))) == Seq("p q r"))
    // w1 = w2 runs fuse at even offsets only, per pass
    assert(enc("a a a a a", Seq(("a", "a"))) == Seq("a a", "a a", "a"))
    assert(enc("a a a a a", Seq(("a", "a"), ("a a", "a a"))) == Seq("a a a a", "a"))
    // empty / single-token / no-match inputs pass through
    assert(enc("solo", Seq(("a", "b"))) == Seq("solo"))
    assert(enc("x y z", Seq(("a", "b"))) == Seq("x", "y", "z"))
  }

  test("bpeEncode sweep: a 10k-merge vocabulary encodes in ONE pass") {
    // all ordered pairs over a 100-token vocab = 10,000 ranked merges —
    // production scale, hopeless as 10k chained fold projections
    val vocab = (0 until 100).map(i => s"t$i")
    val merges = for (a <- vocab; b <- vocab) yield (a, b)
    assert(merges.size == 10000)
    val rnd = new scala.util.Random(11)
    val docs = (1L to 10L).map(i =>
      (i, Seq.fill(60)(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .toDF("doc_id", "text")
    val encoded = Curation.bpeEncode(docs, merges)
    // single projection over the scan — the merge table is ONE plan literal,
    // not a 10k-deep plan tree
    assert(encoded.queryExecution.optimizedPlan.collect { case p => p }.size <= 3)
    val got = encoded.orderBy($"doc_id").collect().map(_.getSeq[String](1)).toSeq
    val raw = docs.orderBy($"doc_id").collect().map(_.getString(1).split(" ").toSeq)
    assert(got == raw.map(refBpe(_, merges)).toSeq)
  }

  test("weightedSample: A-ES selection is deterministic, weight-monotone, and exact given u") {
    val df = (1L to 200L).map(i => (i, (i % 7 + 1).toDouble)).toDF("doc_id", "w")
    val s1 = Curation.weightedSample(df, "w", k = 20).collect()
    val s2 = Curation.weightedSample(df, "w", k = 20).collect()
    assert(s1.map(_.getLong(0)).toSeq == s2.map(_.getLong(0)).toSeq, "re-runs identical")
    assert(s1.length == 20)
    // exact selection check: recompute priority from the exposed u and
    // verify the output IS the top-k by (priority, doc_id)
    val all = Curation.weightedSample(df, "w", k = 200).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    // within 1 ulp, not bit-equal: pow's intrinsic may differ from the
    // driver's by a unit in the last place — the very reason this
    // operator is spec-verified instead of DuckDB-oracle-replayed
    for ((id, u, p) <- all) {
      val e = math.pow(u, 1.0 / ((id % 7 + 1).toDouble))
      assert(math.abs(p - e) <= math.ulp(e), s"doc $id: $p vs $e")
    }
    val expectedTop = all.sortBy { case (id, _, p) => (-p, id) }.take(20).map(_._1).toSeq
    assert(s1.map(_.getLong(0)).toSeq == expectedTop)
    // a weight-1e9 row beats weight-1e-9 rows for ANY u in (0,1)
    val skew = Seq((1L, 1e-9), (2L, 1e9), (3L, 1e-9)).toDF("doc_id", "w")
    assert(Curation.weightedSample(skew, "w", k = 1).collect()(0).getLong(0) == 2L)
    // non-positive weights are never selected
    val mixed = Seq((1L, 0.0), (2L, -3.0), (3L, 5.0)).toDF("doc_id", "w")
    assert(Curation.weightedSample(mixed, "w", k = 3).collect()
      .map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("plan: qualityFilter / stratifiedSample / quantizeInt8 are shuffle-free") {
    for (df <- Seq(
        Curation.qualityFilter(docsDf),
        Curation.stratifiedSample(docsDf, "lang", Map("en" -> 100)),
        Curation.quantizeInt8(graft.core.Tables.embeddings(spark, sf0001), "embedding"))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"map-only operator must not shuffle:\n$plan")
    }
  }

  test("splitDrift matches a driver-side replay on a synthetic corpus") {
    import java.security.MessageDigest
    def bucket(id: Long): Int = {
      val md = MessageDigest.getInstance("MD5").digest(id.toString.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) % 1000).toInt
    }
    val words = Vector("alpha", "beta", "gamma", "delta")
    val docs = (0L until 400L).map { id =>
      val txt = (0 to (id % 7).toInt).map(j => words(((id + j) % 4).toInt)).mkString(" ")
      (id, txt)
    }
    val out = Curation.splitDrift(docs.toDF("doc_id", "text"), topK = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    // independent replay: JVM md5 split, JVM censuses, same IEEE divisions
    val train = docs.filter(d => bucket(d._1) < 800).flatMap(_._2.split(" ", -1))
    val valT = docs.filter { d => val b = bucket(d._1); b >= 800 && b < 900 }
      .flatMap(_._2.split(" ", -1))
    val (tT, tV) = (train.size.toDouble, valT.size.toDouble)
    val cT = train.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cV = valT.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val exp = (cT.keySet ++ cV.keySet).toSeq.map { t =>
      val a = cT.getOrElse(t, 0L); val b = cV.getOrElse(t, 0L)
      (t, a, b, a / tT, b / tV, math.abs(a / tT - b / tV))
    }.sortBy { case (t, _, _, _, _, diff) => (-diff, t) }.take(4)
    assert(out == exp)
    // ordering invariant on the real corpus: abs_diff non-increasing
    val real = Curation.splitDrift(docsDf, topK = 25).collect().map(_.getDouble(5))
    assert(real.nonEmpty && real.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("datasetCard: rollup margins re-add; planted duplicates are counted") {
    val docs = Seq(
      (1L, "webA", "en", "alpha beta gamma"),
      (2L, "webA", "en", "alpha beta gamma"),          // exact dup of 1
      (3L, "webA", "de", "ALPHA, beta gamma!"),        // canonical dup of 1
      (4L, "webB", "en", "delta epsilon"),
      (5L, "webB", "fr", "zeta eta theta iota")
    ).toDF("doc_id", "source", "lang", "text")
    val card = Curation.datasetCard(docs).collect().map(r =>
      (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2), r.getLong(3), r.getLong(4)))
    val all = card.find(t => t._1.isEmpty && t._2.isEmpty).get
    assert(all._3 == 5 && all._4 == 15)
    // 3 docs share one canonical fingerprint -> 2 surplus copies corpus-wide
    assert(all._5 == 2, s"canonical dup count: $card")
    // source margin re-adds its lang slices
    val webA = card.find(t => t._1.contains("webA") && t._2.isEmpty).get
    val webASlices = card.filter(t => t._1.contains("webA") && t._2.nonEmpty)
    assert(webA._3 == webASlices.map(_._3).sum && webA._4 == webASlices.map(_._4).sum)
    // within-slice dup only visible at the margin: the (webA, en) slice has
    // 1 dup pair, the (webA, de) slice none on its own
    assert(card.find(t => t._1.contains("webA") && t._2.contains("en")).get._5 == 1)
    assert(card.find(t => t._1.contains("webA") && t._2.contains("de")).get._5 == 0)
  }

  test("ringNegatives: k distinct non-self negatives per anchor, deterministic") {
    val docs = docsDf
    val out = Curation.ringNegatives(docs, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val n = docs.count()
    assert(out.length == n * 3, "every anchor gets k negatives on a big-enough shard")
    val byAnchor = out.groupBy(_._1)
    assert(byAnchor.forall { case (a, negs) =>
      negs.length == 3 && !negs.exists(_._3 == a) && negs.map(_._3).distinct.length == 3
    })
    // deterministic across re-runs (no RNG anywhere)
    val again = Curation.ringNegatives(docs, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSeq == again.toSeq)
    // degenerate single-doc shard: self wrap is filtered, never emitted
    val one = Curation.ringNegatives(Seq(42L).toDF("doc_id"), k = 2).collect()
    assert(one.isEmpty)
  }

  test("cardSketch/mergeCards: merged increments equal the whole-corpus card EXACTLY") {
    val docs = docsDf
    val h1 = docs.filter($"doc_id" % 2 === 0)
    val h2 = docs.filter($"doc_id" % 2 =!= 0)
    val (mc, mr) = Curation.mergeCards(Curation.cardSketch(h1), Curation.cardSketch(h2))
    val (wc, wr) = Curation.cardSketch(docs)
    def cset(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    def rset(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3))).toSet
    assert(cset(mc) == cset(wc), "counts must merge by addition, exactly")
    assert(rset(mr) == rset(wr), "registers must max-merge to the union's table, exactly")
    // the distinct-fingerprint ESTIMATE from the merged registers lands
    // near the exact census (m = 128 -> ~9% sigma; allow 3 sigma)
    val est = graft.operators.Sketches.hllEstimateCorrected(
      mr.select(struct($"source", $"lang").as("grp"), $"reg", $"rho"))
      .agg(sum($"est")).head().getDouble(0)
    val exact = docs.select(graft.functions.TextOps.fingerprint($"text")).distinct().count()
    assert(math.abs(est / exact - 1.0) < 0.3, s"est $est vs exact $exact")
  }

  test("bpeCompressionCensus: cascade merges compress, foreign text does not") {
    val docs = Seq(
      (1L, "sa", "table hash part"),   // cascades to ONE token via merges 0+2
      (2L, "sa", "table hash"),        // one merge -> 1 token
      (3L, "sb", "foreign words only") // no merge applies
    ).toDF("doc_id", "source", "text")
    val out = graft.operators.Curation
      .bpeCompressionCensus(docs, graft.operators.Curation.EncodeMerges)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out("sa") == ((2L, 5L, 2L, 0.4)), s"got $out")
    assert(out("sb") == ((1L, 3L, 3L, 1.0)), s"got $out")
  }
}
