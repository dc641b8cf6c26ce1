package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("langId picks the language with most stopword evidence") {
    val df = Seq(
      (1L, "the cat and the dog of the house is here"),
      (2L, "der hund und die katze ist das tier"),
      (3L, "le chat et la maison est les arbres"),
      (4L, "xyzzy plugh qwerty")).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextOps.langId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "fr")
    assert(got(4L) == "und")
  }

  test("quality score is bounded and ranks rich text above degenerate text") {
    val df = Seq(
      (1L, (1 to 120).map(i => s"word$i").mkString(" ")), // long, diverse
      (2L, Seq.fill(120)("spam").mkString(" ")),          // long, degenerate
      (3L, "ok")).toDF("doc_id", "text")
    val q = df.select($"doc_id", TextOps.qualityScore($"text").as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(1L) > q(2L), s"diverse ${q(1L)} should beat degenerate ${q(2L)}")
    assert(q(1L) > q(3L))
  }

  test("rolling hash distinguishes token order, unlike the canonical fingerprint") {
    val df = Seq((1L, "a b c d e f g h"), (2L, "h g f e d c b a")).toDF("doc_id", "text")
    val r = df.select($"doc_id",
      TextOps.rollingHash($"text").as("rh"),
      TextOps.fingerprint($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(r(1L)._1 != r(2L)._1, "order-sensitive hash must differ")
  }

  test("tokenCount / stopwordCount basics") {
    val df = Seq((1L, "the quick the lazy the end")).toDF("doc_id", "text")
    val r = df.select(
      TextOps.tokenCount($"text").as("n"),
      TextOps.stopwordCount($"text", Seq("the", "and")).as("sw")).head()
    assert(r.getInt(0) == 6 && r.getInt(1) == 3)
  }

  test("lmScore: hand-computed bigram probabilities with pruning + backoff") {
    // corpus: uni a=3, b=3, N=6; bigrams "a a"=1, "a b"=2, "b b"=1.
    // topK=1 keeps only "a b" → the other bigrams take stupid backoff.
    val df = Seq((1L, "a a b"), (2L, "a b b")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.lmScore(df, topK = 1)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val hit = math.log(2.0 / 3.0)                      // "a b": ln(cb/cu(a))
    val backoff = math.log(0.4) + math.log(3.0 / 6.0)  // unseen: ln(0.4·cu(w2)/N)
    val expected = (hit + backoff) / 2.0               // same mean for both docs
    assert(got.map(_._1).toSeq == Seq(1L, 2L))
    assert(got.forall(_._2 == 2L), "each doc has two bigrams")
    got.foreach { case (_, _, s) => assert(math.abs(s - expected) < 1e-6, s"$s vs $expected") }
  }

  test("collocations: planted phrase tops the lift ranking; replay matches") {
    import spark.implicits._
    // "new york" always adjacent (planted collocation); every other
    // bigram is unique per doc, so the count-5 floor removes it
    val docs = (0 until 120).map { i =>
      (i.toLong, s"new york u${i}a u${i}b u${i}c")
    }
    val out = graft.operators.TextAnalysis.collocations(
      docs.toDF("doc_id", "text"), minCount = 5, topK = 5).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 1 && out.head._1 == "new" && out.head._2 == "york",
      s"only the planted phrase survives the floor: ${out.toSeq}")
    // replay the head row's lift from first principles
    val toks = docs.flatMap(_._2.split(" ", -1))
    val bigs = docs.flatMap(d => d._2.split(" ", -1).sliding(2).map(_.mkString(" ")).toSeq)
    val m = toks.size.toDouble
    val n = bigs.size.toDouble
    val cab = bigs.count(_ == "new york").toDouble
    val ca = toks.count(_ == "new").toDouble
    val cb = toks.count(_ == "york").toDouble
    val lift = math.floor(cab * m * m / (n * ca * cb) * 1e6 + 0.5) / 1e6
    assert(out.head._4 == lift && out.head._3 == cab.toLong)
    // lift ordering is non-increasing
    assert(out.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("compressionRatio: repetitive text collapses, natural prose does not") {
    import spark.implicits._
    val diverse = (0 until 60).map(i => s"w${i * 7919 % 9973}x${i}").mkString(" ")
    val repetitive = Seq.fill(60)("the same block of boilerplate text").mkString(" ")
    val rows = Seq((1L, diverse), (2L, repetitive), (3L, ""), (4L, null))
      .toDF("id", "text")
      .select($"id", graft.functions.TextOps.compressionRatio($"text").as("cr"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows(1).exists(_ > 0.4), s"diverse text must not collapse: ${rows(1)}")
    assert(rows(2).exists(_ < 0.2), s"repetition must collapse: ${rows(2)}")
    assert(rows(1).get > rows(2).get * 2)
    assert(rows(3).isEmpty && rows(4).isEmpty, "empty/null -> null, never NaN")
    // deterministic across evaluations (fresh Deflater per value, no state)
    val again = Seq((2L, repetitive)).toDF("id", "text")
      .select(graft.functions.TextOps.compressionRatio($"text")).head().getDouble(0)
    assert(rows(2).contains(again))
  }

  test("distinctiveTerms: a source-exclusive token outranks shared vocabulary") {
    import spark.implicits._
    // 'kernel' appears ONLY in src a (25×); 'the' is everywhere (50×);
    // 'mixed' is 2:1 across sources — lift must rank kernel > mixed > the
    // within source a, and the count-20 floor must drop rare tokens.
    val docs = (0 until 25).map(i => (i.toLong, "kernel the mixed rare" + i, "a")) ++
      (0 until 25).map(i => (100L + i, "the " + (if (i < 12) "mixed " else "") + "web", "b"))
    val df = docs.toDF("doc_id", "text", "source")
    val out = graft.operators.TextAnalysis.distinctiveTerms(df, topK = 10, minCount = 20)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(4)))
    val a = out.filter(_._1 == "a").sortBy(_._2)
    assert(a.head._3 == "kernel", s"exclusive token must rank first: ${a.toSeq}")
    val liftOf = a.map(t => t._3 -> t._4).toMap
    assert(liftOf("kernel") > liftOf("mixed") && liftOf("mixed") > liftOf("the"),
      s"got $liftOf")
    // rareN tokens (1 occurrence) are below the global floor
    assert(out.forall(t => !t._3.startsWith("rare")))
    // lift replay from first principles for the head row:
    // c_st=25, N=total tokens, c_t=25, N_s = source-a tokens
    val nTot = docs.map(_._2.split(" ", -1).length).sum.toDouble
    val nA = docs.filter(_._3 == "a").map(_._2.split(" ", -1).length).sum.toDouble
    val lift = math.floor(25.0 * nTot / (25.0 * nA) * 1e6 + 0.5) / 1e6
    assert(liftOf("kernel") == lift, s"${liftOf("kernel")} vs $lift")
  }

  test("zipfFit: a planted 1/rank spectrum fits slope ~ -1 with high r2") {
    import spark.implicits._
    // token w_i appears floor(2000/i) times, i = 1..50 — a power law with
    // exponent -1 (plus integer-floor noise)
    val text = (1 to 50).flatMap(i => Seq.fill(2000 / i)(f"w$i%03d")).mkString(" ")
    val out = graft.operators.TextAnalysis.zipfFit(
      Seq((1L, text)).toDF("doc_id", "text")).collect().head
    val (n, slope, r2) = (out.getLong(0), out.getDouble(1), out.getDouble(3))
    assert(n == 50L)
    assert(slope > -1.1 && slope < -0.9, s"slope $slope")
    assert(r2 > 0.99, s"r2 $r2")
  }

  test("oovRate: tokens outside the top-K head count as OOV, per source") {
    import spark.implicits._
    // vocabK=2 -> vocab = {common1, common2} (freq 20 each); src 'clean'
    // writes only vocab tokens, src 'noisy' is half OOV
    val docs = (0 until 10).map(i => (i.toLong, "common1 common2", "clean")) ++
      (0 until 10).map(i => (100L + i, s"common1 common2 rare${i}a rare${i}b", "noisy"))
    val out = graft.operators.TextAnalysis.oovRate(
      docs.toDF("doc_id", "text", "source"), vocabK = 2).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("clean") == ((20L, 0L, 0.0)), s"got $out")
    assert(out("noisy") == ((40L, 20L, 0.5)), s"got $out")
  }

  test("docKeywords: tf/df ranks per doc, minDf drops hapax, ties break on token") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple rare shared"), (2L, "apple shared shared"),
      (3L, "apple shared"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.docKeywords(docs, topK = 2, minDf = 2)
      .collect()
      .map(r => ((r.getLong(0), r.getInt(1)), (r.getString(2), r.getDouble(5))))
      .toMap
    // df: apple 3, shared 3; 'rare' (df 1) never appears
    assert(out((1L, 1)) == (("apple", 0.666667)), s"got $out")
    assert(out((1L, 2)) == (("shared", 0.333333)), s"got $out")
    // doc 3: equal scores -> alphabetical tie-break
    assert(out((3L, 1))._1 == "apple" && out((3L, 2))._1 == "shared", s"got $out")
    assert(!out.values.exists(_._1 == "rare"))
  }

  test("vocabCoverage: cumulative shares at power-of-two ranks, exact") {
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.vocabCoverage(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // census a:3 b:2 c:1, total 6; rank points 1 and 2 (4 > vocab)
    assert(out == Map(
      1L -> ((3L, 0.5)),
      2L -> ((5L, math.floor(5.0 / 6.0 * 1e6 + 0.5) / 1e6))), s"got $out")
  }

  test("charsetCensus: digit/space/symbol shares from strip-length diffs") {
    val docs = Seq((1L, "sa", "ab 12!")).toDF("doc_id", "source", "text")
    val r = graft.operators.TextAnalysis.charsetCensus(docs).head()
    // 6 chars: 2 digits, 1 space, 1 symbol ('!')
    assert(r.getLong(1) == 1L && r.getLong(2) == 6L)
    assert(r.getDouble(3) == math.floor(2.0 / 6.0 * 1e6 + 0.5) / 1e6)
    assert(r.getDouble(4) == math.floor(1.0 / 6.0 * 1e6 + 0.5) / 1e6)
    assert(r.getDouble(5) == math.floor(1.0 / 6.0 * 1e6 + 0.5) / 1e6)
  }

  test("lengthKs: the groupCol parameter re-keys the same machinery (lang)") {
    val docs = Seq(
      (1L, "en", "a"), (2L, "en", "b"), (3L, "en", "c d"),
      (4L, "zh", "e f"), (5L, "zh", "g h")).toDF("doc_id", "lang", "text")
    val out = graft.operators.TextAnalysis.lengthKs(docs, groupCol = "lang")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(out(("en", "zh")) == math.floor(4.0 / 6.0 * 1e6 + 0.5) / 1e6, s"got $out")
  }

  test("lengthKs: exact two-sample KS over merged length censuses") {
    // sa token counts [1,1,2], sb [2,2]: F diverges most at len 1 ->
    // |2*2 - 0*3| / 6 = 0.666667; identical distributions score 0
    val docs = Seq(
      (1L, "sa", "a"), (2L, "sa", "b"), (3L, "sa", "c d"),
      (4L, "sb", "e f"), (5L, "sb", "g h"),
      (6L, "sc", "x"), (7L, "sc", "y"), (8L, "sc", "z w")).toDF("doc_id", "source", "text")
    val out = graft.operators.TextAnalysis.lengthKs(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(out(("sa", "sb")) == math.floor(4.0 / 6.0 * 1e6 + 0.5) / 1e6, s"got $out")
    assert(out(("sa", "sc")) == 0.0, s"got $out") // identical [1,1,2]
  }

  test("termBurstiness: pooled terms rank above spread terms, df floor holds") {
    val docs = Seq(
      (1L, "z z z z a"), (2L, "z z z z a"),   // z pools: df 2, cf 8
      (3L, "a b"), (4L, "b c")                // a spread: df 3, cf 3
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.termBurstiness(docs, minDf = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.head == (("z", 2L, 8L, 4.0)), s"got ${out.toSeq}")
    assert(out.map(_._1).contains("a") && !out.map(_._1).contains("c"),
      s"df floor must drop one-doc terms: ${out.toSeq}")
    val aRow = out.find(_._1 == "a").get
    assert(aRow == (("a", 3L, 3L, 1.0)), s"got $aRow")
  }

  test("vocabOverlap: shared heads intersect, disjoint dialects score 0") {
    val docs = Seq(
      (1L, "sa", "a b c"), (2L, "sb", "a b d"), (3L, "sc", "x y z"))
      .toDF("doc_id", "source", "text")
    val out = graft.operators.TextAnalysis.vocabOverlap(docs, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // sa head {a,b,c}, sb head {a,b,d}: shared 2, union 4 -> 0.5
    assert(out(("sa", "sb")) == ((2L, 0.5)), s"got $out")
    assert(out(("sa", "sc"))._1 == 0L && out(("sa", "sc"))._2 == 0.0, s"got $out")
  }

  test("qualityDecileCensus: counts conserve, shares sum to 1, deciles ordered by score") {
    // 40 docs over two sources with a quality gradient (token count drives
    // the length term); exact decile values ride bisectQuantiles' own spec
    val docs = (1 to 40).map { i =>
      (i.toLong, if (i % 2 == 0) "sa" else "sb",
        (1 to (i * 3)).map(j => s"w${j % (i + 2)}").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val out = graft.operators.TextAnalysis.qualityDecileCensus(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(_._3).sum == 40L)
    assert(out.forall(r => r._2 >= 0 && r._2 <= 9))
    val bySrc = out.groupBy(_._1)
    bySrc.foreach { case (s, rows) =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4, s"$s shares: $rows")
    }
    // decile 9 is non-empty (top 10% of a 40-doc gradient exists)
    assert(out.exists(_._2 == 9L), s"got ${out.toSeq}")
  }
}
