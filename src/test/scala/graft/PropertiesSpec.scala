package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.flow._

/** ScalaCheck properties over generated inputs (SURVEY.md §5 test plan):
  * refine monotonicity, histogram/cutflow conservation, sumw2 positivity,
  * deltaPhi range — invariants that must hold for ANY data, not just the
  * fixtures. (Raw ScalaCheck generators with fixed seeds — the
  * scalatest-scalacheck bridge isn't in the offline dependency cache.) */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def forAll[T](g: Gen[T], minSuccessful: Int = 8)(body: T => Unit): Unit =
    (0 until minSuccessful).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private val rowsGen: Gen[List[(Double, Double, Int)]] =
    Gen.nonEmptyListOf(for {
      x <- Gen.choose(-50.0, 150.0)
      w <- Gen.choose(0.1, 5.0)
      g <- Gen.choose(0, 3)
    } yield (x, w, g))

  test("property: refine chain yields are monotone and sumw2 non-negative") {
    forAll(rowsGen) { rows =>
      val df = rows.toDF("x", "w", "g")
      val root = Selection.root("all", $"w")
      val a = root.refine("a", $"x" > 0)
      val b = a.refine("b", $"x" > 50)
      val cf = CutFlowReport.report(df, Seq(root, a, b))
      assert(cf.map(_.sumw).sliding(2).forall { case Seq(p, c) => c <= p + 1e-9; case _ => true })
      assert(cf.map(_.n).sliding(2).forall { case Seq(p, c) => c <= p; case _ => true })
      assert(cf.forall(_.sumw2 >= 0))
      assert(cf.forall(e => e.stepEff >= 0 && e.stepEff <= 1.0 + 1e-12))
    }
  }

  test("property: histogram total SumW + N conserve the selection totals") {
    forAll(rowsGen) { rows =>
      val df = rows.toDF("x", "w", "g")
      val root = Selection.root("all", $"w")
      val h = HistogramPass.run(df, Seq(
        Plot("hx", $"x", root, EquidistantBinning(7, 0.0, 100.0))))
      val (histN, histW) = h.agg(sum($"n"), sum($"sumw")).head() match {
        case r => (r.getLong(0), r.getDouble(1))
      }
      val cf = CutFlowReport.report(df, Seq(root)).head
      assert(histN == cf.n, "every row lands in exactly one bucket (incl. flows)")
      assert(math.abs(histW - cf.sumw) < 1e-9 * math.max(1.0, math.abs(cf.sumw)))
    }
  }

  test("property: deltaPhi always lands in (-pi, pi] and deltaR >= |deltaEta|") {
    val phis = Gen.nonEmptyListOf(for {
      p1 <- Gen.choose(-10.0, 10.0); p2 <- Gen.choose(-10.0, 10.0)
      e1 <- Gen.choose(-5.0, 5.0); e2 <- Gen.choose(-5.0, 5.0)
    } yield (p1, p2, e1, e2))
    forAll(phis) { rows =>
      val df = rows.toDF("p1", "p2", "e1", "e2")
      val bad = df.select(
        graft.functions.PhysicsFunctions.deltaPhi($"p1", $"p2").as("dphi"),
        graft.functions.PhysicsFunctions.deltaR($"e1", $"p1", $"e2", $"p2").as("dr"),
        abs($"e1" - $"e2").as("deta"))
        .filter($"dphi" <= -math.Pi - 1e-12 || $"dphi" > math.Pi + 1e-12 ||
          $"dr" < $"deta" - 1e-9)
        .count()
      assert(bad == 0)
    }
  }

  test("property: upsertLatest equals a driver-side map fold for any changelog") {
    val opsGen: Gen[List[(Long, String, Long, Boolean)]] =
      Gen.nonEmptyListOf(for {
        k <- Gen.choose(0L, 8L)
        v <- Gen.alphaStr.map(_.take(4))
        ver <- Gen.choose(1L, 5L)
        del <- Gen.prob(0.25)
      } yield (k, v, ver, del))
    forAll(opsGen) { ops =>
      val base = Seq((0L, "base", 0L, false), (9L, "base9", 0L, false))
      // reference semantics: per key, max version wins (ties: any of the
      // tied rows — generate distinct versions per key to stay total)
      val updates = ops.groupBy(o => (o._1, o._3)).map(_._2.head).toList
      val all = base ++ updates
      val expected = all.groupBy(_._1).flatMap { case (k, rows) =>
        val latest = rows.maxBy(_._3)
        if (latest._4) None else Some((k, latest._2, latest._3))
      }.toSet
      val got = graft.operators.Maintenance.upsertLatest(
        base.toDF("k", "v", "version", "del"),
        updates.toDF("k", "v", "version", "del"),
        Seq("k"), "version", Some("del"))
        .select($"k", $"v", $"version")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == expected, s"ops=$updates")
    }
  }

  test("property: zorder locality bound holds for any bucket shift") {
    // within a bucket of shift s, each dimension spans < 2^ceil(s/2)
    val gen = for {
      shift <- Gen.choose(2, 20)
      pts <- Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 65535L), Gen.choose(0L, 65535L)))
    } yield (shift, pts)
    forAll(gen, minSuccessful = 5) { case (shift, pts) =>
      val stats = graft.operators.Maintenance.zorderBucketStats(
        pts.toDF("a", "b"), "a", "b", bits = 16, bucketShift = shift).collect()
      val bound = 1L << ((shift + 1) / 2)
      stats.foreach { r =>
        assert(r.getAs[Long]("a_max") - r.getAs[Long]("a_min") < bound,
          s"shift=$shift ${r.toString}")
        assert(r.getAs[Long]("b_max") - r.getAs[Long]("b_min") < bound,
          s"shift=$shift ${r.toString}")
      }
    }
  }

  test("property: chunkDocuments reassembles every document on a non-overlapping grid") {
    val docGen = Gen.nonEmptyListOf(
      Gen.nonEmptyListOf(Gen.oneOf("aa", "bb", "cc", "dd")).map(_.mkString(" ")))
    forAll(Gen.zip(Gen.choose(1, 6), docGen), minSuccessful = 5) { case (chunk, texts) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      // stride == chunkTokens → zero overlap → concatenating chunks in
      // chunk_id order must reproduce the exact document
      val out = graft.operators.Curation.chunkDocuments(df, chunk, chunk)
        .groupBy($"doc_id")
        .agg(concat_ws(" ", array_sort(collect_list(struct($"chunk_id", $"chunk")))
          .getField("chunk")).as("rebuilt"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(out(i.toLong) == t, s"chunk=$chunk doc=$t")
      }
    }
  }

  test("property: variable binning bucket is consistent with its edges") {
    val edgesGen = Gen.chooseNum(2, 6).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-100.0, 100.0)).map(_.distinct.sorted).suchThat(_.size >= 2))
    forAll(edgesGen.flatMap(e => Gen.nonEmptyListOf(Gen.choose(-150.0, 150.0)).map(x => (e, x)))) {
      case (edges, xs) =>
        val b = VariableBinning(edges)
        val got = xs.toDF("x").select(b.bucket($"x").as("b")).as[Int].collect()
        xs.zip(got).foreach { case (x, bucket) =>
          val expected =
            if (x < edges.head) -1
            else if (x >= edges.last) edges.size - 1
            else edges.sliding(2).indexWhere(e => x >= e.head && x < e(1))
          assert(bucket == expected, s"x=$x edges=$edges")
        }
    }
  }

  private val corpusGen: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c"))
      .map(_.mkString(" ")))

  test("property: phraseSearch equals the naive sliding-window count on any corpus") {
    val phraseGen = for {
      len <- Gen.choose(2, 3)
      ts <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
    } yield ts
    forAll(Gen.zip(corpusGen, phraseGen)) { case (texts, phrase) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.operators.Retrieval.phraseSearch(df, phrase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = texts.zipWithIndex.flatMap { case (t, i) =>
        val toks = t.split(" ").toSeq
        val n = toks.sliding(phrase.length).count(_ == phrase)
        if (n > 0) Some(i.toLong -> n.toLong) else None
      }.toMap
      assert(got == expected, s"phrase=$phrase corpus=$texts")
    }
  }

  test("property: invertedIndex per-shard stats recompose to the global census") {
    forAll(corpusGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val idx = graft.operators.Retrieval.invertedIndex(df, nShards = 3,
        maxPostings = Int.MaxValue).collect()
      val byTerm = idx.groupBy(_.getString(0))
      val toks = texts.zipWithIndex.flatMap { case (t, i) =>
        t.split(" ").map(w => (w, i.toLong)) }
      for ((term, rows) <- byTerm) {
        assert(rows.map(_.getLong(2)).sum == toks.count(_._1 == term), s"cf of $term")
        assert(rows.map(_.getLong(3)).sum ==
          toks.filter(_._1 == term).map(_._2).distinct.size, s"df of $term")
        // shards partition the postings: disjoint, correct residues
        val all = rows.flatMap(r => r.getSeq[Long](4).map(_ -> r.getLong(1)))
        assert(all.forall { case (d, s) => d % 3 == s })
        assert(all.map(_._1).distinct.size == all.size)
      }
    }
  }

  test("property: SymSpell join equals brute-force levenshtein on random short strings") {
    // the deletion-neighborhood theorem, exercised on arbitrary inputs:
    // for ANY corpus of short strings, the candidate-filtered operator
    // must return exactly the ed<=2 pairs brute force finds — losslessness
    // is the claim, so the property needs no planted structure
    val strGen: Gen[List[String]] = Gen.listOfN(12,
      Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
    forAll(strGen, minSuccessful = 5) { strs =>
      val docs = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "s")
      val got = graft.operators.Fuzzy.editDistancePairs(docs, "s", "doc_id", maxDist = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      val exp = docs.as("a").crossJoin(docs.as("b"))
        .filter($"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id", $"b.doc_id", levenshtein($"a.s", $"b.s").as("d"))
        .filter($"d" <= 2)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      assert(got == exp, s"strings $strs: got $got vs brute $exp")
    }
  }

  test("property: ADC identity — Pq search distance is the sum of its table lookups") {
    // for ANY vector corpus (ids re-keyed 0..n−1 so Lloyd's init contract
    // holds), every (query, neighbor) ADC distance must equal the
    // independent fold over codebook lookups — the defining equation of
    // asymmetric distance computation, input-agnostic
    val vecGen: Gen[List[Array[Float]]] = Gen.listOfN(10,
      Gen.listOfN(4, Gen.choose(-4, 4)).map(_.map(_.toFloat).toArray))
    forAll(vecGen, minSuccessful = 3) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
      val cb = graft.operators.Pq.pqTrain(df, m = 2, dim = 4, k = 2, iters = 1)
      val codes = graft.operators.Pq.pqEncode(df, cb, m = 2, dim = 4)
      val q = df.limit(2).select($"vec_id".as("qid"), $"embedding".as("qv"))
      val got = graft.operators.Pq.adcTopK(q, codes, cb, m = 2, dim = 4, topK = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
      val cents = cb.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
      val codeMap = codes.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      val all = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
      for (((qid, nid), ad) <- got) {
        val expect = (0 until 2).map { s =>
          val sv = all(qid).slice(s * 2, s * 2 + 2)
          val c = cents((s, codeMap((nid, s))))
          val d2 = sv.zip(c).foldLeft(0.0) { case (a, (x, y)) => a + (x - y) * (x - y) }
          math.floor(d2 * 1e6 + 0.5) / 1e6
        }.sum
        assert(math.floor(expect * 1e6 + 0.5) / 1e6 == ad, s"($qid,$nid)")
      }
    }
  }

  test("property: bisectQuantiles equals the sorted order statistic for ANY data") {
    val gen: Gen[List[(Int, Double)]] = Gen.nonEmptyListOf(for {
      g <- Gen.choose(0, 2)
      // values on the representable 2-decimal grid, wide range, heavy ties
      v <- Gen.choose(-100000, 100000).map(_ / 100.0)
    } yield (g, v))
    forAll(gen, minSuccessful = 6) { rows =>
      val df = rows.toDF("g", "v")
      val qs = Seq(0.1, 0.5, 0.75, 1.0)
      val got = graft.operators.Sketches
        .bisectQuantiles(df, "v", "g", qs, scale = 100, bins = 16)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
      val exp = rows.groupBy(_._1).toSeq.flatMap { case (g, grp) =>
        val sorted = grp.map(t => math.floor(t._2 * 100 + 0.5).toLong).sorted
        qs.map { q =>
          val k = math.ceil(q * sorted.length).toInt
          (g.toString, q, sorted(k - 1) / 100.0)
        }
      }.sortBy(t => (t._1, t._2))
      assert(got == exp)
    }
  }

  test("property: heavyHitters equals the census HAVING filter for ANY multiset") {
    val gen: Gen[List[String]] = Gen.nonEmptyListOf(for {
      z <- Gen.frequency(6 -> Gen.choose(0, 3), 4 -> Gen.choose(0, 200))
    } yield s"k$z")
    forAll(gen, minSuccessful = 6) { keys =>
      val df = keys.toDF("key")
      val k = 5
      val got = graft.operators.Sketches.heavyHitters(df, "key", k, w = 32, d = 4, seed = 3)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val thr = keys.size.toLong / k
      val exp = keys.groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .filter(_._2 > thr).sortBy { case (key, c) => (-c, key) }
      assert(got == exp, s"keys=${keys.size} thr=$thr")
    }
  }

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("property: skewAudit matches the sort-based reference on ANY keyed input") {
    val keysGen = Gen.nonEmptyListOf(Gen.choose(0L, 10L))
    forAll(keysGen, minSuccessful = 6) { keys =>
      val df = keys.zipWithIndex.map { case (k, i) => (k, i) }.toDF("uid", "pad")
      val r = graft.operators.Sketches.skewAudit(df, "uid", topK = 3).collect().head
      val counts = keys.groupBy(identity).values.map(_.size.toLong).toSeq.sorted
      def kth(q: Double) = counts(math.ceil(q * counts.size).toInt - 1)
      val topN = counts.sorted(Ordering[Long].reverse).take(3).sum
      assert(r.getLong(0) == counts.size && r.getLong(1) == keys.size.toLong)
      assert(r.getLong(2) == counts.max && r.getLong(3) == kth(0.5) &&
        r.getLong(4) == kth(0.99), s"quantiles: $r vs $counts")
      assert(r.getDouble(5) == q6(topN.toDouble / keys.size) &&
        r.getDouble(6) == q6(counts.max.toDouble / kth(0.5)), s"ratios: $r")
    }
  }

  test("property: basketRules equals the brute-force rule table on ANY baskets") {
    val liGen = Gen.nonEmptyListOf(for {
      o <- Gen.choose(1L, 8L); p <- Gen.choose(1L, 6L)
    } yield (o, p))
    forAll(liGen, minSuccessful = 6) { li =>
      val got = graft.operators.RelationalExt
        .basketRules(li.toDF("l_orderkey", "l_partkey"), minSupport = 2)
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)),
          (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
            r.getDouble(6)))).toMap
      val baskets = li.distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      val n = baskets.size.toLong
      val item = baskets.values.toSeq.flatten.groupBy(identity)
        .view.mapValues(_.size.toLong)
      val exp = baskets.values.toSeq
        .flatMap(s => s.toSeq.sorted.combinations(2).map(c => (c(0), c(1))))
        .groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= 2)
        .map { case ((a, b), nb) =>
          (a, b) -> ((nb, q6(nb.toDouble / n), q6(nb.toDouble / item(a)),
            q6(nb.toDouble / item(b)),
            q6(nb.toDouble * n / (item(a).toDouble * item(b))))) }
        .toMap
      assert(got == exp, s"got $got\nexp $exp")
    }
  }
}
