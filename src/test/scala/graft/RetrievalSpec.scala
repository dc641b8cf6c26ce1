package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "banana banana banana banana"),
    (3L, "apple cherry durian cherry"),
    (4L, "kiwi kiwi kiwi kiwi kiwi kiwi kiwi kiwi")
  ).toDF("doc_id", "text")

  test("bm25: hand-computed score on a 4-doc corpus") {
    // term 'durian': tf=1 only in doc 3 (dl=4). N=4, sum_dl=20, avgdl=5,
    // df=1 → idf = (4-1+0.5)/(1+0.5) = 7/3.
    // tfn = 1*2.2 / (1 + 1.2*(0.25 + 0.75*4/5)) = 2.2/2.02
    val got = Retrieval.bm25TopK(docs, Seq("durian"), k = 10).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(3L))
    val expected = (7.0 / 3.0) * (2.2 / (1.0 + 1.2 * (0.25 + 0.75 * 4.0 / 5.0)))
    assert(got(0).getDouble(1) == math.floor(expected * 1e6 + 0.5) / 1e6)
  }

  test("bm25: rare-term idf outranks common-term tf mass") {
    // 'durian' df=1 (doc 3); 'banana' df=2 with tf=4 in doc 2 — the rare
    // term's single occurrence must outscore the common term's pile-up.
    val got = Retrieval.bm25TopK(docs, Seq("durian", "banana"), k = 10).collect()
    assert(got.head.getLong(0) == 3L)
    assert(got.map(_.getLong(0)).contains(2L))
  }

  test("bm25: docs with no query term are excluded; ties break on doc_id") {
    val got = Retrieval.bm25TopK(docs, Seq("apple"), k = 10).collect()
    // docs 1 and 3 contain 'apple' (tf 2 and 1); 2 and 4 must not appear
    assert(got.map(_.getLong(0)).toSet == Set(1L, 3L))
    // doc 1: tf=2, same dl → strictly higher tf-norm → ranks first
    assert(got.head.getLong(0) == 1L)
  }

  test("bm25 plan: corpus side has no shuffle — only the one-row stats agg") {
    // k strictly below the corpus row count — otherwise EliminateLimits
    // drops the limit (k >= maxRows) and the top-k degenerates to a sort
    val plan = Retrieval.bm25TopK(docs, Seq("apple", "banana"), k = 2)
      .queryExecution.executedPlan.toString
    // exactly one Exchange pair: the partial→final stats agg; the doc side
    // feeds the top-k via BroadcastNestedLoopJoin of the 1-row stats
    val shuffles = "Exchange hashpartitioning|Exchange SinglePartition".r
      .findAllIn(plan).size
    assert(shuffles <= 1, s"expected at most the stats-agg exchange:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("invertedIndex: sharding, postings order, df/cf consistency, cap") {
    val idx = Retrieval.invertedIndex(docs, nShards = 2, maxPostings = 2).collect()
    val byKey = idx.map(r => (r.getString(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getSeq[Long](4))).toMap
    // 'banana': doc 1 (shard 1, cf 1) and doc 2 (shard 0, cf 4)
    assert(byKey(("banana", 0L)) == ((4L, 1L, Seq(2L))))
    assert(byKey(("banana", 1L)) == ((1L, 1L, Seq(1L))))
    // 'cherry' doc 1 (cf 1) + doc 3 (cf 2): both odd → one shard-1 row
    assert(byKey(("cherry", 1L)) == ((3L, 2L, Seq(1L, 3L))))
    assert(!byKey.contains(("cherry", 0L)))
    for (((_, shard), (cf, df, ps)) <- byKey) {
      assert(cf >= df && ps.size <= 2 && ps == ps.sorted)
      assert(ps.forall(_ % 2 == shard))
    }
  }

  test("phraseSearch: multiplicity, overlaps, and 3-token phrases") {
    val corpus = Seq(
      (1L, "a b c a b c"),      // "a b c" twice
      (2L, "a a a"),            // "a a" OVERLAPS: starts at 1 and 2
      (3L, "a b"),              // prefix only — no "a b c"
      (4L, "c b a")             // right terms, wrong order
    ).toDF("doc_id", "text")
    val abc = Retrieval.phraseSearch(corpus, Seq("a", "b", "c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(abc == Map(1L -> 2L))
    val aa = Retrieval.phraseSearch(corpus, Seq("a", "a")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aa == Map(2L -> 2L), "overlapping occurrences both count")
  }

  test("phraseSearch plan: the corpus is exploded ONCE — no per-term re-scan") {
    // K generators in the plan would mean K corpus scans at 100 TB; the
    // vote formulation keeps exactly one, with the (term, k) index broadcast
    val plan = Retrieval.phraseSearch(docs, Seq("a", "b", "c"))
      .queryExecution.executedPlan.toString
    val generators = "Generate posexplode".r.findAllIn(plan).size
    assert(generators == 1, s"expected a single explode:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("invertedIndex: postings cap keeps the smallest doc_ids") {
    val many = (0L until 10L).map(i => (i, "zebra")).toDF("doc_id", "text")
    val idx = Retrieval.invertedIndex(many, nShards = 1, maxPostings = 3).collect()
    assert(idx.length == 1)
    assert(idx(0).getSeq[Long](4) == Seq(0L, 1L, 2L))
    assert(idx(0).getLong(3) == 10L, "df counts ALL docs, not the capped prefix")
  }

  test("rrfFusion: a doc present in BOTH rankings beats each single-list winner") {
    import org.apache.spark.sql.functions._
    // lex pool (pool=2): doc1 rank 1, doc2 rank 2; doc3 has no query term.
    // sem pool (pool=2): doc3 rank 1 (cos 1), doc2 rank 2; doc1 excluded.
    // RRF: doc2 = 1/62+1/62 > doc1 = doc3 = 1/61 (tie -> doc_id order).
    val docs = Seq((1L, "alpha alpha alpha"), (2L, "alpha beta"), (3L, "gamma delta"))
      .toDF("doc_id", "text")
    val embs = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f)),
      (2L, Seq(0.9f, 0.1f, 0f, 0f)), (3L, Seq(1f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val out = Retrieval.rrfFusion(docs, embs, Seq("alpha"),
      queryVec = 0L, pool = 2, k0 = 60, topK = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq == Seq(2L, 1L, 3L), s"got ${out.toSeq}")
    val r2 = out.find(_._1 == 2L).get
    assert(r2._2 == 2 && r2._3 == 2, s"doc2 is rank 2 in both lists: $r2")
    assert(r2._4 == math.floor((1.0 / 62 + 1.0 / 62) * 1e6 + 0.5) / 1e6)
    // absent ranks surface as 0, never null
    assert(out.find(_._1 == 3L).get._2 == 0 && out.find(_._1 == 1L).get._3 == 0)
  }
}
