package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}
import graft.functions.TextOps

/** Ranked retrieval over the `documents` table — the corpus-search side of
  * a training-data pipeline (near-dup mining, contamination triage, and
  * "find me documents like X" audits all reduce to scoring a corpus against
  * a small term set).
  *
  * Scale shape shared by both operators: the corpus is the fact side and
  * NEVER shuffles its text. BM25 needs exactly one extra exchange — the
  * one-row corpus-statistics aggregate (N, Σdl, per-term df), which partial
  * aggregation collapses map-side — broadcast back over the scan. The
  * inverted index shuffles only (term, doc_id) pairs, sharded so no single
  * reducer ever holds a full posting list.
  */
object Retrieval {

  /** BM25 top-k with the RATIONAL odds form of idf,
    * `(N - df + 0.5) / (df + 0.5)` — same document ordering as the classic
    * `ln`-idf for a single term and strictly positive for any df (the
    * log form goes negative past df > N/2, silently deleting evidence from
    * common terms). Chosen over the log form for the gate because every
    * input is an exact integer count (sums of integer-valued doubles are
    * exact in IEEE at any summation order), so the whole score is a fixed
    * dag of IEEE ops over identical operands — bit-equal cross-engine, and
    * the output floor-quantization is belt-and-braces, not load-bearing.
    *
    * Plan: per-term tf is row-local (`size(filter(tokens, _ == term))` —
    * the token array is projected once and re-used by every term column);
    * the only shuffle is the one-row stats agg, re-broadcast via cross
    * join; the top-k is TakeOrderedAndProject. At 100 TB: scan-bound, one
    * scalar exchange, no corpus shuffle.
    */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty)
    val tfCols = queryTerms.indices.map { i =>
      size(filter(col("t"), x => x === lit(queryTerms(i)))).cast("double").as(s"tf_$i")
    }
    // two-step select: `t` stays an attribute, so the per-term tf columns
    // share ONE tokenization (CollapseProject refuses to inline a non-cheap
    // alias consumed more than once)
    val base = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .select(col("doc_id") +: size(col("t")).cast("double").as("dl") +: tfCols: _*)
    val statCols = Seq(
      count(lit(1)).cast("double").as("n_docs"),
      sum(col("dl")).as("sum_dl")) ++
      queryTerms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).cast("double").as(s"df_$i"))
    val stats = base.agg(statCols.head, statCols.tail: _*)
    val avgdl = col("sum_dl") / col("n_docs")
    def idf(i: Int): Column =
      (col("n_docs") - col(s"df_$i") + lit(0.5)) / (col(s"df_$i") + lit(0.5))
    def tfNorm(i: Int): Column =
      (col(s"tf_$i") * lit(2.2)) /
        (col(s"tf_$i") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))
    val score = queryTerms.indices.map(i => idf(i) * tfNorm(i)).reduceLeft(_ + _)
    base.crossJoin(broadcast(stats))
      .withColumn("score_raw", score)
      .filter(col("score_raw") > 0)
      .select(col("doc_id"),
        (floor(col("score_raw") * 1e6 + 0.5) / 1e6).as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }

  /** DuckDB twin of [[bm25TopK]] — operand-for-operand the same IEEE dag
    * (literals CAST to DOUBLE so DuckDB's default DECIMAL typing can't
    * change a single rounding). */
  /** The WITH-body shared by q95's and q148's oracles (one spelling of
    * the BM25 dag — the ADVICE drift rule). */
  private def bm25ScoredCtes(terms: Seq[String]): String = {
    val tf = terms.indices.map(i =>
      s"CAST(len(list_filter(string_split(text, ' '), x -> x = '${terms(i)}')) AS DOUBLE) AS tf_$i")
      .mkString(",\n    ")
    val df = terms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_$i").mkString(",\n    ")
    val score = terms.indices.map { i =>
      s"""((n_docs - df_$i + CAST(0.5 AS DOUBLE)) / (df_$i + CAST(0.5 AS DOUBLE)))
         | * ((tf_$i * CAST(2.2 AS DOUBLE))
         |    / (tf_$i + CAST(1.2 AS DOUBLE)
         |       * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / (sum_dl / n_docs))))"""
        .stripMargin
    }.mkString("\n  + ")
    s"""base AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl,
       |    $tf
       |  FROM documents),
       |stats AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, sum(dl) AS sum_dl,
       |    $df
       |  FROM base),
       |scored AS (
       |  SELECT doc_id,
       |  $score AS score_raw
       |  FROM base, stats),
       |ranked AS (
       |  SELECT doc_id, floor(score_raw * 1e6 + 0.5) / 1e6 AS score
       |  FROM scored WHERE score_raw > 0)""".stripMargin
  }

  private def bm25Oracle(terms: Seq[String], k: Int): String =
    s"""WITH ${bm25ScoredCtes(terms)}
       |SELECT doc_id, score
       |FROM ranked
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin

  /** Reciprocal-rank fusion — the standard hybrid-retrieval merge: a
    * lexical ranking ([[bm25TopK]]) and a semantic ranking (cosine against
    * a query embedding, doc_id ≡ vec_id) fuse by
    *   rrf(d) = Σ_lists 1/(k₀ + rank_list(d))
    * with a doc absent from a list contributing 0. Rank-based fusion
    * needs no score calibration between the two systems — which is why
    * it's the production default. Distributed shape: each ranking is its
    * own bounded top-`pool` (BM25's broadcast-stats scan; cosine's
    * TakeOrdered over one map pass), the fusion is an outer join of two
    * pool-sized frames, and every score is a quantized rational of
    * integer ranks — bit-replayable. */
  def rrfFusion(docs: DataFrame, embs: DataFrame, queryTerms: Seq[String],
      queryVec: Long = 0L, pool: Int = 20, k0: Int = 60, topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorOps
    // windows are over pool-sized frames (bounded), not the corpus
    val wLex = Window.orderBy(col("score").desc, col("doc_id"))
    val lex = bm25TopK(docs, queryTerms, pool)
      .withColumn("r_lex", row_number().over(wLex))
      .select(col("doc_id"), col("r_lex"))
    val q = embs.filter(col("vec_id") === queryVec)
      .select(col("embedding").as("qv"))
    val wSem = Window.orderBy(col("cos").desc, col("doc_id"))
    val sem = embs.filter(col("vec_id") =!= queryVec)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        (floor(VectorOps.cosine(col("embedding"), col("qv")) * 1e6 + 0.5) / 1e6).as("cos"))
      .orderBy(col("cos").desc, col("doc_id")).limit(pool)
      .withColumn("r_sem", row_number().over(wSem))
      .select(col("doc_id"), col("r_sem"))
    val contrib = (r: Column) =>
      when(r.isNull, lit(0.0)).otherwise(lit(1.0) / (lit(k0) + r))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("r_lex"), lit(0)).as("r_lex"),
        coalesce(col("r_sem"), lit(0)).as("r_sem"),
        (floor((contrib(col("r_lex")) + contrib(col("r_sem"))) * 1e6 + 0.5) / 1e6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(topK)
  }

  private def rrfOracle(terms: Seq[String], queryVec: Long, pool: Int,
      k0: Int, topK: Int): String = {
    val cos = "list_sum(list_transform(list_zip(n.v, q.qv), t -> t[1] * t[2]))" +
      " / nullif(sqrt(list_sum(list_transform(n.v, x -> x * x)))" +
      " * sqrt(list_sum(list_transform(q.qv, x -> x * x))), 0.0)"
    s"""WITH ${bm25ScoredCtes(terms)},
       |lexpool AS (
       |  SELECT doc_id, score FROM ranked
       |  ORDER BY score DESC, doc_id LIMIT $pool),
       |lex AS (
       |  SELECT doc_id,
       |    row_number() OVER (ORDER BY score DESC, doc_id) AS r_lex
       |  FROM lexpool),
       |ev AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |qv AS (SELECT v AS qv FROM ev WHERE vec_id = $queryVec),
       |sempool AS (
       |  SELECT n.vec_id AS doc_id,
       |    floor(($cos) * 1e6 + 0.5) / 1e6 AS cos
       |  FROM ev n, qv q WHERE n.vec_id != $queryVec
       |  ORDER BY cos DESC, doc_id LIMIT $pool),
       |sem AS (
       |  SELECT doc_id,
       |    row_number() OVER (ORDER BY cos DESC, doc_id) AS r_sem
       |  FROM sempool),
       |f AS (
       |  SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
       |    coalesce(l.r_lex, 0) AS r_lex, coalesce(s.r_sem, 0) AS r_sem,
       |    floor((CASE WHEN l.r_lex IS NULL THEN CAST(0.0 AS DOUBLE)
       |             ELSE CAST(1.0 AS DOUBLE) / ($k0 + l.r_lex) END
       |           + CASE WHEN s.r_sem IS NULL THEN CAST(0.0 AS DOUBLE)
       |             ELSE CAST(1.0 AS DOUBLE) / ($k0 + s.r_sem) END)
       |          * 1e6 + 0.5) / 1e6 AS rrf
       |  FROM lex l FULL OUTER JOIN sem s ON s.doc_id = l.doc_id)
       |SELECT doc_id, CAST(r_lex AS BIGINT) AS r_lex,
       |  CAST(r_sem AS BIGINT) AS r_sem, rrf
       |FROM f ORDER BY rrf DESC, doc_id LIMIT $topK""".stripMargin
  }

  /** Doc-sharded inverted index: `(term, shard) → (cf, df, postings)` where
    * `shard = doc_id % nShards`. The sharding is the 100 TB design point:
    * a web-scale term's posting list does not fit one reducer, so the index
    * is built (and served) doc-partitioned — every reducer holds at most
    * `|corpus| / nShards` of any term's postings, and a query fans out to
    * `nShards` lookups merged client-side. `maxPostings` caps the stored
    * prefix (sorted ascending, so the cap keeps the smallest doc_ids —
    * deterministic). cf counts occurrences (with multiplicity), df counts
    * distinct documents, both per shard.
    */
  def invertedIndex(docs: DataFrame, nShards: Int, maxPostings: Int): DataFrame =
    docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy(col("term"), (col("doc_id") % nShards).as("shard"))
      .agg(count(lit(1)).as("cf"),
        sort_array(collect_set(col("doc_id"))).as("ps"))
      .select(col("term"), col("shard"), col("cf"),
        size(col("ps")).cast("long").as("df"),
        slice(col("ps"), 1, maxPostings).as("postings"))
      .orderBy(col("term"), col("shard"))

  /** Positional-index phrase search: find documents containing the exact
    * token sequence `phrase`, from per-term POSITIONS instead of
    * substring-scanning text. A token at position p matching phrase term k
    * votes for candidate start `p − k`; a start that collects ALL
    * `phrase.length` DISTINCT k votes is an occurrence (each vote asserts
    * token(start+k) = phrase(k), so a full set is exactly a match —
    * including overlapping and repeated-term phrases).
    *
    * Physical shape — and why it beats the textbook "join the position
    * lists per term": the corpus is scanned and exploded ONCE, the
    * K-row (term, k) index broadcasts, and the vote count is one
    * partial-aggregated shuffle of (doc, start) pairs for phrase-term
    * positions only. A per-term-branch join would re-scan the corpus per
    * term (Catalyst pushes each branch's `term = tₖ` filter below any
    * shared exchange, defeating ReuseExchange — the q46 semi-join rule),
    * and per-phrase-term position lists never materialize anywhere. */
  def phraseSearch(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.length >= 2, "a phrase needs at least two tokens")
    val session = docs.sparkSession
    import session.implicits._
    val termIdx = phrase.zipWithIndex.toDF("term", "k")
    docs
      .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "term")))
      .join(broadcast(termIdx), "term") // keeps phrase-term positions only
      .groupBy(col("doc_id"), (col("pos") - col("k")).as("start"))
      .agg(countDistinct(col("k")).as("nk"))
      .filter(col("nk") === phrase.length)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
      .orderBy(col("doc_id"))
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- q148: reciprocal-rank fusion (hybrid retrieval) -------------------
    // q95's lexical pool fused with a cosine pool for query vector 0;
    // the oracle shares the BM25 CTE body (one dag spelling) and replays
    // both rankings and the quantized 1/(60+r) sum.
    QueryDef(
      "q148_rrf_fusion",
      (s, d) => rrfFusion(Tables.documents(s, d), Tables.embeddings(s, d),
        Seq("dup", "spark", "merge", "vector")),
      Some(rrfOracle(Seq("dup", "spark", "merge", "vector"),
        queryVec = 0L, pool = 20, k0 = 60, topK = 10))),

    // ---- q95: BM25 ranked retrieval ----------------------------------------
    // Terms mix one rare token (high idf — 'dup' appears in ~5% of docs)
    // with three mid-frequency ones, so the ranking exercises the idf
    // spread, not just tf mass.
    QueryDef(
      "q95_bm25_topk",
      (s, d) => bm25TopK(Tables.documents(s, d),
        Seq("dup", "spark", "merge", "vector"), k = 20),
      Some(bm25Oracle(Seq("dup", "spark", "merge", "vector"), k = 20))),

    // ---- q96: sharded inverted index ---------------------------------------
    // Gate output is scalar-only (driver sort_values crashes on ndarray
    // cells): the BIGINT[] posting list serializes to a comma-joined
    // string on both sides — exact for integers. invertedIndex itself
    // keeps the typed array API.
    QueryDef(
      "q96_inverted_index",
      (s, d) => invertedIndex(Tables.documents(s, d), nShards = 4, maxPostings = 12)
        .select(col("term"), col("shard"), col("cf"), col("df"),
          array_join(transform(col("postings"), _.cast("string")), ",").as("postings")),
      Some("""WITH x AS (
             |  SELECT doc_id, doc_id % 4 AS shard,
             |         unnest(string_split(text, ' ')) AS term
             |  FROM documents)
             |SELECT term, shard, count(*) AS cf,
             |  CAST(len(list_distinct(list(doc_id))) AS BIGINT) AS df,
             |  array_to_string(list_transform(
             |    list_slice(list_sort(list_distinct(list(doc_id))), 1, 12),
             |    x -> CAST(x AS VARCHAR)), ',') AS postings
             |FROM x GROUP BY term, shard ORDER BY term, shard""".stripMargin)),

    // ---- q100: positional-index phrase search ------------------------------
    // CROSS-ALGORITHM oracle: Spark answers by joining per-term position
    // lists; DuckDB answers by scanning each token array for consecutive
    // matches. Two different algorithms agreeing on (docs, multiplicity)
    // checks the semantics, not the implementation.
    QueryDef(
      "q100_phrase_search",
      (s, d) => phraseSearch(Tables.documents(s, d), Seq("table", "value")),
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |h AS (
             |  SELECT doc_id,
             |    len([i for i in range(1, len(t) - 2 + 2)
             |         if t[i] = 'table' AND t[i+1] = 'value']) AS n_hits
             |  FROM t)
             |SELECT doc_id, n_hits FROM h WHERE n_hits > 0
             |ORDER BY doc_id""".stripMargin)),
  )
}
