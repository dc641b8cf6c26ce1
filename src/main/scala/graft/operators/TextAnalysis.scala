package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}
import graft.functions.TextOps

/** Text-analysis operators over the `documents` table: token statistics,
  * quality scoring, language identification, canonical fingerprinting.
  * All row-local expression pipelines — at 100 TB these are pure map
  * stages that scale with input splits (the only shuffle is the final
  * small groupBy where present).
  */
object TextAnalysis {

  /** N-gram language-model quality scoring — the KenLM-shaped filter of a
    * training-data pipeline: score every document by its mean bigram
    * log-probability under a model trained on the corpus itself.
    *
    * The model is PRUNED to the `topK` most frequent bigrams ((freq DESC,
    * gram) — deterministic cut); unseen bigrams back off to stupid-backoff
    * unigram probability, 0.4 · c(w₂)/N. That pruning is what makes the
    * shape work at 100 TB: the full bigram table is corpus-sized (a fat
    * shuffle join to score against), but the pruned table + the unigram
    * census are MBs — both broadcast, so the corpus side is explode →
    * broadcast-join → one groupBy(doc_id) with map-side partial agg, and
    * never shuffles its text. (Production would persist the two model
    * tables once and reuse them per batch; here train + score fuse into
    * one plan so the gate replays it.)
    *
    * Numerics: every ln() argument is a ratio of exact integer counts
    * (identical doubles cross-engine); the mean is noise-dominated (≥1e-16
    * relative summation noise against a ~1-magnitude value), so round(…, 6)
    * is hash-stable per the repo's rounding rule. */
  def lmScore(docs: DataFrame, topK: Int): DataFrame = {
    val uni = docs.select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cu"))
    val total = uni.agg(sum("cu").as("n_total"))
    val bg = docs.select(explode(TextOps.ngrams(col("text"), 2)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("cb"))
      .orderBy(desc("cb"), asc("g")).limit(topK)
    docs
      .select(col("doc_id"), explode(TextOps.ngrams(col("text"), 2)).as("g"))
      .withColumn("w1", element_at(split(col("g"), " "), 1))
      .withColumn("w2", element_at(split(col("g"), " "), 2))
      .join(broadcast(bg), Seq("g"), "left")
      .join(broadcast(uni.select(col("w").as("w1"), col("cu").as("cu1"))), Seq("w1"))
      .join(broadcast(uni.select(col("w").as("w2"), col("cu").as("cu2"))), Seq("w2"))
      .crossJoin(broadcast(total))
      .withColumn("lp",
        when(col("cb").isNotNull, log(col("cb").cast("double") / col("cu1")))
          .otherwise(log(lit(0.4)) + log(col("cu2").cast("double") / col("n_total"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("lp")), 6).as("lm_score"))
  }

  /** Interpolated trigram LM scoring (Jelinek–Mercer): per-trigram
    * probability λ₃·p(w₃|w₁w₂) + λ₂·p(w₃|w₂) + λ₁·p(w₃), with the trigram
    * and bigram models PRUNED to their `topK` most frequent entries and
    * the unigram census kept whole — [[lmScore]]'s shape one order up.
    * Interpolation (not backoff) means absent higher-order entries simply
    * contribute zero and the unigram floor keeps every seen word's
    * probability positive — no special-casing, one smooth formula.
    *
    * Same 100 TB contract as q90: all three model tables are bounded
    * (topK, topK, vocabulary) and BROADCAST with their probabilities
    * precomputed as ratios of exact integer counts; the corpus side is
    * one trigram explode → three broadcast joins → one groupBy(doc_id)
    * partial agg, and never shuffles its text. Numerics: identical count
    * ratios → identical doubles; the weighted sum is a fixed-order IEEE
    * dag; ln() of identical doubles; round(avg, 6) absorbs summation
    * order (the proven q90 discipline). */
  def lmScoreTrigram(docs: DataFrame, topK: Int): DataFrame = {
    val toks = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
    val uni = docs.select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cu"))
    val total = uni.agg(sum("cu").as("n_total"))
    val big = docs.select(explode(TextOps.ngrams(col("text"), 2)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c2"))
    val tri = docs.select(explode(TextOps.ngrams(col("text"), 3)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c3"))
    // pruned conditional tables with ratio probabilities baked in:
    // p3 = c3(w1 w2 w3) / c2(w1 w2); p2 = c2(w2 w3) / cu(w2)
    val m3 = tri.orderBy(desc("c3"), asc("g")).limit(topK)
      .withColumn("ctx", concat_ws(" ",
        element_at(split(col("g"), " "), 1), element_at(split(col("g"), " "), 2)))
      .join(big.select(col("g").as("ctx"), col("c2").as("cctx")), Seq("ctx"))
      .select(col("g").as("g3"), (col("c3").cast("double") / col("cctx")).as("p3"))
    val m2 = big.orderBy(desc("c2"), asc("g")).limit(topK)
      .withColumn("w1", element_at(split(col("g"), " "), 1))
      .join(uni.select(col("w").as("w1"), col("cu").as("cu1")), Seq("w1"))
      .select(col("g").as("g2"), (col("c2").cast("double") / col("cu1")).as("p2"))
    docs
      .select(col("doc_id"), explode(TextOps.ngrams(col("text"), 3)).as("g3"))
      .withColumn("g2", concat_ws(" ",
        element_at(split(col("g3"), " "), 2), element_at(split(col("g3"), " "), 3)))
      .withColumn("w3", element_at(split(col("g3"), " "), 3))
      .join(broadcast(m3), Seq("g3"), "left")
      .join(broadcast(m2), Seq("g2"), "left")
      .join(broadcast(uni.select(col("w").as("w3"), col("cu").as("cu3"))), Seq("w3"))
      .crossJoin(broadcast(total))
      .withColumn("lp", log(
        lit(0.6) * coalesce(col("p3"), lit(0.0d)) +
          lit(0.3) * coalesce(col("p2"), lit(0.0d)) +
          lit(0.1) * (col("cu3").cast("double") / col("n_total"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"), round(avg(col("lp")), 6).as("lm3_score"))
  }

  /** Hashed-bigram linear text classifier — the fastText-shaped
    * MODEL-BASED quality filter of modern data pipelines (DCLM/FineWeb
    * style: a trained linear model over hashed n-gram features scores
    * every document; score > threshold keeps it). The heuristic filters
    * (q41 quality, q70 Gopher) are rule-based; this is the learned-model
    * face of the same stage with the weights supplied as literals (in
    * production they come from any offline trainer; the engine's job is
    * the SCORING pass, which must scale).
    *
    * Features: word bigrams WITH multiplicity, hashed to `weights.length`
    * buckets by the first 8 md5 hex digits (md5 is the engine-portable
    * hash — identical text → identical hex on any engine; 8 hex digits →
    * [0, 2³²), no sign or overflow concerns under ANSI). Logit = bias +
    * mean bucket weight over the document's bigrams (mean, not sum, so
    * the score is length-invariant like fastText's). Scale: row-local
    * Column dag — no shuffle, no UDF, scales with input splits; the
    * weight table is a plan literal (k/256 rationals: every partial sum
    * is exact in IEEE, so cross-engine equality needs only the final
    * division's 1e-6 floor-quantization).
    */
  def classifierLogit(text: Column, weights: Array[Double], bias: Double): Column =
    gramLogit(TextOps.ngrams(text, 2), weights, bias)

  /** [[classifierLogit]] over an already-built bigram array — split out so
    * callers scoring plus counting can materialize the grams ONCE through a
    * projection boundary (CollapseProject keeps non-cheap aliases that are
    * referenced more than once, so the tokenize+ngram pass runs once per
    * row instead of once per consuming expression). */
  def gramLogit(bgs: Column, weights: Array[Double], bias: Double): Column = {
    val wLit = array(weights.map(lit): _*)
    val bucket = (g: Column) =>
      (conv(substring(md5(g), 1, 8), 16, 10).cast("long") % weights.length).cast("int")
    val sumW = aggregate(bgs, lit(0.0d), (acc, g) => acc + element_at(wLit, bucket(g) + 1))
    val n = greatest(size(bgs), lit(1)).cast("double")
    floor((lit(bias) + sumW / n) * lit(1e6) + lit(0.5)) / lit(1e6)
  }

  /** [[classifierLogit]] applied to a corpus: (doc_id, n_bigrams, logit,
    * keep) — `keep` is the filter decision at threshold `tau`. */
  def linearQualityFilter(docs: DataFrame, weights: Array[Double],
      bias: Double, tau: Double): DataFrame =
    docs.select(col("doc_id"), TextOps.ngrams(col("text"), 2).as("bgs"))
      .select(col("doc_id"), size(col("bgs")).as("n_bigrams"),
        gramLogit(col("bgs"), weights, bias).as("logit"))
      .withColumn("keep", col("logit") > tau)

  /** Collocation extraction — adjacent token pairs that co-occur far more
    * than their unigram frequencies predict (the phrase-mining step ahead
    * of tokenizer/vocab decisions: "new york" should be one token). The
    * score is pointwise mutual information in RATIO form,
    * lift = p(a,b) / (p(a)·p(b)) = c_ab·M² / (N·c_a·c_b) — log(lift) IS
    * PMI and log is monotone, so ranking by lift ranks by PMI while
    * staying transcendental-free (the CLAUDE.md numerics rule: the gate
    * replays the ratio bit-identically, which log would not allow).
    * A minimum pair count keeps 1-occurrence noise (lift ≈ M²/(N·c_a·c_b),
    * huge for rare unigrams) out of the head.
    *
    * Scale shape: two vocab-sized censuses (bigram, unigram) off one
    * corpus pass each; totals from per-doc counts (no explode) broadcast
    * as one row; unigram counts joined onto the bigram census (census ⋈
    * census, never corpus); TakeOrdered top-k. Corpus text never
    * shuffles. */
  def collocations(docs: DataFrame, minCount: Int, topK: Int,
      textCol: String = "text"): DataFrame = {
    val bigrams = docs
      .select(explode(TextOps.ngrams(col(textCol), 2)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
      .select(element_at(split(col("g"), " "), 1).as("a"),
        element_at(split(col("g"), " "), 2).as("b"), col("c_ab"))
    val unigrams = docs
      .select(explode(TextOps.tokens(col(textCol))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val totals = docs.agg(
      sum(TextOps.tokenCount(col(textCol))).as("m_tot"),
      sum(greatest(TextOps.tokenCount(col(textCol)) - 1, lit(0))).as("n_big"))
    val lift = (col("c_ab").cast("double") * col("m_tot").cast("double")
      * col("m_tot").cast("double")) /
      (col("n_big").cast("double") * col("c_a").cast("double")
        * col("c_b").cast("double"))
    bigrams
      .join(unigrams.select(col("t").as("a"), col("c").as("c_a")), "a")
      .join(unigrams.select(col("t").as("b"), col("c").as("c_b")), "b")
      .crossJoin(broadcast(totals))
      .select(col("a"), col("b"), col("c_ab"),
        (floor(lift * 1e6 + 0.5) / 1e6).as("lift"))
      .orderBy(desc("lift"), col("a"), col("b"))
      .limit(topK)
  }

  /** Distinctive terms per source — the domain-signature diagnostic of a
    * corpus mix: for each source, the tokens whose within-source rate
    * most exceeds their corpus rate,
    *   lift = (c_st · N) / (c_t · N_s)
    * (the same ratio-form PMI discipline as [[collocations]] — a pure
    * rational of exact counts, floor-quantized, no ln). A count floor on
    * the GLOBAL token count kills hapax noise. Shape at 100 TB: one
    * explode + (source, token) partial-agg census is the only
    * corpus-sized stage; the global token census derives FROM that census
    * (never re-scans text), the per-source totals broadcast, and the
    * top-k rank is a WindowGroupLimit-pruned window over census rows
    * partitioned by source. */
  def distinctiveTerms(docs: DataFrame, topK: Int = 10,
      minCount: Long = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.core.Lineage.CutOps
    // the census feeds FOUR consumers (global census, per-source totals,
    // grand total, the lift join) — cut it so the corpus explode runs
    // once, not once per consumer
    val cst = docs
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c_st"))
      .cutLineage()
    val ct = cst.groupBy(col("tok")).agg(sum(col("c_st")).as("c_t"))
    val ns = cst.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
    val tot = cst.agg(sum(col("c_st")).as("n_tot"))
    val lift = (col("c_st").cast("double") * col("n_tot").cast("double")) /
      (col("c_t").cast("double") * col("n_s").cast("double"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("lift").desc, col("tok"))
    cst
      .join(ct, "tok").filter(col("c_t") >= minCount)
      .join(broadcast(ns), "source")
      .crossJoin(broadcast(tot))
      .withColumn("lift", floor(lift * 1e6 + 0.5) / 1e6)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("source"), col("rank"), col("tok"), col("c_st"), col("lift"))
      .orderBy(col("source"), col("rank"))
  }

  /** Per-document keyword extraction — TF-IDF's ranking with the idf
    * replaced by the raw tf/df ratio, which preserves the ORDER tf·idf
    * induces per document for fixed tf (idf is monotone-decreasing in
    * df) while keeping every score a single IEEE division of two exact
    * integers — no ln() near a rank boundary (the transcendental-replay
    * rule). One corpus explode into a materialized (doc, token) tf
    * census; the df census derives from it (a token with hot df joins
    * 1:1 against census rows — fan never multiplies); the per-doc top-k
    * is WindowGroupLimit-pruned. `minDf` suppresses hapax typos. */
  def docKeywords(docs: DataFrame, topK: Int = 3,
      minDf: Long = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.core.Lineage.CutOps
    val tf = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      .cutLineage()
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("tok"))
    tf.join(df.filter(col("df") >= minDf), Seq("tok"))
      .withColumn("score",
        floor(col("tf").cast("double") / col("df").cast("double") * 1e6
          + lit(0.5)) / 1e6)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("rank"), col("tok"), col("tf"), col("df"),
        col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** Zipf power-law fit — the corpus-health diagnostic on the token
    * frequency spectrum: least-squares slope of ln(freq) against ln(rank)
    * over the top-`topK` tokens (natural text sits near −1; a synthetic
    * or template-heavy corpus drifts visibly). One vocab census (the q81
    * shape) → TakeOrdered head → a topK-row bounded regression. ln() is
    * transcendental but its args are identical integer-valued doubles on
    * both engines and every output is a noise-dominated regression
    * aggregate — the lmScore rounding discipline (round 6). */
  def zipfFit(docs: DataFrame, topK: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val head = docs.select(explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("tok")).limit(topK)
    val w = Window.orderBy(col("freq").desc, col("tok")) // topK rows only
    val pts = head
      .withColumn("rank", row_number().over(w))
      .select(log(col("rank").cast("double")).as("x"),
        log(col("freq").cast("double")).as("y"))
    val num = col("m") * col("sxy") - col("sx") * col("sy")
    val denx = col("m") * col("sxx") - col("sx") * col("sx")
    val deny = col("m") * col("syy") - col("sy") * col("sy")
    pts.agg(count(lit(1)).cast("double").as("m"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("m").cast("long").as("n_points"),
        round(num / denx, 6).as("slope"),
        round((col("sy") - num / denx * col("sx")) / col("m"), 6).as("intercept"),
        round(num * num / (denx * deny), 6).as("r2"))
  }

  /** Out-of-vocabulary rate per source — the tokenizer-coverage audit: the
    * share of token occurrences a top-`vocabK` vocabulary would miss,
    * sliced by source (a source with a high OOV rate is the one that will
    * fragment into bytes under the trained tokenizer). The vocabulary is
    * the q81 census head (freq DESC, token — deterministic cut),
    * broadcast; membership is then a broadcast left join on the exploded
    * stream feeding one per-source partial agg — corpus text never
    * shuffles. (Production trains the vocab once and persists it; the
    * gate fuses train + audit into one plan, the lmScore discipline.) */
  def oovRate(docs: DataFrame, vocabK: Int = 500): DataFrame = {
    val vocab = docs.select(explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("tok")).limit(vocabK)
      .select(col("tok"), lit(1).as("iv"))
    val rate = col("n_oov").cast("double") / col("n_tokens").cast("double")
    docs.select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
      .join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("iv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("source"), col("n_tokens"), col("n_oov"),
        (floor(rate * 1e6 + 0.5) / 1e6).as("oov_rate"))
      .orderBy(col("source"))
  }

  /** Vocabulary coverage curve — the tokenizer-sizing census: how much of
    * the corpus the top-r token types cover, reported at power-of-two
    * ranks. The token census shuffles once; the head is TakeOrdered-
    * bounded to `maxRank` rows (the zipfFit discipline — the ranking
    * window never sees the open vocabulary), and the corpus total is a
    * one-row broadcast. Shares are floor-quantized exact rationals. */
  def vocabCoverage(docs: DataFrame, maxRank: Int = 65536): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val census = docs.select(explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    val tot = census.agg(sum(col("freq")).as("n_tot"))
    val head = census.orderBy(col("freq").desc, col("tok")).limit(maxRank)
    val w = Window.orderBy(col("freq").desc, col("tok")) // maxRank rows only
    head
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_n", sum(col("freq")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      // power-of-two rank points: rank & (rank-1) == 0
      .filter(expr("(rank & (rank - 1)) = 0"))
      .crossJoin(broadcast(tot))
      .select(col("rank"), col("cum_n"),
        (floor(col("cum_n").cast("double") / col("n_tot").cast("double")
          * 1e6 + lit(0.5)) / 1e6).as("cum_share"))
      .orderBy(col("rank"))
  }

  /** Per-source quality-decile census — the dataset-card quality profile:
    * GLOBAL decile cutoffs of the q41 quality score, found exactly with
    * bounded state by [[Sketches.bisectQuantiles]] (k-th order statistics
    * on the 1e-6 grid the score already lives on), then one census pass
    * assigning each document the count of cutoffs strictly below its
    * score (0..9). The cutoffs are nine driver-collected literals (the
    * q128 bracket kind of bounded state), so the census pass is a single
    * broadcast-free partial agg; shares are per-source floor-quantized
    * rationals. A source whose mass pools in low deciles is the one to
    * re-crawl or down-sample. */
  def qualityDecileCensus(docs: DataFrame): DataFrame = {
    import graft.core.Lineage.CutOps
    // cut BEFORE bisecting: bisectQuantiles runs pass-0 plus one histogram
    // action per round over the scores, and the census pass reads them
    // again — without the cut the expensive score projection (tokenize +
    // per-doc distinct counts) recomputes corpus-wide ~4-5x (the
    // materialize-before-iterate discipline, ADVICE r8).
    // This single-shot cut CANNOT be released here (the returned census
    // plan still reads its blocks — unpersisting a localCheckpoint is
    // unrecoverable); the blocks die when the consumer's action completes
    // and the ContextCleaner GCs the frame. The bench's per-query
    // live_rdds/storage_mb SERIES (r10) is the monitor that keeps this
    // class of cut honest in a long shared session (ADVICE r9 low).
    val scored = docs.select(col("source"),
      TextOps.qualityScore(col("text")).as("score"))
      .cutLineage()
    val cuts = Sketches.bisectQuantiles(
        scored.select(lit("all").as("g"), col("score")),
        "score", "g", (1 to 9).map(_ / 10.0), scale = 1000000)
      .collect().sortBy(_.getDouble(1)).map(_.getDouble(2))
    val decile = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(col("score") > lit(c), 1).otherwise(0)
    }
    val census = scored
      .select(col("source"), decile.cast("long").as("decile"))
      .groupBy(col("source"), col("decile")).agg(count(lit(1)).as("n_docs"))
    val totals = census.groupBy(col("source")).agg(sum(col("n_docs")).as("n_src"))
    census.join(broadcast(totals), Seq("source"))
      .select(col("source"), col("decile"), col("n_docs"),
        (floor(col("n_docs").cast("double") / col("n_src").cast("double")
          * 1e6 + lit(0.5)) / 1e6).as("share"))
      .orderBy(col("source"), col("decile"))
  }

  /** Per-source character-class composition — the encoding/noise screen
    * run before tokenization is trusted: digit, whitespace, and
    * other-symbol shares of each source's character mass, measured by
    * regex-strip length differences (both engines replace ALL matches —
    * Spark by default, DuckDB via the 'g' flag the oracle passes). One
    * scan, per-source partial agg of exact integer char counts; shares
    * are floor-quantized rationals. A source with a digit share triple
    * the corpus norm is usually tables/logs, not prose. */
  def charsetCensus(docs: DataFrame): DataFrame = {
    val total = length(col("text")).cast("long")
    val digits = (length(col("text")) -
      length(regexp_replace(col("text"), "[0-9]", ""))).cast("long")
    val spaces = (length(col("text")) -
      length(regexp_replace(col("text"), " ", ""))).cast("long")
    val alnum = (length(col("text")) -
      length(regexp_replace(col("text"), "[A-Za-z0-9 ]", ""))).cast("long")
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(total).as("n_chars"),
        sum(digits).as("n_digits"),
        sum(spaces).as("n_spaces"),
        sum(alnum).as("n_alnum_sp"))
      .select(col("source"), col("n_docs"), col("n_chars"),
        (floor(col("n_digits").cast("double") / col("n_chars").cast("double")
          * 1e6 + lit(0.5)) / 1e6).as("digit_share"),
        (floor(col("n_spaces").cast("double") / col("n_chars").cast("double")
          * 1e6 + lit(0.5)) / 1e6).as("space_share"),
        (floor((col("n_chars") - col("n_alnum_sp")).cast("double") /
          col("n_chars").cast("double") * 1e6 + lit(0.5)) / 1e6).as("symbol_share"))
      .orderBy(col("source"))
  }

  /** Pairwise length-distribution divergence — exact two-sample
    * Kolmogorov–Smirnov over per-source document token counts, the
    * "did this source's documents get truncated" audit. KS is computed
    * WITHOUT materializing per-pair CDFs at all grid points: for each
    * source pair, the merged (len, c1, c2) census is walked by ONE
    * window ordered by len, and max |F1 − F2| is the integer argmax of
    * |cum1·n2 − cum2·n1| (exact longs — the single division happens once
    * per pair at the end). Every frame is census-sized: distinct lengths
    * × source pairs; sources are bounded (the q154 pair discipline). */
  def lengthKs(docs: DataFrame, groupCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lens = docs.select(col(groupCol).as("source"),
      graft.functions.TextOps.tokenCount(col("text")).cast("long").as("len"))
      .groupBy(col("source"), col("len")).agg(count(lit(1)).as("c"))
    val totals = lens.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val a = lens.select(col("source").as("sa"), col("len"), col("c"))
    val b = lens.select(col("source").as("sb"), col("len"), col("c"))
    // merged census per pair: every length observed by EITHER source
    val pairs = a.select(col("sa")).distinct()
      .join(b.select(col("sb")).distinct(), col("sa") < col("sb"))
    val merged = pairs
      .join(lens.select(col("source"), col("len")).distinct()
        .select(col("source").as("ls"), col("len")),
        col("ls") === col("sa") || col("ls") === col("sb"))
      .select(col("sa"), col("sb"), col("len")).distinct()
      .join(a.withColumnRenamed("c", "c1"), Seq("sa", "len"), "left")
      .join(b.withColumnRenamed("c", "c2"), Seq("sb", "len"), "left")
      .na.fill(0L, Seq("c1", "c2"))
    val w = Window.partitionBy(col("sa"), col("sb")).orderBy(col("len"))
      .rowsBetween(Window.unboundedPreceding, 0)
    merged
      .withColumn("cum1", sum(col("c1")).over(w))
      .withColumn("cum2", sum(col("c2")).over(w))
      .join(broadcast(totals.select(col("source").as("sa"), col("n").as("n1"))),
        Seq("sa"))
      .join(broadcast(totals.select(col("source").as("sb"), col("n").as("n2"))),
        Seq("sb"))
      .groupBy(col("sa"), col("sb"), col("n1"), col("n2"))
      .agg(max(abs(col("cum1") * col("n2") - col("cum2") * col("n1"))).as("num"))
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        col("n1"), col("n2"),
        (floor(col("num").cast("double") /
          (col("n1") * col("n2")).cast("double") * 1e6 + lit(0.5)) / 1e6).as("ks"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Term burstiness — Church's cf/df ratio: terms whose occurrences
    * POOL inside few documents (boilerplate, code blocks, navigation
    * chrome) versus terms spread evenly. One (doc, term) census (the
    * only corpus-sized stage), a term census derived from it, a df
    * floor to kill one-doc noise, TakeOrdered top-k on the quantized
    * exact cf/df rational (ties → term order). */
  def termBurstiness(docs: DataFrame, minDf: Long = 3,
      topK: Int = 50): DataFrame = {
    val dt = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("c"))
    dt.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("c")).as("cf"))
      .filter(col("df") >= minDf)
      .select(col("term"), col("df"), col("cf"),
        (floor(col("cf").cast("double") / col("df").cast("double")
          * 1e6 + lit(0.5)) / 1e6).as("burstiness"))
      .orderBy(col("burstiness").desc, col("term"))
      .limit(topK)
  }

  /** Cross-source vocabulary overlap — the dialect-similarity matrix:
    * each source's top-K token types (by in-source frequency, ties →
    * token order, WindowGroupLimit-pruned rank over the (source, token)
    * census), pairwise-intersected. High overlap between a "new" crawl
    * and an existing source flags redundant acquisition; low overlap
    * against every peer flags an outlier dialect (code, another
    * language). Frames after the census are ≤ sources·K rows; the pair
    * join is head-to-head on the token key (the q154 pair
    * discipline). */
  def vocabOverlap(docs: DataFrame, topK: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(col("freq").desc, col("tok"))
    val heads = docs
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("freq"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("source"), col("tok"))
    val sizes = heads.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = heads.select(col("source").as("source_a"), col("tok"))
      .join(heads.select(col("source").as("source_b"), col("tok")), Seq("tok"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    // drive from the PAIR PRODUCT (sources are the bounded axis): a
    // fully-disjoint dialect pair must report jaccard 0, not vanish
    // from the matrix (the q168 inner-join lesson)
    sizes.select(col("source").as("source_a"), col("n").as("n_a"))
      .join(sizes.select(col("source").as("source_b"), col("n").as("n_b")),
        col("source_a") < col("source_b"))
      .join(inter, Seq("source_a", "source_b"), "left")
      .na.fill(0L, Seq("n_shared"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        (floor(col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")).cast("double")
          * 1e6 + lit(0.5)) / 1e6).as("jaccard"))
      .orderBy(col("source_a"), col("source_b"))
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- q155: out-of-vocabulary rate per source ---------------------------
    // Top-500 vocab head, broadcast membership join, per-source census;
    // the oracle replays the census cut and the quantized rate.
    QueryDef(
      "q155_oov_rate",
      (s, d) => oovRate(Tables.documents(s, d)),
      Some("""WITH f AS (
             |  SELECT source, unnest(string_split(text, ' ')) AS tok
             |  FROM documents),
             |c AS (SELECT tok, count(*) AS freq FROM f GROUP BY 1),
             |v AS (SELECT tok FROM c ORDER BY freq DESC, tok LIMIT 500),
             |j AS (
             |  SELECT f.source,
             |    CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
             |  FROM f LEFT JOIN v ON v.tok = f.tok)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
             |  CAST(sum(oov) AS BIGINT) AS n_oov,
             |  floor(CAST(sum(oov) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             |        * 1e6 + 0.5) / 1e6 AS oov_rate
             |FROM j GROUP BY source ORDER BY source""".stripMargin)),

    // ---- q153: Zipf power-law fit over the token spectrum ------------------
    // Top-100 census regression in log-log space; the oracle replays the
    // census, the rank, and the exact moment dag.
    QueryDef(
      "q153_zipf_fit",
      (s, d) => zipfFit(Tables.documents(s, d)),
      Some("""WITH f AS (
             |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
             |c AS (SELECT tok, count(*) AS freq FROM f GROUP BY 1),
             |t AS (SELECT tok, freq FROM c ORDER BY freq DESC, tok LIMIT 100),
             |p AS (
             |  SELECT ln(CAST(row_number() OVER (ORDER BY freq DESC, tok) AS DOUBLE)) AS x,
             |    ln(CAST(freq AS DOUBLE)) AS y
             |  FROM t),
             |s AS (
             |  SELECT CAST(count(*) AS DOUBLE) AS m,
             |    sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
             |    sum(y * y) AS syy, sum(x * y) AS sxy
             |  FROM p)
             |SELECT CAST(m AS BIGINT) AS n_points,
             |  round((m * sxy - sx * sy) / (m * sxx - sx * sx), 6) AS slope,
             |  round((sy - (m * sxy - sx * sy) / (m * sxx - sx * sx) * sx) / m, 6)
             |    AS intercept,
             |  round((m * sxy - sx * sy) * (m * sxy - sx * sy)
             |        / ((m * sxx - sx * sx) * (m * syy - sy * sy)), 6) AS r2
             |FROM s""".stripMargin)),

    // ---- q144: distinctive terms per source --------------------------------
    // Ratio-form lift with a global count-20 floor, top-10 per source;
    // the oracle replays the (source, token) census, derives the global
    // census from it, and mirrors the quantized lift and the rank.
    QueryDef(
      "q144_distinctive_terms",
      (s, d) => distinctiveTerms(Tables.documents(s, d)),
      Some("""WITH cst AS (
             |  SELECT source, unnest(string_split(text, ' ')) AS tok
             |  FROM documents),
             |c AS (SELECT source, tok, count(*) AS c_st FROM cst GROUP BY 1, 2),
             |ct AS (SELECT tok, CAST(sum(c_st) AS BIGINT) AS c_t FROM c GROUP BY 1),
             |ns AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s FROM c GROUP BY 1),
             |tot AS (SELECT CAST(sum(c_st) AS BIGINT) AS n_tot FROM c),
             |l AS (
             |  SELECT c.source, c.tok, c.c_st,
             |    floor((CAST(c.c_st AS DOUBLE) * CAST(tot.n_tot AS DOUBLE))
             |          / (CAST(ct.c_t AS DOUBLE) * CAST(ns.n_s AS DOUBLE))
             |          * 1e6 + 0.5) / 1e6 AS lift
             |  FROM c
             |  JOIN ct ON ct.tok = c.tok AND ct.c_t >= 20
             |  JOIN ns ON ns.source = c.source
             |  CROSS JOIN tot),
             |r AS (
             |  SELECT source, tok, c_st, lift,
             |    row_number() OVER (PARTITION BY source
             |                       ORDER BY lift DESC, tok) AS rank
             |  FROM l)
             |SELECT source, CAST(rank AS BIGINT) AS rank, tok,
             |  CAST(c_st AS BIGINT) AS c_st, lift
             |FROM r WHERE rank <= 10 ORDER BY source, rank""".stripMargin)),

    // ---- q176: per-document keyword extraction -----------------------------
    // tf/df ranking (order-equivalent to tf-idf per doc, transcendental-
    // free), WindowGroupLimit top-3; the oracle replays both censuses and
    // the quantized rank.
    QueryDef(
      "q176_doc_keywords",
      (s, d) => docKeywords(Tables.documents(s, d)),
      Some("""WITH tf AS MATERIALIZED (
             |  SELECT doc_id, tok, count(*) AS tf FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |    FROM documents)
             |  GROUP BY 1, 2),
             |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
             |sc AS (
             |  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
             |    floor(CAST(tf.tf AS DOUBLE) / CAST(df.df AS DOUBLE) * 1e6 + 0.5)
             |      / 1e6 AS score
             |  FROM tf JOIN df ON df.tok = tf.tok AND df.df >= 2),
             |r AS (
             |  SELECT doc_id, tok, tf, df, score,
             |    row_number() OVER (PARTITION BY doc_id
             |                       ORDER BY score DESC, tok) AS rank
             |  FROM sc)
             |SELECT doc_id, CAST(rank AS BIGINT) AS rank, tok,
             |  CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score
             |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin)),

    // ---- q129: collocations (PMI lift, ratio form) -------------------------
    // Top-30 adjacent pairs by lift with a count-5 floor; the oracle
    // replays both censuses, the totals, and the exact double chain.
    QueryDef(
      "q129_collocations",
      (s, d) => collocations(Tables.documents(s, d), minCount = 5, topK = 30),
      Some("""WITH t AS (SELECT string_split(text, ' ') AS t FROM documents),
             |tot AS (
             |  SELECT sum(len(t)) AS m_tot,
             |    sum(greatest(len(t) - 1, 0)) AS n_big
             |  FROM t),
             |bg AS (
             |  SELECT unnest([t[i] || ' ' || t[i+1] for i in range(1, greatest(len(t), 1))]) AS g
             |  FROM t WHERE len(t) >= 2),
             |cb AS (SELECT g, count(*) AS c_ab FROM bg GROUP BY 1 HAVING count(*) >= 5),
             |uni AS (
             |  SELECT unnest(t) AS tok FROM t),
             |cu AS (SELECT tok, count(*) AS c FROM uni GROUP BY 1),
             |j AS (
             |  SELECT string_split(cb.g, ' ')[1] AS a, string_split(cb.g, ' ')[2] AS b,
             |    cb.c_ab, ca.c AS c_a, cbb.c AS c_b
             |  FROM cb
             |  JOIN cu ca ON ca.tok = string_split(cb.g, ' ')[1]
             |  JOIN cu cbb ON cbb.tok = string_split(cb.g, ' ')[2])
             |SELECT a, b, CAST(c_ab AS BIGINT) AS c_ab,
             |  floor((CAST(c_ab AS DOUBLE) * CAST(m_tot AS DOUBLE) * CAST(m_tot AS DOUBLE))
             |        / (CAST(n_big AS DOUBLE) * CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE))
             |        * 1e6 + 0.5) / 1e6 AS lift
             |FROM j, tot
             |ORDER BY lift DESC, a, b LIMIT 30""".stripMargin)),

    // ---- q40: token statistics -------------------------------------------
    QueryDef(
      "q40_text_stats",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id",
            TextOps.tokenCount($"text").as("n_tokens"),
            length($"text").as("n_chars_computed"),
            size(array_distinct(TextOps.tokens($"text"))).as("n_distinct"),
            // floor-quantized, not round(): the ratio is pure rational, so
            // decimal ties are possible and engine round semantics differ
            (floor(size(array_distinct(TextOps.tokens($"text"))).cast("double") /
              TextOps.tokenCount($"text") * 1e6 + 0.5) / 1e6).as("distinct_ratio"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  len(string_split(text, ' ')) AS n_tokens,
             |  length(text) AS n_chars_computed,
             |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
             |  floor(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             |        / len(string_split(text, ' ')) * 1e6 + 0.5) / 1e6 AS distinct_ratio
             |FROM documents ORDER BY doc_id""".stripMargin),
      headline = true),

    // ---- q41: quality scoring --------------------------------------------
    QueryDef(
      "q41_text_quality",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id", TextOps.qualityScore($"text").as("quality"))
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, text,
             |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
             |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS nd
             |  FROM documents)
             |SELECT doc_id,
             |  floor((0.4 * least(n / 100.0, 1.0)
             |      + 0.4 * (nd / n)
             |      + 0.2 * least(((length(text) - (n - 1)) / n) / 8.0, 1.0)) * 1e6 + 0.5) / 1e6 AS quality
             |FROM t ORDER BY doc_id""".stripMargin)),

    // ---- q42: language identification (stopword-evidence argmax) ----------
    QueryDef(
      "q42_text_langid",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"lang", TextOps.langId($"text").as("pred"))
          .groupBy($"lang", $"pred")
          .agg(count(lit(1)).as("n"))
          .orderBy($"lang", $"pred")
      },
      Some {
        val counts = TextOps.langMarkers.map { case (lang, words) =>
          val set = words.map(w => s"'$w'").mkString(", ")
          s"len(list_filter(string_split(text, ' '), t -> t IN ($set))) AS c_$lang"
        }.mkString(",\n    ")
        val langs = TextOps.langMarkers.map(_._1)
        val best = s"greatest(${langs.map("c_" + _).mkString(", ")})"
        val caseChain = langs.map(l => s"WHEN c_$l = best AND best > 0 THEN '$l'").mkString(" ")
        s"""WITH s AS (
           |  SELECT lang,
           |    $counts
           |  FROM documents),
           |p AS (SELECT lang, $best AS best, * FROM s)
           |SELECT lang, CASE $caseChain ELSE 'und' END AS pred, count(*) AS n
           |FROM p GROUP BY 1, 2 ORDER BY lang, pred""".stripMargin
      }),

    // ---- q43: canonical fingerprint ----------------------------------------
    QueryDef(
      "q43_text_fingerprint",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id", TextOps.fingerprint($"text").as("fp"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- q90: bigram-LM quality scoring (pruned model + stupid backoff) ----
    // topK = 500 sits inside the gate corpus's distinct-bigram count, so
    // BOTH paths (pruned-table hit and unigram backoff) are exercised and
    // oracle-checked. Every ln() input is a ratio of integer counts —
    // identical doubles on both engines; see lmScore's scaladoc.
    QueryDef(
      "q90_lm_score",
      (s, d) => lmScore(Tables.documents(s, d), topK = 500)
        .orderBy(col("doc_id")),
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |w AS (SELECT unnest(t) AS w FROM t),
             |uni AS (SELECT w, count(*) AS cu FROM w GROUP BY w),
             |tot AS (SELECT CAST(sum(cu) AS DOUBLE) AS n_total FROM uni),
             |bgall AS (
             |  SELECT doc_id,
             |    unnest([t[i] || ' ' || t[i+1] for i in range(1, greatest(len(t), 1))]) AS g
             |  FROM t WHERE len(t) >= 2),
             |bg AS (
             |  SELECT g, count(*) AS cb FROM bgall GROUP BY g
             |  ORDER BY cb DESC, g LIMIT 500),
             |j AS (
             |  SELECT d.doc_id,
             |    CASE WHEN b.cb IS NOT NULL
             |         THEN ln(CAST(b.cb AS DOUBLE) / u1.cu)
             |         ELSE ln(0.4) + ln(CAST(u2.cu AS DOUBLE) / (SELECT n_total FROM tot))
             |    END AS lp
             |  FROM bgall d
             |  LEFT JOIN bg b ON b.g = d.g
             |  JOIN uni u1 ON u1.w = string_split(d.g, ' ')[1]
             |  JOIN uni u2 ON u2.w = string_split(d.g, ' ')[2])
             |SELECT doc_id, count(*) AS n_bigrams, round(avg(lp), 6) AS lm_score
             |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- q116: interpolated trigram LM (Jelinek–Mercer) --------------------
    // One order above q90, same pruned-and-broadcast model discipline; the
    // oracle re-trains all three tables and replays the interpolation.
    QueryDef(
      "q116_lm_trigram",
      (s, d) => lmScoreTrigram(Tables.documents(s, d), topK = 500)
        .orderBy(col("doc_id")),
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |w AS (SELECT unnest(t) AS w FROM t),
             |uni AS (SELECT w, count(*) AS cu FROM w GROUP BY w),
             |tot AS (SELECT CAST(sum(cu) AS DOUBLE) AS n_total FROM uni),
             |bgall AS (
             |  SELECT doc_id,
             |    unnest([t[i] || ' ' || t[i+1] for i in range(1, greatest(len(t), 1))]) AS g
             |  FROM t WHERE len(t) >= 2),
             |big AS (SELECT g, count(*) AS c2 FROM bgall GROUP BY g),
             |trall AS (
             |  SELECT doc_id,
             |    unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
             |            for i in range(1, greatest(len(t) - 1, 1))]) AS g
             |  FROM t WHERE len(t) >= 3),
             |tri AS (SELECT g, count(*) AS c3 FROM trall GROUP BY g),
             |m3 AS (
             |  SELECT k.g AS g3, CAST(k.c3 AS DOUBLE) / b.c2 AS p3
             |  FROM (SELECT g, c3 FROM tri ORDER BY c3 DESC, g LIMIT 500) k
             |  JOIN big b
             |    ON b.g = string_split(k.g, ' ')[1] || ' ' || string_split(k.g, ' ')[2]),
             |m2 AS (
             |  SELECT k.g AS g2, CAST(k.c2 AS DOUBLE) / u.cu AS p2
             |  FROM (SELECT g, c2 FROM big ORDER BY c2 DESC, g LIMIT 500) k
             |  JOIN uni u ON u.w = string_split(k.g, ' ')[1]),
             |j AS (
             |  SELECT d.doc_id,
             |    ln(0.6 * coalesce(m3.p3, 0.0) + 0.3 * coalesce(m2.p2, 0.0)
             |       + 0.1 * (CAST(u3.cu AS DOUBLE) / (SELECT n_total FROM tot))) AS lp
             |  FROM trall d
             |  LEFT JOIN m3 ON m3.g3 = d.g
             |  LEFT JOIN m2
             |    ON m2.g2 = string_split(d.g, ' ')[2] || ' ' || string_split(d.g, ' ')[3]
             |  JOIN uni u3 ON u3.w = string_split(d.g, ' ')[3])
             |SELECT doc_id, count(*) AS n_trigrams, round(avg(lp), 6) AS lm3_score
             |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- q109: hashed-bigram linear classifier (model-based filter) --------
    // The weight table is a seeded literal rendered into BOTH plans (the
    // LSH-planes scheme), and the bucket hash is md5-hex — so the oracle
    // replays tokenization, hashing, weight lookup, mean-pool, and the
    // keep decision exactly.
    QueryDef(
      "q109_linear_quality",
      (s, d) => linearQualityFilter(Tables.documents(s, d),
        LQ.weights, LQ.Bias, LQ.Tau).orderBy(col("doc_id")),
      Some(LQ.oracle)),

    // ---- q194: vocabulary coverage curve -----------------------------------
    // Cumulative corpus share of the top-r token types at power-of-two
    // ranks; the oracle replays the census, the (freq desc, tok) rank,
    // the running sum, and the rank-point filter.
    QueryDef(
      "q194_vocab_coverage",
      (s, d) => vocabCoverage(Tables.documents(s, d)),
      Some("""WITH c AS (
             |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
             |census AS (SELECT tok, count(*) AS freq FROM c GROUP BY 1),
             |tot AS (SELECT sum(freq) AS n_tot FROM census),
             |rk AS (
             |  SELECT freq,
             |    row_number() OVER (ORDER BY freq DESC, tok) AS rank,
             |    sum(freq) OVER (ORDER BY freq DESC, tok
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
             |  FROM census QUALIFY rank <= 65536)
             |SELECT CAST(rank AS BIGINT) AS rank, CAST(cum_n AS BIGINT) AS cum_n,
             |  floor(CAST(cum_n AS DOUBLE) / CAST((SELECT n_tot FROM tot) AS DOUBLE)
             |    * 1e6 + 0.5) / 1e6 AS cum_share
             |FROM rk WHERE (rank & (rank - 1)) = 0
             |ORDER BY rank""".stripMargin)),

    // ---- q195: per-source quality-decile census ----------------------------
    // Global exact decile cutoffs (k-th order statistics on the 1e-6
    // quality grid — the bisection contract) then a per-source decile
    // census; the oracle computes the same order statistics by ranking
    // and replays the strict-greater decile assignment.
    QueryDef(
      "q195_quality_deciles",
      (s, d) => qualityDecileCensus(Tables.documents(s, d)),
      Some("""WITH t AS (
             |  SELECT source,
             |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
             |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS nd,
             |    CAST(length(text) AS DOUBLE) AS nc
             |  FROM documents),
             |q AS (
             |  SELECT source,
             |    floor((0.4 * least(n / 100.0, 1.0)
             |        + 0.4 * (nd / n)
             |        + 0.2 * least(((nc - (n - 1)) / n) / 8.0, 1.0)) * 1e6 + 0.5) / 1e6
             |      AS score
             |  FROM t),
             |iv AS (
             |  SELECT source, score,
             |    CAST(floor(score * 1000000 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS g
             |  FROM q),
             |r AS (
             |  SELECT g, row_number() OVER (ORDER BY g) AS rk,
             |    count(*) OVER () AS cnt
             |  FROM iv),
             |cuts AS (
             |  SELECT qq.q, min(r.g) / CAST(1000000 AS DOUBLE) AS cut
             |  FROM r, (SELECT unnest([CAST(0.1 AS DOUBLE), CAST(0.2 AS DOUBLE),
             |    CAST(0.3 AS DOUBLE), CAST(0.4 AS DOUBLE), CAST(0.5 AS DOUBLE),
             |    CAST(0.6 AS DOUBLE), CAST(0.7 AS DOUBLE), CAST(0.8 AS DOUBLE),
             |    CAST(0.9 AS DOUBLE)]) AS q) qq
             |  WHERE r.rk = CAST(ceil(qq.q * r.cnt) AS BIGINT)
             |  GROUP BY 1),
             |dec AS (
             |  SELECT source,
             |    (SELECT count(*) FROM cuts WHERE iv.score > cuts.cut) AS decile
             |  FROM iv),
             |census AS (
             |  SELECT source, CAST(decile AS BIGINT) AS decile,
             |    CAST(count(*) AS BIGINT) AS n_docs
             |  FROM dec GROUP BY 1, 2),
             |st AS (SELECT source, sum(n_docs) AS n_src FROM census GROUP BY 1)
             |SELECT c.source, c.decile, c.n_docs,
             |  floor(CAST(c.n_docs AS DOUBLE) / CAST(st.n_src AS DOUBLE)
             |    * 1e6 + 0.5) / 1e6 AS share
             |FROM census c JOIN st ON st.source = c.source
             |ORDER BY c.source, c.decile""".stripMargin)),

    // ---- q199: per-source character-class composition ----------------------
    // Digit/space/symbol shares from regex-strip length differences; the
    // oracle strips the same classes with the 'g' flag and replays the
    // quantized shares.
    QueryDef(
      "q199_charset_census",
      (s, d) => charsetCensus(Tables.documents(s, d)),
      Some("""WITH t AS (
             |  SELECT source, CAST(length(text) AS BIGINT) AS tot,
             |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
             |      AS BIGINT) AS dig,
             |    CAST(length(text) - length(regexp_replace(text, ' ', '', 'g'))
             |      AS BIGINT) AS sp,
             |    CAST(length(text) - length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
             |      AS BIGINT) AS aln
             |  FROM documents),
             |agg AS (
             |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(tot) AS BIGINT) AS n_chars,
             |    CAST(sum(dig) AS BIGINT) AS n_digits,
             |    CAST(sum(sp) AS BIGINT) AS n_spaces,
             |    CAST(sum(aln) AS BIGINT) AS n_alnum_sp
             |  FROM t GROUP BY 1)
             |SELECT source, n_docs, n_chars,
             |  floor(CAST(n_digits AS DOUBLE) / CAST(n_chars AS DOUBLE) * 1e6 + 0.5)
             |    / 1e6 AS digit_share,
             |  floor(CAST(n_spaces AS DOUBLE) / CAST(n_chars AS DOUBLE) * 1e6 + 0.5)
             |    / 1e6 AS space_share,
             |  floor(CAST(n_chars - n_alnum_sp AS DOUBLE) / CAST(n_chars AS DOUBLE)
             |    * 1e6 + 0.5) / 1e6 AS symbol_share
             |FROM agg ORDER BY source""".stripMargin)),

    // ---- q200: pairwise length-distribution KS -----------------------------
    // Exact two-sample KS from one merged-census window per source pair,
    // integer argmax of |cum1*n2 - cum2*n1|; the oracle replays the
    // merged census, the running sums, and the same rational.
    QueryDef(
      "q200_length_ks",
      (s, d) => lengthKs(Tables.documents(s, d)),
      Some("""WITH lens AS (
             |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS len,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM documents GROUP BY 1, 2),
             |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM lens GROUP BY 1),
             |pairs AS (
             |  SELECT a.source AS sa, b.source AS sb
             |  FROM tot a JOIN tot b ON a.source < b.source),
             |pts AS (
             |  SELECT DISTINCT p.sa, p.sb, l.len
             |  FROM pairs p JOIN lens l ON l.source = p.sa OR l.source = p.sb),
             |merged AS (
             |  SELECT pts.sa, pts.sb, pts.len,
             |    coalesce(a.c, 0) AS c1, coalesce(b.c, 0) AS c2
             |  FROM pts
             |  LEFT JOIN lens a ON a.source = pts.sa AND a.len = pts.len
             |  LEFT JOIN lens b ON b.source = pts.sb AND b.len = pts.len),
             |cum AS (
             |  SELECT sa, sb, len,
             |    sum(c1) OVER (PARTITION BY sa, sb ORDER BY len
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
             |    sum(c2) OVER (PARTITION BY sa, sb ORDER BY len
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
             |  FROM merged),
             |mx AS (
             |  SELECT c.sa, c.sb, ta.n AS n1, tb.n AS n2,
             |    CAST(max(abs(c.cum1 * tb.n - c.cum2 * ta.n)) AS BIGINT) AS num
             |  FROM cum c JOIN tot ta ON ta.source = c.sa
             |             JOIN tot tb ON tb.source = c.sb
             |  GROUP BY 1, 2, 3, 4)
             |SELECT sa AS source_a, sb AS source_b, n1, n2,
             |  floor(CAST(num AS DOUBLE) / CAST(n1 * n2 AS DOUBLE) * 1e6 + 0.5) / 1e6
             |    AS ks
             |FROM mx ORDER BY source_a, source_b""".stripMargin)),

    // ---- q216: term burstiness (cf/df concentration) -----------------------
    // Top-50 terms by occurrences-per-containing-doc with a df floor;
    // the oracle replays both censuses, the floor, the quantized ratio,
    // and the (burstiness desc, term) head.
    QueryDef(
      "q216_term_burstiness",
      (s, d) => termBurstiness(Tables.documents(s, d)),
      Some("""WITH dt AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |  FROM documents),
             |dtc AS (
             |  SELECT doc_id, term, count(*) AS c FROM dt GROUP BY 1, 2),
             |tc AS (
             |  SELECT term, CAST(count(*) AS BIGINT) AS df,
             |    CAST(sum(c) AS BIGINT) AS cf
             |  FROM dtc GROUP BY 1 HAVING count(*) >= 3)
             |SELECT term, df, cf,
             |  floor(CAST(cf AS DOUBLE) / CAST(df AS DOUBLE) * 1e6 + 0.5) / 1e6
             |    AS burstiness
             |FROM tc
             |ORDER BY burstiness DESC, term
             |LIMIT 50""".stripMargin)),

    // ---- q222: length KS by language ---------------------------------------
    // The q200 machinery re-keyed on lang (the groupCol parameter): a
    // language whose length distribution diverges from its peers was
    // truncated or chunked differently in ingestion. Oracle = the q200
    // replay over lang.
    QueryDef(
      "q222_length_ks_by_lang",
      (s, d) => lengthKs(Tables.documents(s, d), groupCol = "lang")
        .select(col("source_a").as("lang_a"), col("source_b").as("lang_b"),
          col("n1"), col("n2"), col("ks")),
      Some("""WITH lens AS (
             |  SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS len,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM documents GROUP BY 1, 2),
             |tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM lens GROUP BY 1),
             |pairs AS (
             |  SELECT a.lang AS sa, b.lang AS sb
             |  FROM tot a JOIN tot b ON a.lang < b.lang),
             |pts AS (
             |  SELECT DISTINCT p.sa, p.sb, l.len
             |  FROM pairs p JOIN lens l ON l.lang = p.sa OR l.lang = p.sb),
             |merged AS (
             |  SELECT pts.sa, pts.sb, pts.len,
             |    coalesce(a.c, 0) AS c1, coalesce(b.c, 0) AS c2
             |  FROM pts
             |  LEFT JOIN lens a ON a.lang = pts.sa AND a.len = pts.len
             |  LEFT JOIN lens b ON b.lang = pts.sb AND b.len = pts.len),
             |cum AS (
             |  SELECT sa, sb, len,
             |    sum(c1) OVER (PARTITION BY sa, sb ORDER BY len
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
             |    sum(c2) OVER (PARTITION BY sa, sb ORDER BY len
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
             |  FROM merged),
             |mx AS (
             |  SELECT c.sa, c.sb, ta.n AS n1, tb.n AS n2,
             |    CAST(max(abs(c.cum1 * tb.n - c.cum2 * ta.n)) AS BIGINT) AS num
             |  FROM cum c JOIN tot ta ON ta.lang = c.sa
             |             JOIN tot tb ON tb.lang = c.sb
             |  GROUP BY 1, 2, 3, 4)
             |SELECT sa AS lang_a, sb AS lang_b, n1, n2,
             |  floor(CAST(num AS DOUBLE) / CAST(n1 * n2 AS DOUBLE) * 1e6 + 0.5) / 1e6
             |    AS ks
             |FROM mx ORDER BY lang_a, lang_b""".stripMargin)),

    // ---- q220: cross-source vocabulary overlap -----------------------------
    // Top-1000 per-source vocab heads pairwise-intersected, quantized
    // Jaccard over actual head sizes; the oracle replays the census,
    // the per-source rank, and the pair join.
    QueryDef(
      "q220_vocab_overlap",
      (s, d) => vocabOverlap(Tables.documents(s, d)),
      Some("""WITH c AS (
             |  SELECT source, unnest(string_split(text, ' ')) AS tok
             |  FROM documents),
             |census AS (
             |  SELECT source, tok, count(*) AS freq FROM c GROUP BY 1, 2),
             |heads AS (
             |  SELECT source, tok FROM (
             |    SELECT source, tok,
             |      row_number() OVER (PARTITION BY source
             |        ORDER BY freq DESC, tok) AS rk
             |    FROM census) WHERE rk <= 1000),
             |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n
             |       FROM heads GROUP BY 1),
             |inter AS (
             |  SELECT a.source AS source_a, b.source AS source_b,
             |    CAST(count(*) AS BIGINT) AS n_shared
             |  FROM heads a JOIN heads b
             |    ON a.tok = b.tok AND a.source < b.source
             |  GROUP BY 1, 2)
             |SELECT sa.source AS source_a, sb.source AS source_b,
             |  CAST(coalesce(i.n_shared, 0) AS BIGINT) AS n_shared,
             |  floor(CAST(coalesce(i.n_shared, 0) AS DOUBLE) /
             |    CAST(sa.n + sb.n - coalesce(i.n_shared, 0) AS DOUBLE)
             |    * 1e6 + 0.5) / 1e6 AS jaccard
             |FROM sz sa JOIN sz sb ON sa.source < sb.source
             |LEFT JOIN inter i
             |  ON i.source_a = sa.source AND i.source_b = sb.source
             |ORDER BY source_a, source_b""".stripMargin)),
  )

  /** Shared gate constants + DuckDB oracle for q109 (single source of
    * truth for buckets, weights, bias, threshold). Weights are k/256
    * rationals: exact in both binary (dyadic) and decimal (finite)
    * representation, so the SQL literal list round-trips bit-identically. */
  private[graft] object LQ {
    val Buckets = 64
    val Bias = -0.03125 // -8/256: same dyadic-rational family as weights
    val Tau = 0.0

    val weights: Array[Double] = {
      val r = new scala.util.Random(109L)
      Array.fill(Buckets)((r.nextInt(513) - 256) / 256.0)
    }

    val oracle: String = {
      val wList = weights.mkString("[", ", ", "]") + "::DOUBLE[]"
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |b AS (
         |  SELECT doc_id,
         |    CASE WHEN len(t) < 2 THEN []::VARCHAR[]
         |         ELSE [t[i] || ' ' || t[i+1] for i in range(1, len(t))]
         |    END AS bgs
         |  FROM t),
         |s AS (
         |  SELECT doc_id, len(bgs) AS n_bigrams,
         |    coalesce(list_sum(list_transform(bgs, g ->
         |      ($wList)[CAST(CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT)
         |                    % $Buckets AS INT) + 1])), 0.0) AS sw,
         |    greatest(len(bgs), 1) AS n
         |  FROM b),
         |l AS (
         |  SELECT doc_id, n_bigrams,
         |    floor(($Bias + sw / n) * 1e6 + 0.5) / 1e6 AS logit
         |  FROM s)
         |SELECT doc_id, CAST(n_bigrams AS INT) AS n_bigrams, logit,
         |  (logit > $Tau) AS keep
         |FROM l ORDER BY doc_id""".stripMargin
    }
  }
}
