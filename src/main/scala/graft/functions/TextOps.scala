package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline primitives over string columns — tokenization, shingling,
  * fingerprinting, language scoring, quality metrics. All row-local Column
  * compositions: no UDFs, no shuffle, linear scale-out.
  */
object TextOps {

  /** Whitespace tokenization (documents are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word n-grams WITH multiplicity (the repetition-audit unit). Documents
    * shorter than n tokens yield an empty array (guarded: Spark's
    * `sequence(1, 0)` would count DOWN, not produce empty).
    *
    * The token array is BOUND ONCE as a lambda variable (the single-element
    * `transform` wrapper): higher-order functions re-evaluate captured
    * subexpression trees per element, so referencing `split(text)` directly
    * inside the per-ngram lambda re-tokenizes the document for EVERY ngram —
    * O(tokens²) per row, measured as 90+ s single-task stalls on the q46
    * verification path. A lambda variable is evaluated once and referenced
    * O(1) per element, restoring the O(tokens) cost the codegen'd path has. */
  def ngrams(text: Column, n: Int): Column =
    flatten(transform(array(tokens(text)), t =>
      when(size(t) < n, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(1), size(t) - lit(n - 1)),
          i => concat_ws(" ", slice(t, i, lit(n)))))))

  /** Distinct word n-gram shingles — the dedup unit for MinHash/Jaccard. */
  def shingles(text: Column, n: Int): Column = array_distinct(ngrams(text, n))

  /** Compression-ratio repetition signal: DEFLATE size / byte length, in
    * (0, ~1.1]. Boilerplate and template text compress far below natural
    * prose — the long-range complement of the token-level ratios in
    * [[qualityScore]] (a page repeating a 50-token block has healthy
    * local stats and a collapsed compression ratio). Null-safe; empty
    * text → null (0/0). Spec-verified signal (not oracle-replayable:
    * the value depends on the JDK's zlib — see `DeflateSizeExpr`). */
  def compressionRatio(text: Column): Column =
    graft.expressions.DeflateSizeExpr.deflateSize(text).cast("double") /
      nullif(octet_length(text).cast("double"), lit(0.0))

  /** Canonical-form fingerprint: md5 of lowercased, whitespace-collapsed,
    * alphanumeric-only text — exact-dup detection robust to formatting. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")))

  /** Count of tokens present in a fixed stopword list. */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(stopwords)))

  /** Per-language stopword evidence for the n-gram/stopword language-ID
    * heuristic. Ordered map: first max wins on ties (deterministic). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "la", "et", "est", "les"),
    "es" -> Seq("el", "los", "y", "es", "las"),
    "zh" -> Seq("de", "shi", "le", "zai", "he"))

  /** Predicted language = argmax of per-language stopword counts, ties
    * resolved in `langMarkers` order, "und" (undetermined) when all zero. */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (lang, words) => lang -> stopwordCount(text, words) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, score), acc) =>
      when(score === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Heuristic quality score in [0,1]: blends length, lexical diversity,
    * and mean token length — the shape of production quality filters.
    *
    * Quantized via floor(x·10⁶ + 0.5)/10⁶ rather than round(): the score is
    * pure rational arithmetic, so it can land exactly on a decimal tie,
    * where Spark's round (BigDecimal of the shortest decimal repr) and
    * other engines' binary rounding disagree. The floor form is plain IEEE
    * ops — bit-identical on any engine. */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val distinctRatio = size(array_distinct(tokens(text))).cast("double") / n
    val meanTokLen = (length(text) - (n - 1)) / n
    val lenScore = least(n / lit(100.0), lit(1.0))
    val q = lit(0.4) * lenScore + lit(0.4) * distinctRatio +
      lit(0.2) * least(meanTokLen / lit(8.0), lit(1.0))
    floor(q * lit(1e6) + lit(0.5)) / lit(1e6)
  }

  /** Order-sensitive document fingerprint (vs the md5 canonical form, which
    * normalizes order-insensitively at the char level): a left fold chaining
    * each token through xxhash64(acc, token) — overflow-free under ANSI
    * arithmetic, deterministic across executors. */
  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => xxhash64(acc, t))
}
