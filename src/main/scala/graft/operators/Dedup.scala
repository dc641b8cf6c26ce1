package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}
import graft.functions.TextOps

/** Deduplication operators over `documents` — the four standard tiers of a
  * training-data pipeline:
  *
  *  1. exact (hash groupBy)                → q44
  *  2. n-gram Jaccard, all-pairs verify    → q45 (oracle-checked)
  *  3. MinHash + banded LSH                → q46 (candidate generation that
  *     replaces the O(n²) pair join with a bucket shuffle — the 100 TB path)
  *  4. SimHash (bitwise near-dup sketch)   → q47
  *
  * Scale notes: q45's all-pairs join is intentionally the *verification*
  * baseline; the LSH pipeline (q46) generates candidates via
  * `groupBy(band, signature)` — cost O(n·bands) shuffle rows, each bucket
  * bounded by the duplicate-cluster size, then exact Jaccard only on
  * candidates. SimHash reduces a document to one BIGINT, so near-dup
  * detection becomes a cheap equi/bit join. Hash functions are Spark's
  * xxhash64 — deterministic across executors and runs by construction.
  */
object Dedup {

  private val ShingleN = 3
  private val MinhashK = 32 // 8 bands × 4 rows
  private val Bands = 8
  private val RowsPerBand = 4

  /** doc_id + distinct 3-gram shingle set (drops docs too short to shingle). */
  def withShingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextOps.shingles(col("text"), ShingleN).as("sh"))
      .filter(size(col("sh")) > 0)

  /** Exact Jaccard over shingle sets as (intersection, union) integer sizes. */
  def jaccardCols(a: Column, b: Column): (Column, Column) =
    (size(array_intersect(a, b)), size(array_union(a, b)))

  /** LSH candidate pairs verified by exact Jaccard ≥ `threshold`.
    *
    * Physical design (the part that matters at 100 TB):
    *  1. shingle hashes explode to rows; the 32 minhash components are
    *     `min()` aggregates — map-side partial agg shrinks the shuffle to
    *     docs × 32 longs regardless of document length;
    *  2. band signatures are built from the *materialized* minhash
    *     attributes and only then exploded. (Building them inline ahead of
    *     the explode re-evaluates the whole minhash expression once per
    *     generated row — measured 14× slower at sf0.1.)
    *  3. candidates come from the band-bucket self-join (cost ∝ bucket
    *     sizes, bounded by duplicate-cluster size, not n²);
    *  4. exact-Jaccard verification joins the shingle sets back by doc_id —
    *     only for candidates.
    */
  def minhashLshPairs(docs: DataFrame, threshold: Double): DataFrame = {
    // The shingle table is consumed three times (minhash source + both
    // sides of the verification join). Measured: caching it buys <5% at
    // sf0.1 — the bucket-join + verify shuffles dominate, so no persist
    // (at cluster scale one would checkpoint the shingle table instead).
    val sh = withShingles(docs)
    val hashed = sh.select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    val minAggs = (0 until MinhashK).map(p => min(xxhash64(lit(p), col("h"))).as(s"m$p"))
    val sigs = hashed.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
    val bands = (0 until Bands).map { b =>
      val rows = (0 until RowsPerBand).map(r => col(s"m${b * RowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(rows: _*).as("sig"))
    }
    val buckets = sigs
      .select(col("doc_id"), explode(array(bands: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.sig").as("sig"))
    val cand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    val (inter, uni) = jaccardCols(col("a_sh"), col("b_sh"))
    cand
      .join(sh.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), "b_id")
      .withColumn("inter", inter)
      .withColumn("uni", uni)
      // integer-exact threshold: j ≥ t  ⇔  inter ≥ t·union
      .filter(col("inter").cast("double") >= lit(threshold) * col("uni").cast("double"))
      .select(col("a_id"), col("b_id"),
        round(col("inter").cast("double") / col("uni").cast("double"), 4).as("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** 63-bit SimHash over distinct tokens — one BIGINT per document, computed
    * row-locally with HOF folds (63 bits keeps the signature positive; the
    * lost bit costs ~1.6% of hamming resolution). Static per-bit masks keep
    * every shift a literal, so the whole expression codegens. */
  def simhash(text: Column): Column = {
    val hashes = transform(array_distinct(TextOps.tokens(text)), t => xxhash64(t))
    val bitCols = (0 until 63).map { b =>
      val vote = aggregate(hashes, lit(0),
        (acc, h) => acc + when(h.bitwiseAND(lit(1L << b)) =!= 0, 1).otherwise(-1))
      when(vote >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce((a, c) => a.bitwiseOR(c))
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- q44: exact deduplication ------------------------------------------
    QueryDef(
      "q44_dedup_exact",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        docs.agg(
          count(lit(1)).as("n_docs"),
          countDistinct($"text").as("n_distinct_text"),
          countDistinct(TextOps.fingerprint($"text")).as("n_distinct_fp"))
      },
      Some("""SELECT count(*) AS n_docs,
             |  count(DISTINCT text) AS n_distinct_text,
             |  count(DISTINCT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))) AS n_distinct_fp
             |FROM documents""".stripMargin)),

    // ---- q45: n-gram Jaccard near-dup pairs (all-pairs verification) -------
    // Integer-exact threshold test (5·inter ≥ 4·union ⇔ J ≥ 0.8): no float
    // comparison can disagree between engines.
    QueryDef(
      "q45_ngram_jaccard",
      (s, d) => {
        import s.implicits._
        // doc_id < 2000 bounds the O(n²) verification baseline (covers the
        // whole corpus at the sf0.01 gate; the at-scale path is q46's LSH).
        val sh = withShingles(Tables.documents(s, d).filter($"doc_id" < 2000))
        val (inter, uni) = jaccardCols($"a.sh", $"b.sh")
        sh.as("a").join(sh.as("b"), $"a.doc_id" < $"b.doc_id")
          .select($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"),
            inter.as("inter"), uni.as("uni"))
          .filter($"inter" * 5 >= $"uni" * 4)
          .orderBy($"a_id", $"b_id")
      },
      Some(s"""WITH s AS (
             |  SELECT doc_id, t,
             |    list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
             |                   for i in range(1, greatest(len(t) - 1, 1))]) AS sh
             |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
             |        WHERE doc_id < 2000)
             |  WHERE len(t) >= 3)
             |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  len(list_intersect(a.sh, b.sh)) AS inter,
             |  len(list_distinct(list_concat(a.sh, b.sh))) AS uni
             |FROM s a JOIN s b ON a.doc_id < b.doc_id
             |WHERE len(list_intersect(a.sh, b.sh)) * 5 >= len(list_distinct(list_concat(a.sh, b.sh))) * 4
             |ORDER BY a_id, b_id""".stripMargin)),

    // ---- q46: MinHash + banded LSH (the at-scale dedup path) ---------------
    // No SQL oracle: minhash values are engine-specific. Rows-only check
    // here; DedupSpec proves ≥95% recall vs the q45 brute force at J≥0.8.
    QueryDef(
      "q46_minhash_lsh",
      (s, d) => minhashLshPairs(Tables.documents(s, d), 0.8),
      None,
      headline = true),

    // ---- q47: SimHash near-dup sketch --------------------------------------
    // Rows-only (xxhash64-based); DedupSpec checks hamming-vs-jaccard
    // correlation on the planted near-dups.
    QueryDef(
      "q47_simhash",
      (s, d) => {
        import s.implicits._
        val sigs = Tables.documents(s, d).filter($"doc_id" < 2000)
          .select($"doc_id", simhash($"text").as("sig"))
        sigs.as("a").join(sigs.as("b"), $"a.doc_id" < $"b.doc_id")
          .select($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"),
            bit_count($"a.sig".bitwiseXOR($"b.sig")).as("hamming"))
          .filter($"hamming" <= 2)
          .orderBy($"a_id", $"b_id")
      },
      None),
  )
}
