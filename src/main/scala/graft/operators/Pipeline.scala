package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}
import graft.functions.TextOps

/** The end-to-end curation pipeline — the operators composed the way a
  * production training-data job chains them, verified as ONE plan against
  * one composed oracle:
  *
  *   quality filter → exact dedup (canonical fingerprint, min-id winner)
  *   → test-set decontamination → deterministic stratified sampling
  *   → context-window chunking → per-language yield report
  *
  * Composition is the point: every stage is the same operator the
  * individual gates verify (q70/q44/q77/q72/q84), and the fused plan keeps
  * their scale shapes — the corpus flows through map stages and ONE
  * dedup-key shuffle; the eval set broadcasts; chunking explodes an index
  * grid. Nothing materializes between stages.
  */
object Pipeline {

  /** The composed pipeline: returns (lang, n_docs, n_chunks) — the final
    * per-language training-data yield after all curation stages. */
  def curate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // 1. composite quality rules (q70 semantics) as a pure map filter —
    //    full rows survive with NO re-join to recover the payload
    val passing = docs.filter(Curation.qualityPredicate(col("text")))
    // 2. exact dedup on the canonical fingerprint, min doc_id wins (q44).
    //    Skew-safe despite the window: the rn === 1 filter lets Spark's
    //    InferWindowGroupLimit plant a map-side WindowGroupLimit below the
    //    exchange, so a mega-duplicate class ships ≤ 1 row per input
    //    partition — effectively a partial agg (PlanSpec pins the node).
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    val deduped = passing
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("fp", "rn")
    // 3. drop anything overlapping the eval split (q77 semantics; eval
    //    members flag themselves and leave the training set)
    val clean = Compliance.decontaminate(
      deduped, docs.filter(col("doc_id") % 97 === 0), n = 3, minOverlap = 2L)
    // 4. deterministic 50% sample per language (q72 machinery)
    val sampled = Curation.stratifiedSample(clean, "lang",
      Map("en" -> 500, "de" -> 500, "es" -> 500, "fr" -> 500, "zh" -> 500))
    // 5. context-window chunking (q84) carrying lang through the generator
    //    — no join back against the curated subtree (which would replay
    //    its whole lineage a second time just to recover one column)
    Curation.chunkDocuments(sampled, chunkTokens = 32, stride = 24,
        carryCols = Seq("lang"))
      .groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_chunks"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q86_curation_pipeline",
      (s, d) => curate(s, d).orderBy(col("lang")),
      Some("""WITH t AS (
             |  SELECT doc_id, text, lang,
             |    len(string_split(text, ' ')) AS n,
             |    len(list_distinct(string_split(text, ' '))) AS nd,
             |    length(text) - (len(string_split(text, ' ')) - 1) AS alpha,
             |    len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) AS stop
             |  FROM documents),
             |pass AS (
             |  SELECT doc_id, text, lang, n FROM t
             |  WHERE n BETWEEN 20 AND 80 AND nd * 10 >= n * 3
             |    AND alpha >= n * 2 AND alpha <= n * 8 AND stop >= 1),
             |dd AS (
             |  SELECT doc_id, text, lang, n FROM (
             |    SELECT *, row_number() OVER (
             |      PARTITION BY md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
             |      ORDER BY doc_id) AS rn
             |    FROM pass) WHERE rn = 1),
             |sh AS (
             |  SELECT doc_id,
             |    list_distinct([u[i] || ' ' || u[i+1] || ' ' || u[i+2]
             |                   for i in range(1, greatest(len(u) - 1, 1))]) AS sh
             |  FROM (SELECT doc_id, string_split(text, ' ') AS u FROM documents)
             |  WHERE len(u) >= 3),
             |test AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 97 = 0),
             |corpsh AS (
             |  SELECT s.doc_id, unnest(s.sh) AS g FROM sh s
             |  WHERE s.doc_id IN (SELECT doc_id FROM dd)),
             |flagged AS (
             |  SELECT c.doc_id FROM corpsh c JOIN test x ON c.g = x.g
             |  GROUP BY c.doc_id HAVING count(*) >= 2),
             |clean AS (
             |  SELECT * FROM dd WHERE doc_id NOT IN (SELECT doc_id FROM flagged)),
             |samp AS (
             |  SELECT * FROM clean
             |  WHERE ((((((doc_id % 2147483648) + 2147483648) % 2147483648)
             |          * 2654435761) % 4294967296) * 1000) // 4294967296 < 500),
             |chunks AS (
             |  SELECT doc_id, lang, unnest(range(0, (n + 23) // 24)) AS chunk_id
             |  FROM samp)
             |SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS n_chunks
             |FROM chunks GROUP BY lang ORDER BY lang""".stripMargin)),
  )
}
