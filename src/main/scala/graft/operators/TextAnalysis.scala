package graft.operators

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

  val defs: Seq[QueryDef] = Seq(

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
  )
}
