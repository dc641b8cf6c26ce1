package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}
import graft.functions.TextOps

/** Compliance / data-safety operators — the scrub-and-audit stages every
  * production training-data pipeline runs between crawling and training:
  *
  *  - PII detection + redaction (emails, phone numbers, IPv4)   → q76
  *  - test-set decontamination (n-gram overlap vs eval sets)    → q77
  *  - repetition audit (Gopher-style dup-token / top-bigram)    → q79
  *
  * Scale shapes: q76 is a pure map stage (regex per row — zero shuffle,
  * scales with input splits). q77 is the canonical asymmetric join: the
  * test/eval side is tiny (benchmarks are MBs; the corpus is TBs), so its
  * distinct shingle set broadcasts and the corpus side never shuffles —
  * only matched (doc, gram) hits reach the counting aggregation. q79
  * shuffles once on (doc_id, gram) for the per-document bigram histogram;
  * partial aggregation collapses repeats map-side first.
  */
object Compliance {

  /** Java-regex and RE2-compatible patterns (no lookaround, no backrefs —
    * the intersection that behaves identically in Spark and DuckDB). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\b\\d{3}-\\d{4}\\b"

  /** Per-row PII audit + redaction: counts each PII class and rewrites the
    * text with class tags. Pure map stage — no shuffle, codegen'd regex.
    * Redaction order (email → IPv4 → phone) is load-bearing: the email
    * pattern consumes dotted hosts that the looser IPv4/phone digit
    * patterns could otherwise partially match. */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.withColumns(Map(
      "n_emails" -> regexp_count(t, lit(EmailPattern)),
      "n_ips"    -> regexp_count(t, lit(Ipv4Pattern)),
      "n_phones" -> regexp_count(t, lit(PhonePattern)),
      "redacted" -> regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailPattern, "<EMAIL>"),
          Ipv4Pattern, "<IP>"),
        PhonePattern, "<PHONE>")))
  }

  /** Distinct word-n-gram overlap of every corpus document against a
    * (small) test/eval set: the contamination score used to decide
    * benchmark leakage. Returns (doc_id, n_matched) for corpus docs with
    * ≥ `minOverlap` distinct shingles appearing anywhere in the test set.
    *
    * The test side reduces to ONE distinct shingle column and broadcasts;
    * the corpus side explodes its shingles map-locally and inner-joins the
    * broadcast — the corpus itself never shuffles, only (doc, matched-gram)
    * hits reach the count. At 100 TB corpus / MB-scale eval sets this is
    * the only shape that works. */
  def contaminationScores(corpus: DataFrame, testSet: DataFrame, n: Int,
      minOverlap: Long, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val testGrams = testSet
      .select(explode(TextOps.shingles(col(textCol), n)).as("g"))
      .distinct()
    corpus
      .select(col(idCol), explode(TextOps.shingles(col(textCol), n)).as("g"))
      .join(broadcast(testGrams), Seq("g"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_matched"))
      .filter(col("n_matched") >= minOverlap)
  }

  /** The decontaminated corpus: drop every document whose overlap with the
    * test set reaches `minOverlap` shingles (anti-join against the flagged
    * id set — the flagged set is contamination-bounded, not corpus-sized). */
  def decontaminate(corpus: DataFrame, testSet: DataFrame, n: Int,
      minOverlap: Long, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val flagged = contaminationScores(corpus, testSet, n, minOverlap, idCol, textCol)
      .select(col(idCol))
    corpus.join(flagged, Seq(idCol), "left_anti")
  }

  /** Gopher-style repetition audit: per document, token multiplicity
    * (n_tokens vs n_distinct — the duplicate-token signal) and the most
    * frequent bigram with its count (the repeated-phrase signal). All
    * counts integer-exact; the top bigram resolves ties lexicographically
    * so both engines pick the same row.
    *
    * The generator sits INLINE in the projecting select: exploding a
    * pre-projected array attribute makes Catalyst push the generator's
    * implicit non-empty guard into the scan as a filter that re-evaluates
    * the whole tokenize+bigram expression per row (measured 2.7× the scan
    * stage); inline, the expression evaluates once per input row. */
  def repetitionStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val counted = docs
      .select(
        col(idCol),
        TextOps.tokenCount(col(textCol)).as("n_tokens"),
        size(array_distinct(TextOps.tokens(col(textCol)))).as("n_distinct"),
        explode(TextOps.ngrams(col(textCol), 2)).as("g"))
      .groupBy(col(idCol), col("n_tokens"), col("n_distinct"), col("g"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(idCol).orderBy(desc("c"), asc("g"))
    counted
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col(idCol), col("n_tokens"), col("n_distinct"),
        col("g").as("top_bigram"), col("c").as("top_count"))
  }

  /** Deterministic PII planting for the gate: the synthetic corpus carries
    * no natural PII, so the query derives some from doc_id — arithmetic
    * both engines replay bit-identically — then must FIND it again. */
  private def planted: Column = concat(
    col("text"),
    when(col("doc_id") % 3 === 0,
      concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com")))
      .otherwise(lit("")),
    when(col("doc_id") % 5 === 0,
      concat(lit(" call 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .otherwise(lit("")),
    when(col("doc_id") % 7 === 0,
      concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
        lit(".0."), ((col("doc_id") * 7) % 256).cast("string")))
      .otherwise(lit("")))

  /** NOTE: embedded in an outer .stripMargin string — no continuation line
    * may start with '|', or the outer strip eats the concat operator. */
  private val PlantedSql =
    """text ||
      |    CASE WHEN doc_id % 3 = 0
      |      THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
      |      ELSE '' END ||
      |    CASE WHEN doc_id % 5 = 0
      |      THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |      ELSE '' END ||
      |    CASE WHEN doc_id % 7 = 0
      |      THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) ||
      |           '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)
      |      ELSE '' END""".stripMargin

  /** Word-trigram comprehension in DuckDB (mirrors TextOps.shingles(_, 3)). */
  private val TrigramSql =
    """list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |               for i in range(1, greatest(len(t) - 1, 1))])""".stripMargin

  /** k-anonymity audit — the re-identification screen run before a
    * dataset leaves the fence: group rows by their quasi-identifier
    * tuple and report, for each candidate k, how many equivalence
    * classes (and rows) sit below it. A row in a size-1 class is
    * uniquely re-identifiable from the QI columns alone. One QI-keyed
    * partial-agg census; every later frame is class-size-distribution
    * sized (the q205 telescoping discipline), and every k reports even
    * at zero (the q168 left-join rule). */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String],
      ks: Seq[Int] = Seq(2, 5, 10)): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val classes = df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("sz"))
    val dist = classes.groupBy(col("sz")).agg(count(lit(1)).as("n_classes"))
    val tot = dist.agg(sum(col("n_classes")).as("c_tot"),
      sum(col("sz") * col("n_classes")).as("r_tot"))
    val ksDf = ks.map(k => Tuple1(k.toLong)).toDF("k")
    ksDf.join(dist, col("sz") < col("k"), "left")
      .groupBy(col("k"))
      .agg(sum(col("n_classes")).as("cb"),
        sum(col("sz") * col("n_classes")).as("rb"))
      .crossJoin(broadcast(tot))
      .select(col("k"),
        coalesce(col("cb"), lit(0L)).as("classes_below"),
        coalesce(col("rb"), lit(0L)).as("rows_exposed"),
        col("c_tot").as("n_classes"), col("r_tot").as("n_rows"),
        (floor(coalesce(col("rb"), lit(0L)).cast("double") /
          col("r_tot").cast("double") * 1e6 + lit(0.5)) / 1e6).as("exposed_share"))
      .orderBy(col("k"))
  }

  /** l-diversity audit — k-anonymity's sibling for attribute disclosure:
    * a QI class can be large yet still leak when every member shares the
    * same SENSITIVE value. Per QI class, the distinct sensitive count;
    * per candidate l, the classes (and rows) whose diversity falls
    * short. Same census shapes as [[kAnonymityAudit]] with one extra
    * distinct inside the class census. */
  def lDiversityAudit(df: DataFrame, qiCols: Seq[String], senCol: String,
      ls: Seq[Int] = Seq(2, 3)): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val classes = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("sz"), countDistinct(col(senCol)).as("div"))
    val dist = classes.groupBy(col("div"))
      .agg(count(lit(1)).as("n_classes"), sum(col("sz")).as("n_rows"))
    val tot = dist.agg(sum(col("n_classes")).as("c_tot"),
      sum(col("n_rows")).as("r_tot"))
    val lsDf = ls.map(l => Tuple1(l.toLong)).toDF("l")
    lsDf.join(dist, col("div") < col("l"), "left")
      .groupBy(col("l"))
      .agg(sum(col("n_classes")).as("cb"), sum(col("n_rows")).as("rb"))
      .crossJoin(broadcast(tot))
      .select(col("l"),
        coalesce(col("cb"), lit(0L)).as("classes_below"),
        coalesce(col("rb"), lit(0L)).as("rows_at_risk"),
        col("c_tot").as("n_classes"),
        (floor(coalesce(col("rb"), lit(0L)).cast("double") /
          col("r_tot").cast("double") * 1e6 + lit(0.5)) / 1e6).as("at_risk_share"))
      .orderBy(col("l"))
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- q76: PII detection + redaction ------------------------------------
    QueryDef(
      "q76_pii_redact",
      (s, d) => redactPii(
          Tables.documents(s, d).select(col("doc_id"), planted.as("text")))
        .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
          col("redacted"))
        .orderBy(col("doc_id")),
      Some(s"""WITH p AS (
             |  SELECT doc_id, $PlantedSql AS text
             |  FROM documents)
             |SELECT doc_id,
             |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
             |  len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ips,
             |  len(regexp_extract_all(text, '\\b\\d{3}-\\d{4}\\b')) AS n_phones,
             |  regexp_replace(
             |    regexp_replace(
             |      regexp_replace(text,
             |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |      '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
             |    '\\b\\d{3}-\\d{4}\\b', '<PHONE>', 'g') AS redacted
             |FROM p ORDER BY doc_id""".stripMargin)),

    // ---- q77: test-set decontamination -------------------------------------
    // Eval set = doc_id ≡ 0 (mod 97); flag corpus docs sharing ≥ 2 distinct
    // word-trigrams with it. The oracle unnests the same distinct-trigram
    // lists, so both sides count identical (doc, gram) hits.
    QueryDef(
      "q77_decontaminate",
      (s, d) => {
        val docs = Tables.documents(s, d)
        contaminationScores(
          docs.filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0),
          n = 3, minOverlap = 2L)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH sh AS (
             |  SELECT doc_id, $TrigramSql AS sh
             |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
             |  WHERE len(t) >= 3),
             |test AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 97 = 0),
             |corp AS (SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id % 97 <> 0)
             |SELECT c.doc_id, count(*) AS n_matched
             |FROM corp c JOIN test t ON c.g = t.g
             |GROUP BY c.doc_id
             |HAVING count(*) >= 2
             |ORDER BY doc_id""".stripMargin)),

    // ---- q79: repetition audit (Gopher signals) ----------------------------
    QueryDef(
      "q79_repetition_audit",
      (s, d) => repetitionStats(Tables.documents(s, d))
        .orderBy(col("doc_id")),
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |bg AS (
             |  SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_distinct,
             |    unnest([t[i] || ' ' || t[i+1] for i in range(1, greatest(len(t), 1))]) AS g
             |  FROM t WHERE len(t) >= 2),
             |c AS (
             |  SELECT doc_id, n_tokens, n_distinct, g, count(*) AS c
             |  FROM bg GROUP BY 1, 2, 3, 4),
             |r AS (
             |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) AS rk
             |  FROM c)
             |SELECT doc_id, n_tokens, n_distinct, g AS top_bigram, c AS top_count
             |FROM r WHERE rk = 1 ORDER BY doc_id""".stripMargin)),

    // ---- q210: k-anonymity audit -------------------------------------------
    // Equivalence classes over (nation, mktsegment), exposure per k in
    // {5, 10, 20}; the oracle replays the class census, the size
    // distribution, and the per-k sums.
    QueryDef(
      "q210_k_anonymity",
      (s, d) => kAnonymityAudit(Tables.customer(s, d),
        Seq("c_nationkey", "c_mktsegment"), ks = Seq(5, 10, 20)),
      Some("""WITH cls AS (
             |  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS sz
             |  FROM customer GROUP BY 1, 2),
             |dist AS (SELECT sz, CAST(count(*) AS BIGINT) AS n_classes
             |         FROM cls GROUP BY 1),
             |tot AS (SELECT CAST(sum(n_classes) AS BIGINT) AS c_tot,
             |        CAST(sum(sz * n_classes) AS BIGINT) AS r_tot FROM dist),
             |ks AS (SELECT unnest([5, 10, 20]) AS k),
             |agg AS (
             |  SELECT ks.k,
             |    CAST(coalesce(sum(d.n_classes), 0) AS BIGINT) AS classes_below,
             |    CAST(coalesce(sum(d.sz * d.n_classes), 0) AS BIGINT) AS rows_exposed
             |  FROM ks LEFT JOIN dist d ON d.sz < ks.k
             |  GROUP BY 1)
             |SELECT CAST(k AS BIGINT) AS k, classes_below, rows_exposed,
             |  (SELECT c_tot FROM tot) AS n_classes,
             |  (SELECT r_tot FROM tot) AS n_rows,
             |  floor(CAST(rows_exposed AS DOUBLE) /
             |    CAST((SELECT r_tot FROM tot) AS DOUBLE) * 1e6 + 0.5) / 1e6
             |    AS exposed_share
             |FROM agg ORDER BY k""".stripMargin)),

    // ---- q211: l-diversity audit -------------------------------------------
    // Order-level QI (nation, 30-day period) against the order-priority
    // sensitive attribute; the oracle replays the class census with its
    // distinct count and the per-l sums.
    QueryDef(
      "q211_l_diversity",
      (s, d) => {
        val dayUs = 86400000000L
        val joined = Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderpriority"),
            expr(s"unix_micros(cast(o_orderdate as timestamp)) div ${dayUs * 30}")
              .as("period"))
          .join(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
        lDiversityAudit(joined, Seq("c_nationkey", "period"),
          "o_orderpriority", ls = Seq(3, 5))
      },
      Some("""WITH cls AS (
             |  SELECT c.c_nationkey,
             |    epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) // 2592000000000
             |      AS period,
             |    CAST(count(*) AS BIGINT) AS sz,
             |    CAST(count(DISTINCT o.o_orderpriority) AS BIGINT) AS dv
             |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
             |  GROUP BY 1, 2),
             |dist AS (SELECT dv, CAST(count(*) AS BIGINT) AS n_classes,
             |         CAST(sum(sz) AS BIGINT) AS n_rows FROM cls GROUP BY 1),
             |tot AS (SELECT CAST(sum(n_classes) AS BIGINT) AS c_tot,
             |        CAST(sum(n_rows) AS BIGINT) AS r_tot FROM dist),
             |ls AS (SELECT unnest([3, 5]) AS l),
             |agg AS (
             |  SELECT ls.l,
             |    CAST(coalesce(sum(d.n_classes), 0) AS BIGINT) AS classes_below,
             |    CAST(coalesce(sum(d.n_rows), 0) AS BIGINT) AS rows_at_risk
             |  FROM ls LEFT JOIN dist d ON d.dv < ls.l
             |  GROUP BY 1)
             |SELECT CAST(l AS BIGINT) AS l, classes_below, rows_at_risk,
             |  (SELECT c_tot FROM tot) AS n_classes,
             |  floor(CAST(rows_at_risk AS DOUBLE) /
             |    CAST((SELECT r_tot FROM tot) AS DOUBLE) * 1e6 + 0.5) / 1e6
             |    AS at_risk_share
             |FROM agg ORDER BY l""".stripMargin)),
  )
}
