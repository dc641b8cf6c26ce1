package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}
import graft.flow._
import graft.functions.PhysicsFunctions._
import graft.functions.CollectionOps._

/** Reference-parity operators driven through the correctness gate on the
  * harness tables: the histogram/cutflow machinery (flow package) runs on
  * `lineitem` with l_quantity as the event weight, and the collection/
  * physics expression algebra runs on the `embeddings` array column (the
  * per-event collection stand-in — same HOF machinery as the particle
  * collections, SURVEY.md §2.2/§2.4/§2.8).
  */
object EventOps {

  val defs: Seq[QueryDef] = Seq(

    // ---- q30: single-pass multi-histogram (Plot.make1D parity) ------------
    // Two weighted histograms attached to different selection-DAG nodes,
    // all filled in ONE scan (SURVEY.md §4 multi-action single pass).
    QueryDef(
      "q30_histogram_pass",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
        val root = Selection.root("all", $"l_quantity")
        val hi = root.refine("hi", $"l_discount" > 0.05)
        val plots = Seq(
          Plot("extprice_all", $"l_extendedprice", root, EquidistantBinning(40, 0.0, 120000.0)),
          Plot("qty_hi", $"l_quantity", hi, EquidistantBinning(25, 0.0, 50.0)))
        HistogramPass.run(li, plots)
          .select($"plot", $"bucket", $"n",
            round($"sumw", 2).as("sumw"), round($"sumw2", 2).as("sumw2"))
          .orderBy($"plot", $"bucket")
      },
      Some("""WITH h1 AS (
             |  SELECT 'extprice_all' AS plot,
             |    CASE WHEN l_extendedprice < 0.0 THEN -1
             |         WHEN l_extendedprice >= 120000.0 THEN 40
             |         ELSE CAST(floor((l_extendedprice - 0.0) * 40.0 / 120000.0) AS INT) END AS bucket,
             |    l_quantity AS w
             |  FROM lineitem),
             |h2 AS (
             |  SELECT 'qty_hi' AS plot,
             |    CASE WHEN l_quantity < 0.0 THEN -1
             |         WHEN l_quantity >= 50.0 THEN 25
             |         ELSE CAST(floor((l_quantity - 0.0) * 25.0 / 50.0) AS INT) END AS bucket,
             |    l_quantity AS w
             |  FROM lineitem WHERE l_discount > 0.05)
             |SELECT plot, bucket, count(*) AS n,
             |  round(sum(w), 2) AS sumw, round(sum(w * w), 2) AS sumw2
             |FROM (SELECT * FROM h1 UNION ALL SELECT * FROM h2)
             |GROUP BY plot, bucket
             |ORDER BY plot, bucket""".stripMargin),
      headline = true),

    // ---- q31: weighted cutflow, one wide agg (CutFlowReport parity) -------
    QueryDef(
      "q31_cutflow_wide",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
        val root = Selection.root("all", $"l_quantity")
        val s1 = root.refine("qty10", $"l_quantity" > 10)
        val s2 = s1.refine("disc", $"l_discount" > 0.02)
        val s3 = s2.refine("early", $"l_shipdate" < lit("1999-01-01").cast("timestamp"))
        val wide = CutFlowReport.wide(li, Seq(root, s1, s2, s3))
        wide.select(
          Seq("all", "qty10", "disc", "early").flatMap { n =>
            Seq(col(s"n_$n"),
              round(col(s"sumw_$n"), 2).as(s"sumw_$n"),
              round(col(s"sumw2_$n"), 2).as(s"sumw2_$n"))
          }: _*)
      },
      Some("""SELECT
             |  count(*) AS n_all,
             |  round(sum(l_quantity), 2) AS sumw_all,
             |  round(sum(l_quantity * l_quantity), 2) AS sumw2_all,
             |  count(CASE WHEN l_quantity > 10 THEN 1 END) AS n_qty10,
             |  round(sum(CASE WHEN l_quantity > 10 THEN l_quantity ELSE 0 END), 2) AS sumw_qty10,
             |  round(sum(CASE WHEN l_quantity > 10 THEN l_quantity * l_quantity ELSE 0 END), 2) AS sumw2_qty10,
             |  count(CASE WHEN l_quantity > 10 AND l_discount > 0.02 THEN 1 END) AS n_disc,
             |  round(sum(CASE WHEN l_quantity > 10 AND l_discount > 0.02 THEN l_quantity ELSE 0 END), 2) AS sumw_disc,
             |  round(sum(CASE WHEN l_quantity > 10 AND l_discount > 0.02 THEN l_quantity * l_quantity ELSE 0 END), 2) AS sumw2_disc,
             |  count(CASE WHEN l_quantity > 10 AND l_discount > 0.02 AND l_shipdate < TIMESTAMP '1999-01-01' THEN 1 END) AS n_early,
             |  round(sum(CASE WHEN l_quantity > 10 AND l_discount > 0.02 AND l_shipdate < TIMESTAMP '1999-01-01' THEN l_quantity ELSE 0 END), 2) AS sumw_early,
             |  round(sum(CASE WHEN l_quantity > 10 AND l_discount > 0.02 AND l_shipdate < TIMESTAMP '1999-01-01' THEN l_quantity * l_quantity ELSE 0 END), 2) AS sumw2_early
             |FROM lineitem""".stripMargin)),

    // ---- q32: deltaR expression parity ------------------------------------
    // Δφ-wrapped ΔR between two pseudo-directions built from embedding
    // components — pure built-in math on both engines, rounded to absorb
    // libm ulp differences.
    QueryDef(
      "q32_deltar_expr",
      (s, d) => {
        import s.implicits._
        val e = Tables.embeddings(s, d)
        val eta1 = element_at($"embedding", 1).cast("double") * 4.0
        val phi1 = element_at($"embedding", 2).cast("double") * 15.0
        val eta2 = element_at($"embedding", 3).cast("double") * 4.0
        val phi2 = element_at($"embedding", 4).cast("double") * 15.0
        e.select($"vec_id",
            round(deltaPhi(phi1, phi2), 6).as("dphi"),
            round(deltaR(eta1, phi1, eta2, phi2), 6).as("dr"))
          .orderBy($"vec_id")
      },
      Some("""SELECT vec_id,
             |  round(atan2(sin(CAST(embedding[2] AS DOUBLE) * 15.0 - CAST(embedding[4] AS DOUBLE) * 15.0),
             |              cos(CAST(embedding[2] AS DOUBLE) * 15.0 - CAST(embedding[4] AS DOUBLE) * 15.0)), 6) AS dphi,
             |  round(sqrt(pow(CAST(embedding[1] AS DOUBLE) * 4.0 - CAST(embedding[3] AS DOUBLE) * 4.0, 2)
             |           + pow(atan2(sin(CAST(embedding[2] AS DOUBLE) * 15.0 - CAST(embedding[4] AS DOUBLE) * 15.0),
             |                       cos(CAST(embedding[2] AS DOUBLE) * 15.0 - CAST(embedding[4] AS DOUBLE) * 15.0)), 2)), 6) AS dr
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // ---- q33: invariant-mass expression parity ----------------------------
    QueryDef(
      "q33_invmass_expr",
      (s, d) => {
        import s.implicits._
        val e = Tables.embeddings(s, d)
        def comp(i: Int) = element_at($"embedding", i).cast("double")
        val (pt1, eta1, phi1) = (abs(comp(1)) * 100.0 + 20.0, comp(2) * 2.0, comp(3) * 10.0)
        val (pt2, eta2, phi2) = (abs(comp(4)) * 100.0 + 20.0, comp(5) * 2.0, comp(6) * 10.0)
        e.select($"vec_id",
            round(invariantMass(pt1, eta1, phi1, lit(0.0), pt2, eta2, phi2, lit(0.0)), 4).as("m"))
          .orderBy($"vec_id")
      },
      // DuckDB has no cosh/sinh — composed from exp; round(4) absorbs the
      // ~1-ulp libm difference vs Spark's java.lang.Math.cosh/sinh.
      Some("""WITH k AS (
             |  SELECT vec_id,
             |    abs(CAST(embedding[1] AS DOUBLE)) * 100.0 + 20.0 AS pt1,
             |    CAST(embedding[2] AS DOUBLE) * 2.0 AS eta1,
             |    CAST(embedding[3] AS DOUBLE) * 10.0 AS phi1,
             |    abs(CAST(embedding[4] AS DOUBLE)) * 100.0 + 20.0 AS pt2,
             |    CAST(embedding[5] AS DOUBLE) * 2.0 AS eta2,
             |    CAST(embedding[6] AS DOUBLE) * 10.0 AS phi2
             |  FROM embeddings)
             |SELECT vec_id, round(sqrt(greatest(
             |    pow(sqrt(pow(0.0, 2) + pow(pt1 * (exp(eta1) + exp(-eta1)) / 2, 2))
             |      + sqrt(pow(0.0, 2) + pow(pt2 * (exp(eta2) + exp(-eta2)) / 2, 2)), 2)
             |  - pow(pt1 * cos(phi1) + pt2 * cos(phi2), 2)
             |  - pow(pt1 * sin(phi1) + pt2 * sin(phi2), 2)
             |  - pow(pt1 * (exp(eta1) - exp(-eta1)) / 2 + pt2 * (exp(eta2) - exp(-eta2)) / 2, 2), 0.0)), 4) AS m
             |FROM k ORDER BY vec_id""".stripMargin)),

    // ---- q34: HOF filter / rng_len parity ---------------------------------
    QueryDef(
      "q34_hof_filter",
      (s, d) => {
        import s.implicits._
        Tables.embeddings(s, d)
          .select($"vec_id",
            size(filter($"embedding", x => x > 0.0f)).as("n_pos"),
            size(filter($"embedding", x => x > 0.1f)).as("n_big"),
            size($"embedding").as("dim"))
          .orderBy($"vec_id")
      },
      Some("""SELECT vec_id,
             |  len(list_filter(embedding, x -> x > 0.0)) AS n_pos,
             |  len(list_filter(embedding, x -> x > 0.1)) AS n_big,
             |  len(embedding) AS dim
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // ---- q35: HOF quantifiers (rng_any / forall parity) --------------------
    QueryDef(
      "q35_hof_quantifiers",
      (s, d) => {
        import s.implicits._
        Tables.embeddings(s, d)
          .select($"vec_id",
            exists($"embedding", x => x > 0.3f).as("any_big"),
            forall($"embedding", x => x > -0.5f).as("all_ok"))
          .orderBy($"vec_id")
      },
      Some("""SELECT vec_id,
             |  len(list_filter(embedding, x -> x > 0.3)) > 0 AS any_big,
             |  len(list_filter(embedding, x -> x <= -0.5)) = 0 AS all_ok
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // ---- q36: HOF reduce (aggregate over collection) -----------------------
    QueryDef(
      "q36_hof_reduce",
      (s, d) => {
        import s.implicits._
        Tables.embeddings(s, d)
          .select($"vec_id",
            round(aggregate($"embedding", lit(0.0),
              (acc, x) => acc + x.cast("double") * x.cast("double")), 4).as("norm2"))
          .orderBy($"vec_id")
      },
      Some("""SELECT vec_id,
             |  round(list_sum(list_transform(embedding,
             |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS norm2
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // ---- q37: element indexing (coll[i] parity) ----------------------------
    QueryDef(
      "q37_array_index",
      (s, d) => {
        import s.implicits._
        Tables.embeddings(s, d)
          .select($"vec_id",
            round(element_at($"embedding", 1).cast("double"), 6).as("lead"),
            round(element_at($"embedding", 2).cast("double"), 6).as("sublead"),
            round(element_at($"embedding", 4).cast("double"), 6).as("fourth"))
          .orderBy($"vec_id")
      },
      Some("""SELECT vec_id,
             |  round(CAST(embedding[1] AS DOUBLE), 6) AS lead,
             |  round(CAST(embedding[2] AS DOUBLE), 6) AS sublead,
             |  round(CAST(embedding[4] AS DOUBLE), 6) AS fourth
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // ---- q38: per-collection sort + top-k (implicit top-k parity) ----------
    QueryDef(
      "q38_array_topk",
      (s, d) => {
        import s.implicits._
        val top3 = slice(sort_array($"embedding", asc = false), 1, 3)
        Tables.embeddings(s, d)
          .select($"vec_id",
            round(aggregate(top3, lit(0.0), (acc, x) => acc + x.cast("double")), 5).as("top3_sum"))
          .orderBy($"vec_id")
      },
      Some("""SELECT vec_id,
             |  round(list_sum(list_transform(
             |    list_sort(embedding, 'DESC')[1:3], x -> CAST(x AS DOUBLE))), 5) AS top3_sum
             |FROM embeddings ORDER BY vec_id""".stripMargin)),
  )
}
