package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}
import graft.core.Lineage.CutOps

/** Product quantization — the vector-compression half of large-scale ANN
  * (the FAISS IVF-PQ shape; the reference has no vector path, so this is a
  * north-star LLM-pipeline extension like [[Similarity.ivfTopK]]).
  *
  * A D-dim embedding is split into `m` contiguous D/m-dim subvectors; each
  * subspace gets its own k-centroid Lloyd codebook
  * ([[Similarity.kmeansFit]] per slice); a vector is then stored as `m`
  * small integer codes (k ≤ 256 → one byte each) instead of D floats — a
  * 64-dim float vector compresses 32× at m=2, k=4 gate parameters, and
  * real deployments (m=8, k=256) compress 4-byte-per-dim corpora 16-32×.
  * Query-time asymmetric distance computation (ADC) never reconstructs:
  * the query precomputes a (sub, code) → ‖q_sub − c‖² table (m·k doubles —
  * tiny, broadcast), and a database vector's approximate distance is the
  * sum of `m` table lookups on its codes.
  *
  * Scale shape at 100 TB:
  *   - training touches only a sample (codebooks are model parameters;
  *     the gate trains on the full gate corpus because it IS small);
  *   - encode is one explode(m) + broadcast-codebook join + min-struct
  *     partial-agg argmin — no corpus shuffle wider than (vec_id, sub);
  *   - search joins the code table (n·m skinny rows) against a BROADCAST
  *     per-query distance table and partial-aggregates the m-term sums
  *     map-side; the corpus' float vectors are never read at query time —
  *     that is the point of PQ.
  *
  * Cross-engine numerics: per-subspace distances fold zipped difference
  * squares left-to-right over identical doubles (bit-equal cross-engine,
  * the q93/q105 contract) and floor-quantize to 1e-6 BEFORE any argmin or
  * sum; ADC sums of the quantized terms re-quantize at 1e-6 (exact for
  * the gate's m=2 — IEEE addition is commutative — and absorbing
  * associativity noise ~1e-10 for larger m, same tradeoff as round() on
  * noise-dominated aggregates); every ranking ties-break on an id.
  */
object Pq {

  /** (sub, subvector) structs for one D-dim vector: sub s covers 1-based
    * slice [s·ds + 1, (s+1)·ds]. Cheap-inline generator input (m small
    * slices of an already-materialized array — the fast explode shape). */
  private def subVectors(v: Column, m: Int, ds: Int): Column =
    array((0 until m).map(s =>
      struct(lit(s).as("sub"), slice(v, s * ds + 1, ds).as("sv"))): _*)

  /** Quantized squared L2 between a subvector column and a codebook
    * centroid column — the shared distance dag of encode and ADC. */
  private def d2q(sv: Column, c: Column): Column = {
    val d2 = graft.functions.VectorOps.l2sq(sv, c) // native fused loop, bit-equal to the HOF fold
    floor(d2 * lit(1e6) + lit(0.5)) / lit(1e6)
  }

  /** Learn the m-subspace codebook: (sub, cluster, c) with `k` centroids
    * per subspace, each trained by the declarative Lloyd loop. Like
    * [[Similarity.kmeansLloyd]], init takes the k lowest-id vectors'
    * slices, so ids 0..k−1 must be present (re-key otherwise). */
  def pqTrain(embs: DataFrame, m: Int, dim: Int, k: Int, iters: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val ds = dim / m
    require(m * ds == dim, s"dim $dim not divisible by m $m")
    (0 until m).map { s =>
      val sub = embs.select(col(idCol).as("vec_id"),
        slice(col(vecCol).cast("array<double>"), s * ds + 1, ds).as("sv"))
      val (cents, _) = Similarity.kmeansFit(sub, k, iters, "sv", "vec_id")
      cents.select(lit(s).as("sub"), col("cluster"), col("c"))
    }.reduce(_ unionByName _)
      // the codebook is m·k tiny rows at the top of an ITERATIVE Lloyd
      // dag; every downstream broadcast (encode join, each query's
      // distance table) would otherwise re-execute the whole training
      // chain — measured 8.2 s → 3.1 s warm on q108 at sf0.1 from cutting
      // the lineage here (the PageRank-checkpoint discipline: materialize
      // small model tables once, eagerly)
      .cutLineage()
  }

  /** Encode each vector as m (sub, code) rows — the long form both the
    * ADC join and the scalar-only gate want; assemble with
    * `collect_list(struct(sub, code))` sorted by sub if an array API is
    * needed. The argmin is a min-struct partial agg ((d2, cluster) min —
    * skew-robust, no window over the corpus), tie-breaking on cluster id
    * like every ranking here. */
  def pqEncode(embs: DataFrame, codebook: DataFrame, m: Int, dim: Int,
      vecCol: String = "embedding", idCol: String = "vec_id",
      passThrough: Seq[String] = Nil): DataFrame = {
    val ds = dim / m
    // `passThrough`: extra per-vector columns (functionally dependent on
    // the id, e.g. an IVF cell) carried through as additional group keys —
    // so a caller that needs them does not have to join the result back to
    // its input and re-execute the input lineage corpus-wide
    val pt = passThrough.map(col)
    val exploded = embs.select(col(idCol).as("vec_id") +: pt :+
        explode(subVectors(col(vecCol).cast("array<double>"), m, ds)).as("t"): _*)
      .select(col("vec_id") +: pt :+ col("t.sub").as("sub") :+ col("t.sv").as("sv"): _*)
    exploded.join(broadcast(codebook), Seq("sub"))
      .select(col("vec_id") +: pt :+ col("sub") :+ col("cluster") :+
        d2q(col("sv"), col("c")).as("d2"): _*)
      .groupBy(col("vec_id") +: col("sub") +: pt: _*)
      .agg(min(struct(col("d2"), col("cluster"))).as("best"))
      .select(col("vec_id") +: pt :+ col("sub") :+
        col("best.cluster").as("code") :+ col("best.d2").as("d2"): _*)
  }

  /** ADC top-k: `queries` is (qid, qv); `codes` is [[pqEncode]]'s long
    * form; result is (qid, nid, rank, ad). The per-query distance table
    * (m·k rows per query — tiny) broadcasts; the code table partial-
    * aggregates its m-term sums map-side, so the shuffle carries one
    * (qid, nid) partial row per map partition and the corpus vectors are
    * never touched. */
  def adcTopK(queries: DataFrame, codes: DataFrame, codebook: DataFrame,
      m: Int, dim: Int, topK: Int): DataFrame = {
    val ds = dim / m
    val qsub = queries.select(col("qid"),
        explode(subVectors(col("qv").cast("array<double>"), m, ds)).as("t"))
      .select(col("qid"), col("t.sub").as("sub"), col("t.sv").as("sv"))
    val dtab = qsub.join(codebook, Seq("sub"))
      .select(col("qid"), col("sub"), col("cluster").as("code"),
        d2q(col("sv"), col("c")).as("qd"))
    val approx = codes.select(col("vec_id").as("nid"), col("sub"), col("code"))
      .join(broadcast(dtab), Seq("sub", "code"))
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("qd")).as("ad0"))
      .select(col("qid"), col("nid"),
        (floor(col("ad0") * lit(1e6) + lit(0.5)) / 1e6).as("ad"))
    val w = Window.partitionBy(col("qid")).orderBy(col("ad"), col("nid"))
    approx.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("qid"), col("nid"), col("rank"), col("ad"))
  }

  val defs: Seq[QueryDef] = Seq(
    // ---- q108: learned PQ, end to end (train → encode → ADC top-k) --------
    // m=2 subspaces × k=4 codes, 2 Lloyd rounds, 8 queries, top 5. The
    // oracle's generated CTE chain replays BOTH subspace k-means runs
    // (init, every distance, every argmin, every rounded centroid — the
    // q105 scheme sliced per subspace), the corpus encode, the per-query
    // distance tables, and the ADC sum/rank — so the learned compression
    // pipeline is value-checked end to end with no recall assumption.
    QueryDef(
      "q108_pq_adc",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val cb = pqTrain(e, O.M, O.Dim, O.K, O.Iters)
        val codes = pqEncode(e, cb, O.M, O.Dim)
        val q = e.filter(col("vec_id") < O.NQueries)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        adcTopK(q, codes, cb, O.M, O.Dim, O.TopN)
          .orderBy(col("qid"), col("rank"))
      },
      Some(O.oracle),
      // headline: train+encode+ADC over the FULL embeddings table at
      // bench SF — the learned-compression path must be regression-
      // visible in BENCH_r* (the codebook constants are model params,
      // not input caps).
      headline = true),
  )

  /** Shared gate constants + generated DuckDB oracle (single source of
    * truth for subspace count, rounds, and query/result sizes — the same
    * scheme as [[Similarity.Km]]). */
  private[graft] object O {
    val Dim = 64
    val M = 2
    val Ds = Dim / M
    val K = 4
    val Iters = 2
    val NQueries = 8
    val TopN = 5

    val oracle: String = {
      def dist(v: String, c: String): String =
        s"floor(list_sum(list_transform(list_zip($v, $c), " +
          s"t -> (t[1] - t[2]) * (t[1] - t[2]))) * 1e6 + 0.5) / 1e6"
      def chain(s: Int): String = {
        val (lo, hi) = (s * Ds + 1, (s + 1) * Ds)
        val slices =
          s"""e$s AS (SELECT vec_id, v[$lo:$hi] AS v FROM e),
             |ep$s AS (
             |  SELECT vec_id,
             |    unnest([{'pos': i, 'x': v[i]} for i in range(1, len(v) + 1)]) AS s
             |  FROM e$s),
             |c${s}_0 AS (SELECT vec_id AS cluster, v AS c FROM e$s WHERE vec_id < $K)"""
        def assign(i: Int): String =
          s"""dd${s}_$i AS (
             |  SELECT e$s.vec_id, c${s}_$i.cluster, ${dist(s"e$s.v", s"c${s}_$i.c")} AS d2
             |  FROM e$s, c${s}_$i),
             |aa${s}_$i AS (
             |  SELECT vec_id, cluster, d2 FROM (
             |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rk
             |    FROM dd${s}_$i) WHERE rk = 1)"""
        def update(i: Int): String =
          s"""g${s}_${i + 1} AS (
             |  SELECT aa${s}_$i.cluster, s.pos AS pos, round(avg(s.x), 6) AS m
             |  FROM aa${s}_$i JOIN ep$s ON ep$s.vec_id = aa${s}_$i.vec_id GROUP BY 1, 2),
             |c${s}_${i + 1} AS (
             |  SELECT cluster, list(m ORDER BY pos) AS c FROM g${s}_${i + 1} GROUP BY cluster)"""
        val rounds = (0 until Iters)
          .map(i => assign(i) + ",\n" + update(i)).mkString(",\n")
        // encode: final-codebook argmin for every corpus vector (= the
        // assign step against c_{Iters}); dq: per-query distance table;
        // ac: this subspace's ADC contribution via the code equi-join
        s"""$slices,
           |$rounds,
           |${assign(Iters)},
           |dq$s AS (
           |  SELECT q.vec_id AS qid, c${s}_$Iters.cluster AS code,
           |    ${dist("q.v", s"c${s}_$Iters.c")} AS qd
           |  FROM e$s q, c${s}_$Iters WHERE q.vec_id < $NQueries),
           |ac$s AS (
           |  SELECT dq$s.qid, aa${s}_$Iters.vec_id AS nid, dq$s.qd
           |  FROM aa${s}_$Iters JOIN dq$s ON dq$s.code = aa${s}_$Iters.cluster)"""
      }
      val chains = (0 until M).map(chain).mkString(",\n")
      val union = (0 until M).map(s => s"SELECT * FROM ac$s").mkString(" UNION ALL ")
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |$chains,
         |uni AS ($union),
         |ap AS (
         |  SELECT qid, nid, floor(sum(qd) * 1e6 + 0.5) / 1e6 AS ad
         |  FROM uni GROUP BY 1, 2),
         |r AS (
         |  SELECT qid, nid, ad,
         |    row_number() OVER (PARTITION BY qid ORDER BY ad, nid) AS rank
         |  FROM ap)
         |SELECT qid, nid, rank, ad FROM r WHERE rank <= $TopN
         |ORDER BY qid, rank""".stripMargin
    }
  }
}
