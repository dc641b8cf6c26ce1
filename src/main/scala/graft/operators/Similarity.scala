package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{QueryDef, Tables}
import graft.functions.VectorOps

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Brute-force cosine top-k (q49) is the correctness baseline: a broadcast
  * cross join of the (small) query set against the corpus — O(|Q|·n), scan
  * bound, no shuffle of the corpus. The scale path is LSH bucketing (q50):
  * deterministic random-hyperplane signatures turn ANN into an equi-join on
  * bucket ids — at 100 TB candidates co-locate in one shuffle, and recall
  * is tunable via signature bits / probing. Near-dup pair detection (q48)
  * thresholds cosine on the self-join; in production it composes with the
  * same LSH bucketing to avoid O(n²).
  */
object Similarity {

  /** IVF-style ANN: a k-means coarse quantizer (MLlib, fixed seed) assigns
    * every vector to a cell; each query probes its `nProbe` nearest
    * centroids and runs exact cosine only within those cells. The 100 TB
    * shape: the quantizer trains on a sample, assignment is one map pass,
    * and search shuffles only (query, cell) candidates — cells play the
    * role LSH buckets play in q50, but data-adaptively. */
  def ivfTopK(spark: SparkSession, embeddings: DataFrame,
      k: Int = 5, nCells: Int = 16, nProbe: Int = 2, nQueries: Int = 50): DataFrame = {
    import spark.implicits._
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feat = embeddings.select($"vec_id", $"embedding",
      array_to_vector($"embedding").as("fv"))
    val model = new KMeans().setK(nCells).setSeed(42)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(feat)
    val assigned = model.transform(feat).select($"vec_id", $"embedding", $"cell")
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }.toSeq
      .toDF("cell", "cvec")
    val probeW = Window.partitionBy($"qid").orderBy($"cdist", $"cell")
    val probes = assigned.filter($"vec_id" < nQueries)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("cdist", VectorOps.l2sq($"qv", $"cvec"))
      .withColumn("pr", row_number().over(probeW))
      .filter($"pr" <= nProbe)
      .select($"qid", $"qv", $"cell")
    val rankW = Window.partitionBy($"qid").orderBy(round($"cos", 6).desc, $"nid")
    probes.join(assigned.select($"vec_id".as("nid"), $"embedding".as("nv"), $"cell"), Seq("cell"))
      .filter($"qid" =!= $"nid")
      .select($"qid", $"nid", VectorOps.cosine($"qv", $"nv").as("cos"))
      .withColumn("rank", row_number().over(rankW))
      .filter($"rank" <= k)
      .select($"qid", $"nid", $"rank", round($"cos", 4).as("cos"))
      .orderBy($"qid", $"rank")
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- q48: embedding cosine near-dup pairs ------------------------------
    QueryDef(
      "q48_embedding_neardup",
      (s, d) => {
        import s.implicits._
        // vec_id < 2000 bounds the O(n²) pair scan (whole corpus at the
        // sf0.01 gate; at scale this composes with LSH bucketing, q50).
        val e = Tables.embeddings(s, d).filter($"vec_id" < 2000)
          .select($"vec_id", $"embedding")
        e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id")
          .select($"a.vec_id".as("a_id"), $"b.vec_id".as("b_id"),
            VectorOps.cosine($"a.embedding", $"b.embedding").as("cos"))
          .filter(round($"cos", 6) > 0.40)
          .select($"a_id", $"b_id", round($"cos", 4).as("cos"))
          .orderBy($"a_id", $"b_id")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings WHERE vec_id < 2000),
             |p AS (
             |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             |    list_sum(list_transform(list_zip(a.v, b.v), t -> t[1] * t[2]))
             |      / nullif(sqrt(list_sum(list_transform(a.v, x -> x * x)))
             |             * sqrt(list_sum(list_transform(b.v, x -> x * x))), 0.0) AS cos
             |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
             |SELECT a_id, b_id, round(cos, 4) AS cos
             |FROM p WHERE round(cos, 6) > 0.40
             |ORDER BY a_id, b_id""".stripMargin)),

    // ---- q49: brute-force cosine top-k -------------------------------------
    // Rank on cosine rounded to 6 digits with vec_id tiebreak, so the
    // ordering is engine-independent despite float summation order.
    QueryDef(
      "q49_cosine_topk",
      (s, d) => {
        import s.implicits._
        val e = Tables.embeddings(s, d).select($"vec_id", $"embedding")
        val q = e.filter($"vec_id" < 10)
          .select($"vec_id".as("qid"), $"embedding".as("qv"))
        val w = Window.partitionBy($"qid").orderBy(round($"cos", 6).desc, $"nid")
        broadcast(q).join(e.select($"vec_id".as("nid"), $"embedding".as("nv")), $"qid" =!= $"nid")
          .select($"qid", $"nid", VectorOps.cosine($"qv", $"nv").as("cos"))
          .withColumn("rank", row_number().over(w))
          .filter($"rank" <= 5)
          .select($"qid", $"nid", $"rank", round($"cos", 4).as("cos"))
          .orderBy($"qid", $"rank")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings),
             |p AS (
             |  SELECT q.vec_id AS qid, n.vec_id AS nid,
             |    list_sum(list_transform(list_zip(q.v, n.v), t -> t[1] * t[2]))
             |      / nullif(sqrt(list_sum(list_transform(q.v, x -> x * x)))
             |             * sqrt(list_sum(list_transform(n.v, x -> x * x))), 0.0) AS cos
             |  FROM e q JOIN e n ON q.vec_id < 10 AND n.vec_id != q.vec_id),
             |r AS (
             |  SELECT qid, nid, cos,
             |    row_number() OVER (PARTITION BY qid ORDER BY round(cos, 6) DESC, nid) AS rank
             |  FROM p)
             |SELECT qid, nid, rank, round(cos, 4) AS cos
             |FROM r WHERE rank <= 5 ORDER BY qid, rank""".stripMargin),
      headline = true),

    // ---- q50: LSH-bucketed approximate nearest neighbors -------------------
    // Candidates = same 12-bit random-hyperplane bucket → exact cosine +
    // top-k within bucket. Rows-only (hash-seeded planes are engine
    // specific); SimilaritySpec measures recall vs q49 brute force.
    QueryDef(
      "q50_ann_lsh",
      (s, d) => {
        import s.implicits._
        val e = Tables.embeddings(s, d)
          .select($"vec_id", $"embedding",
            VectorOps.hyperplaneSignature($"embedding", 6).as("bucket"))
        val q = e.filter($"vec_id" < 50)
          .select($"vec_id".as("qid"), $"embedding".as("qv"), $"bucket")
        val w = Window.partitionBy($"qid").orderBy(round($"cos", 6).desc, $"nid")
        q.join(e.select($"vec_id".as("nid"), $"embedding".as("nv"), $"bucket"),
            Seq("bucket"))
          .filter($"qid" =!= $"nid")
          .select($"qid", $"nid", VectorOps.cosine($"qv", $"nv").as("cos"))
          .withColumn("rank", row_number().over(w))
          .filter($"rank" <= 5)
          .select($"qid", $"nid", $"rank", round($"cos", 4).as("cos"))
          .orderBy($"qid", $"rank")
      },
      None),

    // ---- q63: IVF-bucketed approximate nearest neighbors -------------------
    // Rows-only (k-means initialization is engine-specific);
    // SimilaritySpec measures recall vs the q49 brute force.
    QueryDef(
      "q63_ann_ivf",
      (s, d) => ivfTopK(s, Tables.embeddings(s, d)),
      None),
  )
}
