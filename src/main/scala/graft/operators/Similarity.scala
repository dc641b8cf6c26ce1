package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Lineage, QueryDef, Tables}
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
    * shape: the quantizer trains on a `trainFraction` SAMPLE (never the
    * full corpus — k-means is iterative, so full-corpus training would be
    * the driver's bottleneck at scale; a sample loses nothing because the
    * centroids only need the coarse density shape), assignment is one map
    * pass, and search shuffles only (query, cell) candidates — cells play
    * the role LSH buckets play in q50, but data-adaptively. */
  def ivfTopK(spark: SparkSession, embeddings: DataFrame,
      k: Int = 5, nCells: Int = 16, nProbe: Int = 2, nQueries: Int = 50,
      trainFraction: Double = 0.25): DataFrame = {
    import spark.implicits._
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feat = embeddings.select($"vec_id", $"embedding",
      array_to_vector($"embedding").as("fv"))
    // Guard for tiny corpora (specs run at sf0.001): if the sample can't
    // support nCells clusters, train on everything — the sample path is
    // only a win once the corpus dwarfs the quantizer anyway.
    val sample = feat.sample(withReplacement = false, trainFraction, seed = 42)
    val train = if (sample.count() >= nCells.toLong * 4) sample else feat
    val model = new KMeans().setK(nCells).setSeed(42)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(train)
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

  /** Semantic dedup (the SemDeDup recipe): embeddings are assigned to LSH
    * cells (literal-seeded hyperplane signs — the replayable twin of a
    * k-means quantizer), near-duplicate PAIRS are detected by exact cosine
    * within each cell only, pairs become clusters via connected components,
    * and every cluster keeps exactly its min-id representative. Returns one
    * row per vector: (vec_id, rep_id, kept) — `kept = 0` marks the rows a
    * training pipeline drops.
    *
    * Scale shape: the pair scan is O(Σ cell²) over DISTINCT vectors, never
    * O(n²) — byte-identical embeddings collapse to one representative
    * before the cell join (r9; see body comment), cell count grows with
    * the corpus (more sign bits), and the in-cell self-join is a
    * bucket-co-partitioned equi-join like q46/q50. Components run on the
    * candidate-bounded pair set, not the corpus; the final label join is
    * UNHINTED (r10) — the clustered-id set has one row per vector in any
    * near-dup pair, corpus-proportional in a dense near-dup regime, so
    * AQE picks broadcast only when the runtime size is actually small. */
  def semanticDedup(embs: DataFrame, signs: Array[Array[Double]], tau: Double): DataFrame = {
    val par = embs.sparkSession.sparkContext.defaultParallelism
    // ---- identity collapse (r9) — the [[Dedup.prefixJaccardPairs]]
    // construction for vectors: byte-identical embeddings land in the same
    // cell and pair with each other exactly when their SELF-cosine clears
    // tau (zero-norm / null-element vectors never pair, even with
    // themselves — cosine is null-safe, returning null, not NaN), so rows
    // whose self-cosine passes group by their embedding and everything
    // else stays a singleton through the vec_id key arm. The in-cell pair
    // join — the only stage carrying float arrays at pair cardinality —
    // then sees one representative per distinct vector: an identical-copy
    // duplication factor of r costs r mapping rows, not r² array-carrying
    // pairs per cell. Exactness: component labels are min-ids, each
    // group's rep IS its min id, so min over reps == min over members.
    val selfdup =
      round(VectorOps.cosine(col("embedding"), col("embedding")), 6) > tau
    val keyed = embs.select(col("vec_id"), col("embedding"))
      .filter(col("vec_id").isNotNull)
      .withColumn("gk", struct(
        // selfdup can be NULL (null-safe cosine): both null and false must
        // route to the singleton arm, so the conditions test TRUE only
        when(selfdup, col("embedding")).as("ge"),
        when(selfdup, lit(0L)).otherwise(col("vec_id")).as("gi")))
      .repartition(par, col("gk"))
    // within any gk group the embedding is constant by construction
    // (multi-row groups exist only on the ge arm), so first() is exact
    val reps = keyed.groupBy(col("gk"))
      .agg(min(col("vec_id")).as("rep_id"), first(col("embedding")).as("emb"))
    val mapping = keyed.join(reps.hint("merge"), Seq("gk"))
      .select(col("vec_id"), col("rep_id"))
    val e = reps.select(col("rep_id").as("vec_id"), col("emb").as("embedding"),
      VectorOps.literalSignature(col("emb"), signs).as("cell"))
    val pairs = e.as("a").join(e.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .filter(round(VectorOps.cosine(col("a.embedding"), col("b.embedding")), 6) > tau)
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"))
    val labels = Dedup.connectedComponents(pairs)
      .select(col("node").as("rid"), col("label"))
    mapping
      .join(labels, col("rep_id") === col("rid"), "left")
      .select(col("vec_id"),
        coalesce(col("label"), col("rep_id")).as("rep_id"),
        (coalesce(col("label"), col("rep_id")) === col("vec_id")).cast("int").as("kept"))
  }

  /** Per-class centroids (element-wise mean of an embedding column) — the
    * prototype primitive behind k-means refinement, class-balanced
    * coreset selection, and label-quality audits. Shape: positional
    * explode (map-local) → ONE (label, pos) groupBy whose partial
    * aggregation collapses each partition to |labels|·dim rows before the
    * shuffle → re-assemble the dim-sorted array per label. At 100 TB the
    * shuffle carries only running (sum, count) pairs per (label, pos) —
    * never vectors. Means are rounded to 6 digits (noise-dominated
    * aggregate; cross-engine summation order). */
  def labelCentroids(embs: DataFrame, labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame =
    embs
      .select(col(labelCol).as("label"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(round(avg(col("x")), 6).as("m"), count(lit(1)).as("cnt"))
      .groupBy(col("label"))
      .agg(
        max(col("cnt")).as("n_vectors"),
        transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid"))

  /** Distance-to-centroid outlier detection: the `topK` vectors FARTHEST
    * from their own class centroid (squared L2, rounded before ranking) —
    * the standard mislabeled/garbage-embedding audit. The centroid table
    * is |labels| rows → broadcast; the corpus side stays a map stage until
    * the final per-label top-k window (k rows per label survive). */
  def centroidOutliers(embs: DataFrame, topK: Int, labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame = {
    val cents = labelCentroids(embs, labelCol, vecCol)
      .select(col("label"), col("centroid"))
    // native fused loop (L2SqExpr) — bit-equal to the HOF fold the
    // oracle replays, measured codegen'd vs interpreted
    val d2 = VectorOps.l2sq(col(vecCol).cast("array<double>"), col("centroid"))
    val w = Window.partitionBy(col("label")).orderBy(desc("d2"), col("vec_id"))
    embs.select(col("vec_id"), col(labelCol).as("label"), col(vecCol))
      .join(broadcast(cents), Seq("label"))
      // floor-quantized, not round(): d2 is PURE RATIONAL (products/sums of
      // exact 6-decimal centroid values), so decimal ties are possible and
      // engine round() semantics differ — the repo's quantization rule
      .select(col("label"), col("vec_id"),
        (floor(d2 * lit(1e6) + lit(0.5)) / lit(1e6)).as("d2"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
  }

  /** Lloyd k-means over an embedding column as a fully DECLARATIVE plan —
    * the oracle-checkable twin of the Spark-ML KMeans that seeds
    * [[graft.operators.IvfIndex]] (whose internal init is not replayable in
    * an external engine; this one is, so the gate can value-check every
    * assignment and centroid cross-engine).
    *
    * Determinism discipline (the q92/q93 rules): init = the k lowest-id
    * vectors (raw doubles, no rounding needed); updated centroid means
    * round(·, 6) (noise-dominated aggregate — cross-engine row-summation
    * order); per-row distances fold the zipped difference squares
    * left-to-right over identical inputs (bit-equal cross-engine) and
    * floor-quantize to 1e-6 before the argmin, whose ties break on cluster
    * id — so both engines pick identical assignments every iteration.
    *
    * Shape at 100 TB: each iteration is one map-side argmin against a
    * BROADCAST k×dim centroid table (k·dim doubles — tiny) plus one
    * (cluster, pos) groupBy whose partial aggregation collapses every map
    * partition to k·dim running (sum, count) pairs before the shuffle —
    * vectors never shuffle. `iters` is a model parameter like PageRank's
    * iteration count: the loop unrolls into one static dag with no
    * driver-side data round-trip (past ~10 iterations, checkpoint between
    * rounds the way [[graft.operators.Graph.pageRank]] does). */
  def kmeansLloyd(embs: DataFrame, k: Int, iters: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame =
    kmeansFit(embs, k, iters, vecCol, idCol)._2

  /** Topic discovery — the BERTopic-style composite: documents clustered
    * by embedding ([[kmeansLloyd]] — deterministic Lloyd, no RNG), each
    * cluster labeled with its most distinctive terms
    * ([[TextAnalysis.distinctiveTerms]]'s ratio-form lift with the
    * cluster standing in for the source). Both halves keep their scale
    * shapes: vectors never shuffle (per-round (cluster, pos) partial
    * sums), corpus text explodes exactly once into a materialized
    * (cluster, token) census, and the top-k rank is WindowGroupLimit-
    * pruned. The join between worlds is assignment⋈documents on the
    * document id — the one new exchange this composite adds. */
  def topicTerms(docs: DataFrame, embs: DataFrame, k: Int, iters: Int,
      topK: Int = 5, minCount: Long = 20): DataFrame = {
    val assign = kmeansLloyd(embs, k, iters)
      .select(col("vec_id").as("doc_id"), col("cluster").cast("string").as("cl"))
    val clustered = docs.join(assign, Seq("doc_id"))
      .select(col("cl").as("source"), col("text"))
    TextAnalysis.distinctiveTerms(clustered, topK, minCount)
      .withColumnRenamed("source", "cluster")
  }

  /** Embedding-health audit — the pre-flight for every ANN/clustering
    * consumer: vector count, null embeddings, zero vectors, dimension
    * range, and exact p50/p90 of the squared norm. The norm² is the
    * deterministic left-fold ([[graft.functions.VectorOps.norm2]] — the
    * engine-replayable sum order) quantized to the 1e-6 grid BEFORE any
    * aggregation, so the quantile machinery ([[Sketches.bisectQuantiles]],
    * bounded state) works on exact integers. One corpus pass materializes
    * the (norm, dim) projection; everything downstream is censuses and
    * one-row broadcasts. */
  def embeddingHealth(embs: DataFrame): DataFrame = {
    import graft.core.Lineage.CutOps
    val v = embs.filter(col("embedding").isNotNull)
      .select(floor(graft.functions.VectorOps.norm2(col("embedding")) * 1e6
        + lit(0.5)).cast("long").as("iv"),
        size(col("embedding")).as("dim"), lit("g").as("g"))
      .cutLineage()
    val qs = Sketches.bisectQuantiles(v, "iv", "g", Seq(0.5, 0.9), scale = 1)
    val p50 = qs.filter(col("q") === 0.5)
      .select(col("val").cast("long").as("p50_n2_micro"))
    val p90 = qs.filter(col("q") === 0.9)
      .select(col("val").cast("long").as("p90_n2_micro"))
    val nulls = embs.filter(col("embedding").isNull)
      .agg(count(lit(1)).as("n_null"))
    v.agg(count(lit(1)).as("n_vectors"),
        sum(when(col("iv") === 0L, 1L).otherwise(0L)).as("n_zero"),
        min(col("dim")).cast("long").as("dim_min"),
        max(col("dim")).cast("long").as("dim_max"))
      .crossJoin(broadcast(nulls))
      .crossJoin(broadcast(p50))
      .crossJoin(broadcast(p90))
  }

  /** [[kmeansLloyd]]'s fit, returning BOTH the final centroid table
    * (cluster, c) and the final assignment — product quantization
    * ([[graft.operators.Pq.pqTrain]]) trains one of these per subspace
    * and needs the centroids for its distance tables. */
  private[operators] def kmeansFit(embs: DataFrame, k: Int, iters: Int,
      vecCol: String, idCol: String): (DataFrame, DataFrame) = {
    // `base` is consumed by every assign (iters+1×) and every update
    // (iters×); the explicit exchange makes all consumers ReusedExchange
    // readers of ONE scan instead of re-scanning the corpus per round —
    // the declarative stand-in for the `.cache()` an ML k-means would do
    val base = embs.select(col(idCol).as("vec_id"),
      col(vecCol).cast("array<double>").as("v"))
      .repartition(embs.sparkSession.sparkContext.defaultParallelism,
        col("vec_id"))
    val d2 = VectorOps.l2sq(col("v"), col("c")) // native fused loop, bit-equal to the HOF fold
    val d2q = floor(d2 * lit(1e6) + lit(0.5)) / lit(1e6)
    def assign(cents: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cluster"))
      base.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cluster"), col("v"), d2q.as("d2"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .drop("rk")
    }
    def update(assigned: DataFrame): DataFrame =
      assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(round(avg(col("x")), 6).as("m"))
        .groupBy(col("cluster"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          t => t.getField("m")).as("c"))
    // init: the k lowest-id vectors, cluster id = vec_id (requires ids
    // 0..k−1 present, as the contiguous-id tables here guarantee; pass a
    // re-keyed frame otherwise)
    var cents = base.filter(col("vec_id") < k)
      .select(col("vec_id").as("cluster"), col("v").as("c"))
    for (_ <- 1 to iters) cents = update(assign(cents))
    (cents, assign(cents)) // (vec_id, cluster, v, d2) under the final centroids
  }

  /** Johnson–Lindenstrauss random projection: reduce `array<float>`
    * embeddings to `signs.length` dimensions via literal Rademacher (±1)
    * planes, scaled by 1/√k to preserve expected norms — the standard
    * cheap pre-ANN shrink (project once, index/search the short vectors,
    * re-rank survivors in the original space). Pure map stage: zero
    * shuffle, scales with input splits; the projection matrix is a plan
    * literal, so any executor (or any engine — the oracle embeds the same
    * signs) reproduces identical outputs bit-for-bit. Outputs are
    * floor-quantized (pure-rational inputs × ±1 sums, then one
    * correctly-rounded sqrt — deterministic cross-engine). */
  def randomProject(embs: DataFrame, signs: Array[Array[Double]],
      vecCol: String = "embedding"): DataFrame = {
    val scale = 1.0 / math.sqrt(signs.length.toDouble)
    val projCols = signs.zipWithIndex.map { case (s, j) =>
      (floor(VectorOps.literalProj(col(vecCol), s) * lit(scale) * 1e6 + 0.5) / 1e6)
        .as(s"p$j")
    }
    embs.select(col("vec_id") +: projCols.toSeq: _*)
  }

  /** Online triplet mining for contrastive training: for each anchor, the
    * hardest POSITIVE (nearest same-label vector — the one the model most
    * needs to hold close) and the k hardest NEGATIVES (nearest
    * different-label vectors — the ones most likely to violate the
    * margin). This is the batch-mining step of triplet/InfoNCE pipelines;
    * random negatives are trivial (any hash pick) but HARD negatives are
    * a similarity-search problem, which is why it lives here.
    *
    * Gate shape: anchors capped + broadcast, corpus side a map stage, one
    * per-(anchor, kind) rank window on ≤ anchors × corpus pairs (the
    * input-capped-verification rule). The production path at corpus scale
    * is the IVF shortlist ([[IvfIndex.search]] / `IvfPqIndex.searchRerank`
    * with probed-cell pruning) followed by the same label split — mining
    * quality degrades only as ANN recall does. */
  def hardTriplets(embs: DataFrame, nAnchors: Int, kNeg: Int): DataFrame = {
    val e = embs.select(col("vec_id"), col("embedding"), col("label"))
    val q = e.filter(col("vec_id") < nAnchors)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("label").as("qlabel"))
    val w = Window.partitionBy(col("qid"), col("kind"))
      .orderBy(round(col("cos"), 6).desc, col("nid"))
    broadcast(q)
      .join(e.select(col("vec_id").as("nid"), col("embedding").as("nv"),
        col("label").as("nlabel")), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        when(col("qlabel") === col("nlabel"), lit("pos")).otherwise(lit("neg")).as("kind"),
        VectorOps.cosine(col("qv"), col("nv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter((col("kind") === "neg" && col("rank") <= kNeg) ||
        (col("kind") === "pos" && col("rank") === 1))
      .select(col("qid"), col("kind"), col("rank"), col("nid"),
        round(col("cos"), 4).as("cos"))
      .orderBy(col("qid"), col("kind"), col("rank"))
  }

  /** Embedding-space class separability — the go/no-go diagnostic run
    * BEFORE spending on clustering/ANN/triplet mining: per label, the
    * mean within-class cosine, plus the across-class mean as the
    * `label = -1` row. Embeddings that score intra ≈ inter are noise for
    * label-driven work no matter how good the index is (exactly the
    * regime the IVF-PQ spec measured on this corpus). Gate shape:
    * input-capped all-pairs (the verification rule); the production path
    * subsamples pairs per class with the q131 hash-ring — the statistic
    * needs thousands of pairs, not all of them. */
  def classSeparability(embs: DataFrame, nVecs: Int): DataFrame = {
    val e = embs.filter(col("vec_id") < nVecs)
      .select(col("vec_id"), col("label"), col("embedding"))
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        when(col("a.label") === col("b.label"), col("a.label"))
          .otherwise(lit(-1)).as("label"),
        VectorOps.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
    pairs.groupBy(col("label"))
      .agg(count(lit(1)).as("n_pairs"), round(avg(col("cos")), 6).as("mean_cos"))
      .orderBy(col("label"))
  }

  /** Quantization recall audit — does int8 compression change RETRIEVAL?
    * The question that decides whether q74's 4× shrink is free: per query,
    * the overlap between the float top-k and the top-k computed over the
    * int8-quantized corpus. Cosine is scale-invariant, so the quantized
    * ranking runs DIRECTLY on the integer vectors (the per-vector scale
    * divides out of the norm — no dequantization pass, no float read of
    * the compressed corpus). Input-capped queries (the verification
    * rule); both rankings use q49's engine-independent contract. */
  def quantizedRecallAudit(embs: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val q = embs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def topk(corpus: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("qid"))
        .orderBy(round(col("cos"), 6).desc, col("nid"))
      broadcast(q).join(corpus, col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"),
          VectorOps.cosine(col("qv"), col("nv")).as("cos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("qid"), col("nid"))
    }
    val fTop = topk(embs.select(col("vec_id").as("nid"), col("embedding").as("nv")))
    val iTop = topk(Curation.quantizeInt8(embs, "embedding")
      .select(col("vec_id").as("nid"), col("qvec").cast("array<double>").as("nv")))
    q.select(col("qid"))
      .join(fTop.join(iTop, Seq("qid", "nid")).groupBy(col("qid"))
        .agg(count(lit(1)).as("n")), Seq("qid"), "left")
      .select(col("qid"), coalesce(col("n"), lit(0L)).as("n_common"))
      .orderBy(col("qid"))
  }

  /** Principal component by power iteration — the embedding-space variance
    * audit (is one direction carrying most of the energy? how much does a
    * 1-dim projection explain?). Declarative Lloyd's discipline applied to
    * eigendecomposition: the covariance census is built ONCE as a (i, j, c)
    * table with every entry rounded (round 6 — the Km per-round contract,
    * so both engines iterate on IDENTICAL matrices), checkpointed, and
    * each power round is one 64-row join + partial agg with the iterate
    * re-rounded after normalization. Shapes at 100 TB: the d²-fanout
    * self-join on vec_id is the only corpus-scale stage (n·d² rows,
    * partial-aggregated to d² — for big d, sample rows first; the census
    * only needs the density shape, the same argument as IVF's training
    * sample); every iteration is census-sized. The start vector is a
    * constant (0.125 — any nonzero constant works, round-0 normalization
    * removes the scale) so the replay is deterministic: no RNG, no sign
    * ambiguity. */
  /** The rounded, checkpointed (i, j, c) covariance census shared by
    * [[pcaPower]] and [[pcaTopK]]. ONE parquet scan: the exploded
    * (vec_id, pos, x) frame is materialized and every later consumer
    * (mean census, row count, both sides of the covariance self-join)
    * reads the cut — without it the self-join alone re-scans the corpus
    * per side. */
  private def covarianceCensus(embs: DataFrame): DataFrame = {
    import graft.core.Lineage.CutOps
    val xp = embs.select(col("vec_id"),
      posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
      .cutLineage()
    val mstats = xp.groupBy(col("pos"))
      .agg(round(avg(col("x")), 6).as("m"), count(lit(1)).as("cnt"))
    // the census divisor, read off the 64-row mean census (no extra scan)
    val n = mstats.agg(max(col("cnt"))).head().getLong(0).toDouble
    val means = mstats.select(col("pos"), col("m"))
    val cent = xp.join(broadcast(means), "pos")
      .select(col("vec_id"), col("pos"), (col("x") - col("m")).as("xc"))
    val census = cent.as("a").join(cent.as("b"), col("a.vec_id") === col("b.vec_id"))
      .groupBy(col("a.pos").as("i"), col("b.pos").as("j"))
      .agg(round(sum(col("a.xc") * col("b.xc")) / lit(n), 6).as("c"))
      .cutLineage()
    Lineage.release(xp) // census is materialized — the exploded frame is dead
    census
  }

  /** Spark's `round(col, 6)` on DoubleType, replicated for the driver-side
    * power rounds: identity on NaN/±Inf, else decimal HALF_UP on the
    * double's canonical decimal form (what `BigDecimal(double)` builds) —
    * SimilaritySpec pins equality against the Column round on a value
    * grid. */
  private def r6(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The collected covariance census as (sorted positions, dense matrix) —
    * d² doubles of MODEL state (d is a schema parameter like k-means' k:
    * 64 here, d²·8 B = 32 KB; corpus size never enters), the same bounded
    * driver-state class as the CMS/HLL sketch cells. Collecting it lets
    * the k·iters power rounds run as driver arithmetic instead of ~40
    * Spark jobs over 64-row frames (r13: q145's wall was round
    * orchestration — per-round localCheckpoint + release — not compute;
    * measured 2.32 → ~1.1 s best-of-3). */
  private def covMatrix(cov: DataFrame): (Array[Int], Array[Array[Double]]) = {
    val rows = cov.select(col("i"), col("j"), col("c")).collect()
    val poss = rows.map(_.getInt(0)).distinct.sorted
    val idx = poss.zipWithIndex.toMap
    val m = Array.fill(poss.length, poss.length)(0.0)
    rows.foreach(r => m(idx(r.getInt(0)))(idx(r.getInt(1))) = r.getDouble(2))
    (poss, m)
  }

  /** Driver twin of [[powerRounds]]: `iters` rounds of
    * v ← round(normalize(C·v), 6) from the 0.125 seed, mirroring the
    * distributed dag's expression shapes ((c*w) products summed, u/nm
    * rounded) — summation ORDER is ascending-j, a reordering the same
    * round-6 noise-domination contract that lets DuckDB replay these
    * rounds already absorbs. SimilaritySpec pins driver ≡ distributed on
    * the gate corpus. */
  private def powerRoundsDriver(m: Array[Array[Double]], iters: Int): Array[Double] = {
    val d = m.length
    var w = Array.fill(d)(0.125)
    for (_ <- 1 to iters) {
      val u = Array.tabulate(d) { i =>
        var s = 0.0; var j = 0
        while (j < d) { s += m(i)(j) * w(j); j += 1 }
        s
      }
      var n2 = 0.0
      var i = 0
      while (i < d) { n2 += u(i) * u(i); i += 1 }
      val nm = math.sqrt(n2)
      w = u.map(x => r6(x / nm))
    }
    w
  }

  /** Driver twin of [[rayleigh]]: round(Σ (c·w_i)·w_j, 6). */
  private def rayleighDriver(m: Array[Array[Double]], w: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < m.length) {
      var j = 0
      while (j < m.length) { s += m(i)(j) * w(i) * w(j); j += 1 }
      i += 1
    }
    r6(s)
  }

  /** `iters` rounds of v ← round(normalize(C·v), 6) from the constant
    * seed, lineage-cut per round — the replayable power-iteration core.
    * Distributed spelling, kept as the spec-pinned reference twin of
    * [[powerRoundsDriver]] (and the shape a deployment with d large
    * enough that d² stops being driver-safe would revert to). */
  private[operators] def powerRounds(cov: DataFrame, iters: Int): DataFrame = {
    import graft.core.Lineage.CutOps
    var v = cov.filter(col("i") === col("j"))
      .select(col("i").as("pos"), lit(0.125).as("w"))
    for (_ <- 1 to iters) {
      val prev = v
      val u = cov
        .join(v.select(col("pos").as("j"), col("w")), "j")
        .groupBy(col("i").as("pos")).agg(sum(col("c") * col("w")).as("u"))
      val nm = u.agg(sqrt(sum(col("u") * col("u"))).as("nm"))
      v = u.crossJoin(broadcast(nm))
        .select(col("pos"), round(col("u") / col("nm"), 6).as("w"))
        .cutLineage()
      graft.core.Lineage.release(prev) // round i−1's 64-row block is dead
    }
    v
  }

  /** Rayleigh quotient round(vᵀCv, 6) as a one-row frame — distributed
    * reference twin of [[rayleighDriver]] (spec-pinned). */
  private[operators] def rayleigh(cov: DataFrame, v: DataFrame): DataFrame = cov
    .join(v.select(col("pos").as("i"), col("w").as("wi")), "i")
    .join(v.select(col("pos").as("j"), col("w").as("wj")), "j")
    .agg(round(sum(col("c") * col("wi") * col("wj")), 6).as("eigval"))

  def pcaPower(embs: DataFrame, iters: Int = 8): DataFrame = {
    val spark = embs.sparkSession
    val cov = covarianceCensus(embs)
    val (poss, m) = covMatrix(cov) // d²-bounded model state (see covMatrix)
    Lineage.release(cov) // census collected — its blocks are dead
    val w = powerRoundsDriver(m, iters)
    val lam = rayleighDriver(m, w)
    var tr = 0.0 // Σ diagonal, ascending — the same reorder class as lam
    for (i <- m.indices) tr += m(i)(i)
    import spark.implicits._
    poss.indices.map(k => (poss(k), w(k), lam, r6(lam / tr)))
      .toDF("pos", "loading", "eigval", "var_ratio")
      .orderBy(col("pos"))
  }

  /** Top-k principal components by power iteration + Hotelling
    * deflation: after extracting (λ_c, v_c), the census updates to
    * round(C − λ_c·v_c v_cᵀ, 6) — rounded and checkpointed per
    * component, so both engines deflate IDENTICAL matrices and the whole
    * spectrum replays (the [[Km]] per-round contract applied at the
    * component level). var_ratio is against the ORIGINAL trace, so the
    * rows cumulate toward the total explained variance. Shapes: the one
    * corpus-scale stage is [[covarianceCensus]]; everything after is k ×
    * iters matvecs over d²/d-row frames — per-round cut state is d/d²
    * rows, the most tightly census-bounded of the iterative families
    * (§R12 family map): the reliable-checkpoint knob is never
    * load-bearing here, only the executor-loss-recovery default. */
  def pcaTopK(embs: DataFrame, k: Int = 3, iters: Int = 6): DataFrame = {
    require(k >= 1)
    val spark = embs.sparkSession
    val cov0 = covarianceCensus(embs)
    val (poss, m0) = covMatrix(cov0) // d²-bounded model state (see covMatrix)
    Lineage.release(cov0) // census collected — its blocks are dead
    var tr = 0.0
    for (i <- m0.indices) tr += m0(i)(i)
    var m = m0
    val rows = (1 to k).flatMap { comp =>
      val w = powerRoundsDriver(m, iters)
      val lam = rayleighDriver(m, w)
      if (comp < k) // the k-th deflation has no consumer — skip building it
        m = Array.tabulate(m.length, m.length)((i, j) =>
          r6(m(i)(j) - lam * w(i) * w(j))) // round(c − (λ·wi)·wj, 6)
      poss.indices.map(p => (comp, poss(p), w(p), lam, r6(lam / tr)))
    }
    import spark.implicits._
    rows.toDF("component", "pos", "loading", "eigval", "var_ratio")
      .orderBy(col("component"), col("pos"))
  }

  /** Maximal-marginal-relevance re-ranking — diversified top-k: greedily
    * pick k results maximizing λ·rel(q,c) − (1−λ)·max_{s∈S} sim(c,s), the
    * standard redundancy-penalized retrieval step after ANN. Distributed
    * shape: the CORPUS-scale work (relevance top-`pool` per query, then
    * the pool×pool sim table) happens once up front — exactly q49's
    * broadcast-join + WindowGroupLimit shape; the greedy loop then runs k
    * declarative rounds over pool-sized frames (anti-join the selected
    * set, max-sim partial agg, rank-1 pick), each lineage-cut. Every
    * similarity and score is floor-quantized, so the argmax chain replays
    * bit-identically cross-engine (ties break on nid). */
  def mmrRerank(embs: DataFrame, nQueries: Int = Mmr.NQ, pool: Int = Mmr.Pool,
      k: Int = Mmr.K, lambda: Double = Mmr.Lambda): DataFrame = {
    import graft.core.Lineage.CutOps
    val q6 = (c: org.apache.spark.sql.Column) => floor(c * 1e6 + 0.5) / 1e6
    val e = embs.select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val wRel = Window.partitionBy(col("qid")).orderBy(col("rel").desc, col("nid"))
    val cand = broadcast(q)
      .join(e.select(col("vec_id").as("nid"), col("embedding").as("nv")),
        col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), col("nv"),
        q6(VectorOps.cosine(col("qv"), col("nv"))).as("rel"))
      .withColumn("rk", row_number().over(wRel))
      .filter(col("rk") <= pool)
      .drop("rk")
      .cutLineage()
    val sims = cand.as("a")
      .join(cand.as("b"),
        col("a.qid") === col("b.qid") && col("a.nid") =!= col("b.nid"))
      .select(col("a.qid").as("qid"), col("a.nid").as("a_nid"),
        col("b.nid").as("b_nid"),
        q6(VectorOps.cosine(col("a.nv"), col("b.nv"))).as("sim"))
      .cutLineage()
    val wPick = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("nid"))
    var selected = cand
      .select(col("qid"), col("nid"), col("rel").as("score"))
      .withColumn("rk", row_number().over(wPick))
      .filter(col("rk") === 1)
      .select(col("qid"), col("nid"), lit(1).as("step"), col("score"))
      .cutLineage()
    for (t <- 2 to k) {
      val remaining = cand.join(selected.select(col("qid"), col("nid")),
        Seq("qid", "nid"), "left_anti")
      val maxSim = sims
        .join(selected.select(col("qid"), col("nid").as("b_nid")), Seq("qid", "b_nid"))
        .groupBy(col("qid"), col("a_nid").as("nid")).agg(max(col("sim")).as("ms"))
      val scored = remaining.join(maxSim, Seq("qid", "nid"), "left")
        .select(col("qid"), col("nid"),
          q6(lit(lambda) * col("rel") -
            lit(1.0 - lambda) * coalesce(col("ms"), lit(0.0))).as("score"))
      val prev = selected
      selected = selected.union(
        scored.withColumn("rk", row_number().over(wPick))
          .filter(col("rk") === 1)
          .select(col("qid"), col("nid"), lit(t).as("step"), col("score")))
        .cutLineage()
      Lineage.release(prev)
    }
    Lineage.release(cand); Lineage.release(sims) // result = final cut only
    selected.orderBy(col("qid"), col("step"))
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- q146: MMR diversified re-ranking ----------------------------------
    // Pool-20 relevance candidates, 5 greedy quantized rounds at λ=0.7;
    // the generated oracle replays the pool, the pairwise sim table, and
    // every pick round.
    QueryDef(
      "q146_mmr_rerank",
      (s, d) => mmrRerank(Tables.embeddings(s, d)),
      Some(Mmr.oracle)),

    // ---- q162: top-k PCA via power iteration + deflation -------------------
    // Three components, six rounds each, census deflated and re-rounded
    // between components; the generated oracle replays the full spectrum.
    QueryDef(
      "q162_pca_topk",
      (s, d) => pcaTopK(Tables.embeddings(s, d), k = PcaK.K, iters = PcaK.Iters),
      Some(PcaK.oracle)),

    // ---- q145: principal component via power iteration ---------------------
    // Rounded covariance census + 8 replayed power rounds; the oracle's
    // generated CTE chain mirrors every round, the Rayleigh quotient, and
    // the trace ratio.
    QueryDef(
      "q145_pca_power",
      (s, d) => pcaPower(Tables.embeddings(s, d), iters = Pca.Iters),
      Some(Pca.oracle),
      // headline: the n·d² covariance fan + 4096-group partial agg is a
      // shape no other bench query covers
      headline = true),

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

    // ---- q139: int8-quantization recall audit ------------------------------
    // Overlap@5 between the float and int8-ranked top-k for 10 queries;
    // the oracle replays the quantization (q74's spelling), both
    // rankings, and the overlap count.
    QueryDef(
      "q139_quantized_recall",
      (s, d) => quantizedRecallAudit(Tables.embeddings(s, d), nQueries = 10, k = 5),
      Some("""WITH e AS (
             |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings),
             |qz AS (
             |  SELECT vec_id,
             |    list_transform(v, x -> CAST(greatest(-127, least(127,
             |      CAST(floor(x * scale + 0.5) AS BIGINT))) AS DOUBLE)) AS iv
             |  FROM (SELECT vec_id, v,
             |          CASE WHEN mx = 0 THEN 0.0 ELSE 127.0 / mx END AS scale
             |        FROM (SELECT vec_id, v,
             |                list_max(list_transform(v, x -> abs(x))) AS mx FROM e))),
             |qs AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
             |f AS (
             |  SELECT qid, nid FROM (
             |    SELECT q.qid, n.vec_id AS nid,
             |      row_number() OVER (PARTITION BY q.qid ORDER BY
             |        round(list_sum(list_transform(list_zip(q.qv, n.v), t -> t[1] * t[2]))
             |          / nullif(sqrt(list_sum(list_transform(q.qv, x -> x * x)))
             |                 * sqrt(list_sum(list_transform(n.v, x -> x * x))), 0.0), 6) DESC,
             |        n.vec_id) AS rk
             |    FROM qs q JOIN e n ON n.vec_id != q.qid)
             |  WHERE rk <= 5),
             |g AS (
             |  SELECT qid, nid FROM (
             |    SELECT q.qid, n.vec_id AS nid,
             |      row_number() OVER (PARTITION BY q.qid ORDER BY
             |        round(list_sum(list_transform(list_zip(q.qv, n.iv), t -> t[1] * t[2]))
             |          / nullif(sqrt(list_sum(list_transform(q.qv, x -> x * x)))
             |                 * sqrt(list_sum(list_transform(n.iv, x -> x * x))), 0.0), 6) DESC,
             |        n.vec_id) AS rk
             |    FROM qs q JOIN qz n ON n.vec_id != q.qid)
             |  WHERE rk <= 5),
             |m AS (
             |  SELECT f.qid, count(*) AS n FROM f JOIN g USING (qid, nid) GROUP BY 1)
             |SELECT qs.qid, CAST(coalesce(m.n, 0) AS BIGINT) AS n_common
             |FROM qs LEFT JOIN m ON m.qid = qs.qid
             |ORDER BY qs.qid""".stripMargin)),

    // ---- q138: embedding class separability --------------------------------
    // Mean within-class cosine per label + the across-class mean as the
    // label = -1 row, over the capped pair set; round(avg, 6) absorbs the
    // cross-engine summation-order noise of the ~80k-term averages.
    QueryDef(
      "q138_class_separability",
      (s, d) => classSeparability(Tables.embeddings(s, d), nVecs = 400),
      Some("""WITH e AS (
             |  SELECT vec_id, label,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings WHERE vec_id < 400),
             |p AS (
             |  SELECT CASE WHEN a.label = b.label THEN a.label ELSE -1 END AS label,
             |    list_sum(list_transform(list_zip(a.v, b.v), t -> t[1] * t[2]))
             |      / nullif(sqrt(list_sum(list_transform(a.v, x -> x * x)))
             |             * sqrt(list_sum(list_transform(b.v, x -> x * x))), 0.0) AS cos
             |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
             |SELECT label, CAST(count(*) AS BIGINT) AS n_pairs,
             |  round(avg(cos), 6) AS mean_cos
             |FROM p GROUP BY label ORDER BY label""".stripMargin)),

    // ---- q126: hard-triplet mining (contrastive training prep) -------------
    // q49's engine-independent ranking contract (round-6 cosine + nid
    // tiebreak) extended with the label split: hardest positive + top-3
    // hardest negatives per anchor.
    QueryDef(
      "q126_hard_triplets",
      (s, d) => hardTriplets(Tables.embeddings(s, d), nAnchors = 10, kNeg = 3),
      Some("""WITH e AS (
             |  SELECT vec_id, label,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings),
             |p AS (
             |  SELECT q.vec_id AS qid, n.vec_id AS nid,
             |    CASE WHEN q.label = n.label THEN 'pos' ELSE 'neg' END AS kind,
             |    list_sum(list_transform(list_zip(q.v, n.v), t -> t[1] * t[2]))
             |      / nullif(sqrt(list_sum(list_transform(q.v, x -> x * x)))
             |             * sqrt(list_sum(list_transform(n.v, x -> x * x))), 0.0) AS cos
             |  FROM e q JOIN e n ON q.vec_id < 10 AND n.vec_id != q.vec_id),
             |r AS (
             |  SELECT qid, kind, nid, cos,
             |    row_number() OVER (PARTITION BY qid, kind
             |                       ORDER BY round(cos, 6) DESC, nid) AS rank
             |  FROM p)
             |SELECT qid, kind, rank, nid, round(cos, 4) AS cos
             |FROM r
             |WHERE (kind = 'neg' AND rank <= 3) OR (kind = 'pos' AND rank = 1)
             |ORDER BY qid, kind, rank""".stripMargin)),

    // ---- q50: LSH-bucketed near-neighbor retrieval (multiprobe) ------------
    // The planes are SEEDED LITERALS (VectorOps.rademacherSigns), so the
    // oracle replays the ENTIRE pipeline — bucketing, radius-1 multiprobe,
    // cosine verification — in DuckDB with the same ±1 patterns: the gate
    // checks the approximate result exactly, with no recall assumption.
    // Spark side is the scalable shape (probe-explode → bucket equi-join →
    // broadcast candidate verification); the oracle is the O(n²) spelling,
    // so the PROBE side is capped at vec_id < 2000 (like q48; covers the
    // whole corpus at gate SFs) per the input-capped-verification rule.
    // 8 sign bits → 256 buckets; radius-1 multiprobe touches 9/256 of
    // bucket pairs, so the bucket join stays sub-quadratic at scale.
    QueryDef(
      "q50_ann_lsh",
      (s, d) => {
        import s.implicits._
        val signs = Lsh.signs
        val emb = Tables.embeddings(s, d).select($"vec_id", $"embedding")
        val e = emb.select($"vec_id", $"embedding",
          VectorOps.literalSignature($"embedding", signs).as("bucket"))
        val probeArr = array(($"bucket" +:
          signs.indices.map(p => $"bucket".bitwiseXOR(lit(1L << p)))): _*)
        val probes = e.filter($"vec_id" < Lsh.ProbeCap)
          .select($"vec_id", explode(probeArr).as("pb"))
        val cand = probes.as("a")
          .join(e.select($"vec_id", $"bucket").as("b"),
            $"a.pb" === $"b.bucket" && $"a.vec_id" < $"b.vec_id")
          .select($"a.vec_id".as("a_id"), $"b.vec_id".as("b_id"))
        // Only bare id-pairs are broadcast — never rows carrying embeddings
        // (broadcasting payload-bearing join output is an OOM risk at scale).
        broadcast(cand)
          .join(emb.select($"vec_id".as("a_id"), $"embedding".as("av")), "a_id")
          .join(emb.select($"vec_id".as("b_id"), $"embedding".as("bv")), "b_id")
          .select($"a_id", $"b_id", VectorOps.cosine($"av", $"bv").as("cos"))
          .filter(round($"cos", 6) > 0.40)
          .select($"a_id", $"b_id", round($"cos", 4).as("cos"))
          .orderBy($"a_id", $"b_id")
      },
      Some(Lsh.oracle)),

    // ---- q63: IVF-bucketed approximate nearest neighbors -------------------
    // Gate twin of ivfTopK with a FIXED spherical coarse quantizer: cell =
    // argmax projection onto 16 seeded ±1 literal directions (so DuckDB
    // reproduces assignment, probing, and in-cell top-k exactly — a learned
    // k-means quantizer cannot be replayed cross-engine; that production
    // path is ivfTopK above, recall-checked by SimilaritySpec). Projections
    // are rounded to 6 digits BEFORE any argmax/sort so near-ties resolve
    // identically on both engines; probe order ties break on cell id.
    QueryDef(
      "q63_ann_ivf",
      (s, d) => {
        import s.implicits._
        val dirs = Ivf.dirs
        val projArr = array(dirs.map(sr =>
          round(VectorOps.literalProj($"embedding", sr), 6)): _*)
        val p = Tables.embeddings(s, d)
          .select($"vec_id", $"embedding", projArr.as("pa"))
        val assigned = p.select($"vec_id", $"embedding".as("nv"),
          array_position($"pa", array_max($"pa")).as("cell"))
        val probeArr = array((1 to Ivf.NCells).map(j =>
          struct((-element_at($"pa", j)).as("np"), lit(j.toLong).as("c"))): _*)
        val probes = p.filter($"vec_id" < Ivf.NQueries)
          .select($"vec_id".as("qid"), $"embedding".as("qv"),
            slice(array_sort(probeArr), 1, Ivf.NProbe).as("pr"))
          .select($"qid", $"qv", explode($"pr").as("pc"))
          .select($"qid", $"qv", $"pc.c".as("cell"))
        val w = Window.partitionBy($"qid").orderBy(round($"cos", 6).desc, $"nid")
        probes.join(assigned.select($"vec_id".as("nid"), $"nv", $"cell"), Seq("cell"))
          .filter($"qid" =!= $"nid")
          .select($"qid", $"nid", VectorOps.cosine($"qv", $"nv").as("cos"))
          .withColumn("rank", row_number().over(w))
          .filter($"rank" <= 5)
          .select($"qid", $"nid", $"rank", round($"cos", 4).as("cos"))
          .orderBy($"qid", $"rank")
      },
      Some(Ivf.oracle)),

    // ---- q91: semantic dedup (SemDeDup: cells → in-cell cosine → clusters) -
    // 4 sign bits → 16 cells; τ = 0.40 (the q48 threshold, so the planted
    // near-dup structure is exercised). Like q50/q63, the cell planes are
    // literals rendered into BOTH plans — the oracle replays cell
    // assignment, in-cell pair detection, and the connected-components
    // fixpoint (recursive CTE), so the approximate pipeline is
    // value-checked end to end, kept/dropped decisions included.
    QueryDef(
      "q91_semantic_dedup",
      (s, d) => semanticDedup(Tables.embeddings(s, d), SemDedup.signs, tau = 0.40)
        .orderBy(col("vec_id")),
      Some(SemDedup.oracle)),

    // ---- q92: per-label embedding centroids (positional mean-pool) ---------
    // The shuffle carries (label, pos) partial sums — never vectors; means
    // round to 6 (noise-dominated aggregate, cross-engine summation order).
    // Gate output is scalar-only (the driver's pandas sorter crashes on
    // array cells): the DOUBLE[] centroid is exploded to one (label, pos,
    // m) row per dimension — no float stringification, exact doubles on
    // both sides. labelCentroids itself keeps the assembled-array API.
    QueryDef(
      "q92_label_centroids",
      (s, d) => labelCentroids(Tables.embeddings(s, d))
        .select(col("label"), col("n_vectors"),
          posexplode(col("centroid")).as(Seq("pos", "m")))
        .withColumn("pos", col("pos").cast("long"))
        .orderBy(col("label"), col("pos")),
      Some("""WITH e AS (
             |  SELECT label,
             |    unnest([{'pos': i, 'x': CAST(embedding[i] AS DOUBLE)}
             |            for i in range(1, len(embedding) + 1)]) AS s
             |  FROM embeddings),
             |g AS (
             |  SELECT label, s.pos AS pos, round(avg(s.x), 6) AS m, count(*) AS cnt
             |  FROM e GROUP BY 1, 2),
             |n AS (SELECT label, max(cnt) AS n_vectors FROM g GROUP BY label)
             |SELECT g.label AS label, n.n_vectors AS n_vectors,
             |  CAST(g.pos - 1 AS BIGINT) AS pos, g.m AS m
             |FROM g JOIN n ON n.label = g.label
             |ORDER BY label, pos""".stripMargin)),

    // ---- q93: distance-to-centroid outliers (mislabeled-embedding audit) ---
    // d2 ranks on the floor-quantized value with vec_id tiebreak; both
    // engines fold the zipped difference squares left-to-right over
    // identical (6-decimal) centroid doubles, so the quantized distances
    // are bit-equal.
    QueryDef(
      "q93_centroid_outliers",
      (s, d) => centroidOutliers(Tables.embeddings(s, d), topK = 5)
        .orderBy(col("label"), col("rk")),
      Some("""WITH e AS (
             |  SELECT label,
             |    unnest([{'pos': i, 'x': CAST(embedding[i] AS DOUBLE)}
             |            for i in range(1, len(embedding) + 1)]) AS s
             |  FROM embeddings),
             |g AS (
             |  SELECT label, s.pos AS pos, round(avg(s.x), 6) AS m
             |  FROM e GROUP BY 1, 2),
             |c AS (SELECT label, list(m ORDER BY pos) AS centroid FROM g GROUP BY label),
             |d AS (
             |  SELECT em.label, em.vec_id,
             |    floor(list_sum(list_transform(
             |        list_zip(list_transform(em.embedding, x -> CAST(x AS DOUBLE)), c.centroid),
             |        t -> (t[1] - t[2]) * (t[1] - t[2]))) * 1e6 + 0.5) / 1e6 AS d2
             |  FROM embeddings em JOIN c ON c.label = em.label),
             |r AS (
             |  SELECT label, vec_id, d2,
             |    row_number() OVER (PARTITION BY label ORDER BY d2 DESC, vec_id) AS rk
             |  FROM d)
             |SELECT label, vec_id, d2, rk FROM r WHERE rk <= 5
             |ORDER BY label, rk""".stripMargin)),

    // ---- q105: declarative Lloyd k-means (oracle-checked end to end) -------
    // k=4, 2 update rounds + final assignment; the oracle's generated CTE
    // chain replays init, every distance, every argmin, and every rounded
    // centroid — then both engines report identical per-cluster sizes and
    // inertia (round(sum,3): noise-dominated cross-row aggregate).
    QueryDef(
      "q105_kmeans_lloyd",
      (s, d) => kmeansLloyd(Tables.embeddings(s, d), k = Km.K, iters = Km.Iters)
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"), round(sum(col("d2")), 3).as("inertia"))
        .orderBy(col("cluster")),
      Some(Km.oracle)),

    // ---- q99: JL random projection (pre-ANN dimensionality reduction) -----
    // 64 → 8 dims through literal ±1 planes; the oracle renders the SAME
    // sign arrays and scale literal into SQL (single source of truth), so
    // both engines walk an identical IEEE dag per output coordinate.
    QueryDef(
      "q99_random_projection",
      (s, d) => randomProject(Tables.embeddings(s, d), RandProj.signs)
        .orderBy(col("vec_id")),
      Some(RandProj.oracle)),

    // ---- q172: topic discovery (k-means + distinctive terms) --------------
    // q105's Lloyd assignment feeding q144's lift census per cluster; the
    // oracle chains Km's generated round CTEs into the token census.
    QueryDef(
      "q172_topic_terms",
      (s, d) => topicTerms(Tables.documents(s, d), Tables.embeddings(s, d),
        k = Km.K, iters = Km.Iters, topK = Topics.TopK, minCount = Topics.MinCount),
      Some(Topics.oracle),
      headline = true),

    // ---- q173: embedding-health audit --------------------------------------
    // Null/zero/dimension census + exact p50/p90 of the 1e-6-grid squared
    // norm; the oracle replays the fold, the grid, and the k-th-smallest
    // selections.
    QueryDef(
      "q173_embedding_health",
      (s, d) => embeddingHealth(Tables.embeddings(s, d)),
      Some("""WITH v AS MATERIALIZED (
             |  SELECT CAST(floor(list_sum(list_transform(embedding,
             |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) * 1e6 + 0.5)
             |      AS BIGINT) AS iv,
             |    len(embedding) AS dim
             |  FROM embeddings WHERE embedding IS NOT NULL),
             |r AS (SELECT iv, row_number() OVER (ORDER BY iv) AS rk,
             |        count(*) OVER () AS cnt FROM v),
             |p50 AS (SELECT min(iv) AS v FROM r
             |  WHERE rk = CAST(ceil(CAST(0.5 AS DOUBLE) * cnt) AS BIGINT)),
             |p90 AS (SELECT min(iv) AS v FROM r
             |  WHERE rk = CAST(ceil(CAST(0.9 AS DOUBLE) * cnt) AS BIGINT)),
             |nn AS (SELECT count(*) AS n_null FROM embeddings
             |  WHERE embedding IS NULL)
             |SELECT CAST(count(*) AS BIGINT) AS n_vectors,
             |  CAST(sum(CASE WHEN iv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
             |  CAST(min(dim) AS BIGINT) AS dim_min,
             |  CAST(max(dim) AS BIGINT) AS dim_max,
             |  CAST(nn.n_null AS BIGINT) AS n_null,
             |  CAST(p50.v AS BIGINT) AS p50_n2_micro,
             |  CAST(p90.v AS BIGINT) AS p90_n2_micro
             |FROM v, nn, p50, p90
             |GROUP BY nn.n_null, p50.v, p90.v""".stripMargin)),
  )

  /** Shared constants + generated DuckDB oracle for q105: the CTE chain is
    * produced by the same (k, iters) parameters the Scala loop unrolls
    * with — one source of truth for how many rounds both engines walk. */
  private[graft] object Km {
    val K = 4
    val Iters = 2

    /** WITH-body through the final assignment CTE `aa$Iters` — the single
      * source of truth for the replayed Lloyd rounds, shared by q105's
      * oracle and q172's topic oracle (which chains a token census onto
      * the same assignment). */
    val assignBody: String = {
      def dist(c: String): String =
        s"floor(list_sum(list_transform(list_zip(e.v, $c.c), " +
          s"t -> (t[1] - t[2]) * (t[1] - t[2]))) * 1e6 + 0.5) / 1e6"
      // dd/aa prefixes keep CTE names clear of the d2 COLUMN name
      def assignStep(i: Int): String =
        s"""dd$i AS (
           |  SELECT e.vec_id, c$i.cluster, ${dist(s"c$i")} AS d2
           |  FROM e, c$i),
           |aa$i AS (
           |  SELECT vec_id, cluster, d2 FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rk
           |    FROM dd$i) WHERE rk = 1)"""
      def updateStep(i: Int): String =
        s"""g${i + 1} AS (
           |  SELECT aa$i.cluster, s.pos AS pos, round(avg(s.x), 6) AS m
           |  FROM aa$i JOIN ep ON ep.vec_id = aa$i.vec_id GROUP BY 1, 2),
           |c${i + 1} AS (SELECT cluster, list(m ORDER BY pos) AS c FROM g${i + 1} GROUP BY cluster)"""
      val chain = (0 until Iters)
        .map(i => assignStep(i) + ",\n" + updateStep(i)).mkString(",\n")
      s"""e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |ep AS (
         |  SELECT vec_id,
         |    unnest([{'pos': i, 'x': v[i]} for i in range(1, len(v) + 1)]) AS s
         |  FROM e),
         |c0 AS (SELECT vec_id AS cluster, v AS c FROM e WHERE vec_id < $K),
         |$chain,
         |${assignStep(Iters)}""".stripMargin
    }

    val oracle: String =
      s"""WITH $assignBody
         |SELECT cluster, count(*) AS n, round(sum(d2), 3) AS inertia
         |FROM aa$Iters GROUP BY cluster ORDER BY cluster""".stripMargin
  }

  /** Generated DuckDB oracle for q172: [[Km.assignBody]]'s Lloyd rounds
    * chained into q144's census/lift/rank spelling, with the cluster
    * label standing in for the source. */
  private[graft] object Topics {
    val TopK = 5
    val MinCount = 20

    val oracle: String =
      s"""WITH ${Km.assignBody},
         |asg AS (SELECT vec_id AS doc_id, CAST(cluster AS VARCHAR) AS cl
         |        FROM aa${Km.Iters}),
         |cst AS (
         |  SELECT a.cl, unnest(string_split(d.text, ' ')) AS tok
         |  FROM documents d JOIN asg a ON a.doc_id = d.doc_id),
         |c AS (SELECT cl, tok, count(*) AS c_st FROM cst GROUP BY 1, 2),
         |ct AS (SELECT tok, CAST(sum(c_st) AS BIGINT) AS c_t FROM c GROUP BY 1),
         |ns AS (SELECT cl, CAST(sum(c_st) AS BIGINT) AS n_s FROM c GROUP BY 1),
         |tot AS (SELECT CAST(sum(c_st) AS BIGINT) AS n_tot FROM c),
         |l AS (
         |  SELECT c.cl, c.tok, c.c_st,
         |    floor((CAST(c.c_st AS DOUBLE) * CAST(tot.n_tot AS DOUBLE))
         |          / (CAST(ct.c_t AS DOUBLE) * CAST(ns.n_s AS DOUBLE))
         |          * 1e6 + 0.5) / 1e6 AS lift
         |  FROM c
         |  JOIN ct ON ct.tok = c.tok AND ct.c_t >= $MinCount
         |  JOIN ns ON ns.cl = c.cl
         |  CROSS JOIN tot),
         |r AS (
         |  SELECT cl, tok, c_st, lift,
         |    row_number() OVER (PARTITION BY cl
         |                       ORDER BY lift DESC, tok) AS rank
         |  FROM l)
         |SELECT cl AS cluster, CAST(rank AS BIGINT) AS rank, tok,
         |  CAST(c_st AS BIGINT) AS c_st, lift
         |FROM r WHERE rank <= $TopK ORDER BY cluster, rank""".stripMargin
  }

  /** Shared constants + generated DuckDB oracle for q146 — [[Km]] scheme;
    * the λ literals are emitted from the SAME Scala doubles the plan uses
    * (`1.0 - lambda` is 0.30000000000000004, not decimal 0.3 — the
    * CLAUDE.md decimal-literal rule). */
  private[graft] object Mmr {
    val NQ = 3
    val Pool = 20
    val K = 5
    val Lambda = 0.7
    private val lamLit = s"CAST($Lambda AS DOUBLE)"
    private val invLit = s"CAST(${1.0 - Lambda} AS DOUBLE)"

    val oracle: String = {
      val cos = "list_sum(list_transform(list_zip(%s, %s), t -> t[1] * t[2]))" +
        " / nullif(sqrt(list_sum(list_transform(%s, x -> x * x)))" +
        " * sqrt(list_sum(list_transform(%s, x -> x * x))), 0.0)"
      def q6(x: String) = s"floor(($x) * 1e6 + 0.5) / 1e6"
      def step(t: Int): String =
        s"""rem$t AS (
           |  SELECT c.* FROM cand c
           |  WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} s
           |                    WHERE s.qid = c.qid AND s.nid = c.nid)),
           |mx$t AS (
           |  SELECT p.qid, p.a_nid AS nid, max(p.sim) AS ms
           |  FROM ps p JOIN sel${t - 1} s ON s.qid = p.qid AND s.nid = p.b_nid
           |  GROUP BY 1, 2),
           |sc$t AS (
           |  SELECT r.qid, r.nid,
           |    ${q6(s"$lamLit * r.rel - $invLit * coalesce(m.ms, CAST(0.0 AS DOUBLE))")} AS score
           |  FROM rem$t r LEFT JOIN mx$t m ON m.qid = r.qid AND m.nid = r.nid),
           |sel$t AS MATERIALIZED (
           |  SELECT * FROM sel${t - 1}
           |  UNION ALL
           |  SELECT qid, nid, $t AS step, score FROM (
           |    SELECT *, row_number() OVER (PARTITION BY qid
           |      ORDER BY score DESC, nid) AS rk FROM sc$t) WHERE rk = 1)"""
      val chain = (2 to K).map(step).mkString(",\n")
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |c0 AS (
         |  SELECT q.vec_id AS qid, n.vec_id AS nid, n.v AS nv,
         |    ${q6(cos.format("q.v", "n.v", "q.v", "n.v"))} AS rel
         |  FROM e q JOIN e n ON q.vec_id < $NQ AND n.vec_id != q.vec_id),
         |cand AS MATERIALIZED (
         |  SELECT qid, nid, nv, rel FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid
         |      ORDER BY rel DESC, nid) AS rk FROM c0) WHERE rk <= $Pool),
         |ps AS MATERIALIZED (
         |  SELECT a.qid, a.nid AS a_nid, b.nid AS b_nid,
         |    ${q6(cos.format("a.nv", "b.nv", "a.nv", "b.nv"))} AS sim
         |  FROM cand a JOIN cand b ON a.qid = b.qid AND a.nid != b.nid),
         |sel1 AS MATERIALIZED (
         |  SELECT qid, nid, 1 AS step, rel AS score FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid
         |      ORDER BY rel DESC, nid) AS rk FROM cand) WHERE rk = 1),
         |$chain
         |SELECT qid, nid, CAST(step AS INTEGER) AS step, score
         |FROM sel$K ORDER BY qid, step""".stripMargin
    }
  }

  /** Shared constants + generated DuckDB oracle for q145 — the [[Km]]
    * scheme: the CTE chain is produced by the same `Iters` the Scala loop
    * unrolls with, so both engines walk identical rounded rounds.
    *
    * DuckDB 1.0 INLINES every CTE reference (no auto-materialization), so
    * an iterate that consumes its predecessor twice re-evaluates the whole
    * prefix per reference — 2^iters plan blowup, the SQL twin of the
    * lineage hazard [[graft.core.Lineage]] cuts on the Spark side. Two
    * rules keep the chain linear: every round CTE is AS MATERIALIZED, and
    * the L2 normalization reads its input ONCE via `sum(u*u) OVER ()`
    * instead of a scalar subquery (same value — summation-order noise is
    * absorbed by the per-round round(…, 6)). */
  private[graft] object Pca {
    val Iters = 8

    /** Base CTE text shared by q145's and q162's oracles: embeddings →
      * centered positions → the rounded covariance census named
      * `covName`. */
    private[graft] def baseCtes(covName: String): String =
      s"""e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |xp AS (
         |  SELECT vec_id,
         |    unnest([{'pos': i - 1, 'x': v[i]} for i in range(1, len(v) + 1)]) AS s
         |  FROM e),
         |x2 AS (SELECT vec_id, s.pos AS pos, s.x AS x FROM xp),
         |m AS (SELECT pos, round(avg(x), 6) AS m FROM x2 GROUP BY 1),
         |cn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM e),
         |cx AS (SELECT x2.vec_id, x2.pos, x2.x - m.m AS xc FROM x2 JOIN m USING (pos)),
         |$covName AS MATERIALIZED (
         |  SELECT a.pos AS i, b.pos AS j,
         |    round(sum(a.xc * b.xc) / (SELECT n FROM cn), 6) AS c
         |  FROM cx a JOIN cx b ON a.vec_id = b.vec_id GROUP BY 1, 2)""".stripMargin

    /** One power round against `cov`, names prefixed so multiple chains
      * (q162's per-component chains) can coexist in one WITH. */
    private[graft] def roundCtes(cov: String, p: String, k: Int): String =
      s"""${p}u$k AS MATERIALIZED (
         |  SELECT $cov.i AS pos, sum($cov.c * ${p}v$k.w) AS u
         |  FROM $cov JOIN ${p}v$k ON ${p}v$k.pos = $cov.j GROUP BY 1),
         |${p}v${k + 1} AS MATERIALIZED (
         |  SELECT pos, round(u / sqrt(sum(u * u) OVER ()), 6) AS w FROM ${p}u$k)"""

    val oracle: String = {
      val chain = (0 until Iters).map(roundCtes("cov", "p", _)).mkString(",\n")
      s"""WITH ${baseCtes("cov")},
         |pv0 AS (SELECT pos, CAST(0.125 AS DOUBLE) AS w FROM m),
         |$chain,
         |lam AS (
         |  SELECT round(sum(cov.c * vi.w * vj.w), 6) AS eigval
         |  FROM cov JOIN pv$Iters vi ON vi.pos = cov.i
         |  JOIN pv$Iters vj ON vj.pos = cov.j),
         |tr AS (SELECT sum(c) AS tr FROM cov WHERE i = j)
         |SELECT pos, w AS loading, eigval, round(eigval / tr, 6) AS var_ratio
         |FROM pv$Iters, lam, tr ORDER BY pos""".stripMargin
    }
  }

  /** Generated oracle for q162 — [[Pca]]'s scheme with Hotelling
    * deflation between components: each component's chain runs against
    * the previous DEFLATED census, and every census/iterate is
    * MATERIALIZED + rounded so both engines walk identical matrices. */
  private[graft] object PcaK {
    val K = 3
    val Iters = 6

    val oracle: String = {
      val comps = (1 to K).map { c =>
        val cov = s"cov${c - 1}"
        val p = s"c$c"
        val chain = (0 until Iters).map(Pca.roundCtes(cov, p, _)).mkString(",\n")
        val vN = s"${p}v$Iters"
        s"""${p}v0 AS (SELECT i AS pos, CAST(0.125 AS DOUBLE) AS w FROM $cov WHERE i = j),
           |$chain,
           |lam$c AS MATERIALIZED (
           |  SELECT round(sum($cov.c * vi.w * vj.w), 6) AS eigval
           |  FROM $cov JOIN $vN vi ON vi.pos = $cov.i
           |  JOIN $vN vj ON vj.pos = $cov.j),
           |cov$c AS MATERIALIZED (
           |  SELECT cv.i, cv.j,
           |    round(cv.c - (SELECT eigval FROM lam$c) * vi.w * vj.w, 6) AS c
           |  FROM $cov cv JOIN $vN vi ON vi.pos = cv.i
           |  JOIN $vN vj ON vj.pos = cv.j),
           |out$c AS (
           |  SELECT $c AS component, pos, w AS loading,
           |    (SELECT eigval FROM lam$c) AS eigval,
           |    round((SELECT eigval FROM lam$c) / (SELECT tr FROM tr0), 6) AS var_ratio
           |  FROM $vN)""".stripMargin
      }.mkString(",\n")
      val union = (1 to K).map(c => s"SELECT * FROM out$c").mkString("\nUNION ALL\n")
      s"""WITH ${Pca.baseCtes("cov0")},
         |tr0 AS (SELECT sum(c) AS tr FROM cov0 WHERE i = j),
         |$comps
         |SELECT component, pos, loading, eigval, var_ratio FROM (
         |$union)
         |ORDER BY component, pos""".stripMargin
    }
  }

  /** Shared constants + DuckDB oracle for q99 (same scheme as [[Lsh]]). */
  private[graft] object RandProj {
    val OutDim = 8
    val signs: Array[Array[Double]] = VectorOps.rademacherSigns(OutDim, 64, seed = 99)
    private val scaleLit: String = (1.0 / math.sqrt(OutDim.toDouble)).toString

    private def sqlList(row: Array[Double]): String =
      row.map(x => if (x > 0) "1" else "-1").mkString("[", ",", "]") + "::DOUBLE[]"

    val oracle: String = {
      val cols = signs.zipWithIndex.map { case (row, j) =>
        s"floor(list_sum(list_transform(list_zip(v, ${sqlList(row)}), t -> t[1]*t[2]))" +
          s" * $scaleLit * 1e6 + 0.5) / 1e6 AS p$j"
      }.mkString(",\n  ")
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings)
         |SELECT vec_id,
         |  $cols
         |FROM e ORDER BY vec_id""".stripMargin
    }
  }

  /** Shared constants + DuckDB oracle for q91 (same single-source-of-truth
    * scheme as [[Lsh]]/[[Ivf]]). */
  private[graft] object SemDedup {
    val NBits = 4
    val signs: Array[Array[Double]] = VectorOps.rademacherSigns(NBits, 64, seed = 91)

    private def sqlList(row: Array[Double]): String =
      row.map(x => if (x > 0) "1" else "-1").mkString("[", ",", "]") + "::DOUBLE[]"

    private def projSql(row: Array[Double]): String =
      s"list_sum(list_transform(list_zip(v, ${sqlList(row)}), t -> t[1]*t[2]))"

    val oracle: String = {
      val bucket = signs.zipWithIndex.map { case (row, p) =>
        s"${1L << p}*(CASE WHEN ${projSql(row)} >= 0 THEN 1 ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH RECURSIVE e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |bk AS (
         |  SELECT vec_id, v, CAST($bucket AS BIGINT) AS cell FROM e),
         |pairs AS (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
         |  FROM bk a JOIN bk b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE round(
         |    list_sum(list_transform(list_zip(a.v, b.v), t -> t[1] * t[2]))
         |      / nullif(sqrt(list_sum(list_transform(a.v, x -> x * x)))
         |             * sqrt(list_sum(list_transform(b.v, x -> x * x))), 0.0), 6) > 0.40),
         |ed AS (SELECT a_id AS u, b_id AS v FROM pairs
         |       UNION ALL SELECT b_id, a_id FROM pairs),
         |reach(src, node) AS (
         |  SELECT u, u FROM ed
         |  UNION
         |  SELECT r.src, ed.v FROM reach r JOIN ed ON ed.u = r.node),
         |lab AS (SELECT src AS vec_id, min(node) AS rep FROM reach GROUP BY src)
         |SELECT em.vec_id,
         |  coalesce(l.rep, em.vec_id) AS rep_id,
         |  CAST(coalesce(l.rep, em.vec_id) = em.vec_id AS INT) AS kept
         |FROM embeddings em LEFT JOIN lab l ON l.vec_id = em.vec_id
         |ORDER BY em.vec_id""".stripMargin
    }
  }

  /** Shared constants + DuckDB oracle text for q50. The sign literals are
    * rendered into the SQL from the same arrays the Spark plan uses —
    * single source of truth, so the two engines cannot drift. */
  private[graft] object Lsh {
    val NBits = 8
    val ProbeCap = 2000
    val signs: Array[Array[Double]] = VectorOps.rademacherSigns(NBits, 64, seed = 50)

    private def sqlList(row: Array[Double]): String =
      row.map(x => if (x > 0) "1" else "-1").mkString("[", ",", "]") + "::DOUBLE[]"

    private def projSql(row: Array[Double]): String =
      s"list_sum(list_transform(list_zip(v, ${sqlList(row)}), t -> t[1]*t[2]))"

    val oracle: String = {
      val bucket = signs.zipWithIndex.map { case (row, p) =>
        s"${1L << p}*(CASE WHEN ${projSql(row)} >= 0 THEN 1 ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |bk AS (
         |  SELECT vec_id, v, CAST($bucket AS BIGINT) AS bucket FROM e),
         |p AS (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |    list_sum(list_transform(list_zip(a.v, b.v), t -> t[1] * t[2]))
         |      / nullif(sqrt(list_sum(list_transform(a.v, x -> x * x)))
         |             * sqrt(list_sum(list_transform(b.v, x -> x * x))), 0.0) AS cos
         |  FROM bk a JOIN bk b
         |    ON a.vec_id < $ProbeCap AND a.vec_id < b.vec_id
         |   AND bit_count(xor(a.bucket, b.bucket)) <= 1)
         |SELECT a_id, b_id, round(cos, 4) AS cos
         |FROM p WHERE round(cos, 6) > 0.40
         |ORDER BY a_id, b_id""".stripMargin
    }
  }

  /** Shared constants + DuckDB oracle text for q63 (same single-source-of-
    * truth scheme as [[Lsh]]). */
  private[graft] object Ivf {
    val NCells = 16
    val NProbe = 4
    val NQueries = 50
    val dirs: Array[Array[Double]] = VectorOps.rademacherSigns(NCells, 64, seed = 63)

    private def sqlList(row: Array[Double]): String =
      row.map(x => if (x > 0) "1" else "-1").mkString("[", ",", "]") + "::DOUBLE[]"

    val oracle: String = {
      val projs = dirs.map(row =>
        s"round(list_sum(list_transform(list_zip(v, ${sqlList(row)}), t -> t[1]*t[2])), 6)")
        .mkString("[", ",\n      ", "]")
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |pp AS (
         |  SELECT vec_id, v, $projs AS pa FROM e),
         |a AS (
         |  SELECT vec_id, v, list_position(pa, list_max(pa)) AS cell FROM pp),
         |q AS (
         |  SELECT vec_id AS qid, v AS qv,
         |    list_transform(list_slice(list_sort([{'np': -pa[j], 'c': j} for j in range(1, ${NCells + 1})]), 1, $NProbe), s -> s.c) AS pc
         |  FROM pp WHERE vec_id < $NQueries),
         |c AS (
         |  SELECT q.qid, a.vec_id AS nid,
         |    list_sum(list_transform(list_zip(q.qv, a.v), t -> t[1] * t[2]))
         |      / nullif(sqrt(list_sum(list_transform(q.qv, x -> x * x)))
         |             * sqrt(list_sum(list_transform(a.v, x -> x * x))), 0.0) AS cos
         |  FROM q JOIN a ON list_contains(q.pc, a.cell) AND a.vec_id != q.qid),
         |r AS (
         |  SELECT qid, nid, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY round(cos, 6) DESC, nid) AS rank
         |  FROM c)
         |SELECT qid, nid, rank, round(cos, 4) AS cos
         |FROM r WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
    }
  }
}
