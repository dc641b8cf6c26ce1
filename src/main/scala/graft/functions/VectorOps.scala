package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector algebra over `array<float>` columns — pure higher-order
  * Column compositions (codegen'd, row-local, shuffle-free).
  *
  * Float elements are widened to double BEFORE any arithmetic and folded
  * left-to-right, making results reproducible across engines — required for
  * the DuckDB correctness gate and for deterministic re-runs at scale.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Σ aᵢ² in double precision. */
  def norm2(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  def norm(a: Column): Column = sqrt(norm2(a))

  /** Cosine similarity — the native fused-loop Catalyst expression
    * ([[graft.expressions.CosineSimExpr]]): one codegen'd loop, three
    * scalar accumulators, no intermediate arrays. Null-safe for zero
    * vectors / null elements / length mismatch (null, never NaN) —
    * bit-identical to [[cosineHof]], which `CosineSimSpec` pins. */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.CosineSimExpr.cosine(a, b)

  /** The HOF composition twin of [[cosine]] (three lambda walks + an
    * allocated product array per pair) — kept as the cross-check
    * reference for the native expression. */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** Squared L2 distance — native fused loop
    * ([[graft.expressions.L2SqExpr]]); bit-identical to [[l2sqHof]],
    * which the spec pins. */
  def l2sq(a: Column, b: Column): Column =
    graft.expressions.L2SqExpr.l2sq(a, b)

  /** The HOF composition twin of [[l2sq]] (allocated difference array +
    * interpreted folds) — kept as the cross-check reference for the
    * native expression. */
  def l2sqHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") - y.cast("double")),
      lit(0.0), (acc, x) => acc + x * x)

  /** Literal ±1 Rademacher planes from a fixed seed (java.util.Random LCG —
    * stable across JVMs by spec). Because the signs are plan literals, the
    * SAME numbers can be embedded in an external engine's SQL, making every
    * bucketing decision bit-reproducible cross-engine — this is what lets
    * the q50/q63 gate oracles replay the full ANN pipeline in DuckDB. */
  def rademacherSigns(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val r = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(if (r.nextBoolean()) 1.0 else -1.0)
  }

  /** Signed projection Σ vᵢ·sᵢ onto one literal ±1 plane, in double. */
  def literalProj(v: Column, signs: Array[Double]): Column =
    aggregate(
      zip_with(v, typedlit(signs.toSeq), (x, s) => x.cast("double") * s),
      lit(0.0), (acc, x) => acc + x)

  /** LSH bucket id from literal planes: bit p = sign of projection p.
    * Same planes → same buckets on any engine (see rademacherSigns).
    * Native codegen ([[graft.expressions.LiteralSignatureExpr]], r13): the
    * HOF spelling below is CodegenFallback and runs at SCAN cardinality on
    * the index-build/stream-bucketing paths — measured ~300 µs/row
    * interpreted (a 4.25M-vector index write sat in ZipWith.eval for 20+
    * minutes) vs fused multiply-adds in whole-stage codegen. Bit-equal by
    * construction (same element widening, same left-to-right fold, same
    * null/length poisoning to bucket 0) — VectorOpsSpec pins it. */
  def literalSignature(v: Column, signs: Array[Array[Double]]): Column =
    graft.expressions.LiteralSignatureExpr.signature(v, signs)

  /** The interpreted HOF spelling of [[literalSignature]] — kept as the
    * cross-check reference for the native expression (spec-pinned equal). */
  def literalSignatureHof(v: Column, signs: Array[Array[Double]]): Column =
    signs.zipWithIndex.map { case (s, p) =>
      when(literalProj(v, s) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Random-hyperplane (SimHash-style) LSH signature: `nBits` sign bits of
    * projections onto deterministic Rademacher (±1) hyperplanes derived from
    * `hash(dimension, plane)` — no stored model, any executor recomputes the
    * same planes, so signatures are consistent across a 1000-node cluster.
    * Returns a BIGINT bucket id (nBits ≤ 63). Interpreted HOF spelling
    * (CodegenFallback) — the model-free alternative, spec-covered; every
    * production index/stream path buckets with [[literalSignature]]
    * (native codegen, r13) instead. */
  def hyperplaneSignature(v: Column, nBits: Int): Column = {
    require(nBits > 0 && nBits <= 63)
    val bits: Seq[Column] = (0 until nBits).map { p =>
      // projection_p = Σ_i v_i · sign(hash(i, p))
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - lit(1)),
          (x, i) => when(pmod(hash(i, lit(p)), lit(2)) === 0, x.cast("double"))
            .otherwise(-x.cast("double"))),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
