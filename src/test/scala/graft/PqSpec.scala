package graft

import org.apache.spark.sql.functions._
import graft.operators.Pq

/** Product quantization: codebook/code shape, planted-prototype
  * determinism, and ADC's defining identity (sum of per-subspace
  * distance-table lookups). */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // 4-dim vectors, m=2 subspaces of 2 dims, k=2 codes per subspace.
  // ids 0..1 are the init centroids (kmeansFit contract); ids 4..7 are
  // exact copies of the two prototypes, so Lloyd converges immediately
  // and every copy must share its prototype's codes.
  private val dim = 4
  private lazy val planted = Seq(
    (0L, Array(0.0f, 0.0f, 10.0f, 10.0f)),
    (1L, Array(10.0f, 10.0f, 0.0f, 0.0f)),
    (2L, Array(0.1f, -0.1f, 10.1f, 9.9f)),
    (3L, Array(9.9f, 10.1f, 0.1f, -0.1f)),
    (4L, Array(0.0f, 0.0f, 10.0f, 10.0f)),
    (5L, Array(10.0f, 10.0f, 0.0f, 0.0f)),
    (6L, Array(0.0f, 0.0f, 10.0f, 10.0f)),
    (7L, Array(10.0f, 10.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")

  test("codebook shape: m×k centroid rows, each of dim/m coordinates") {
    val cb = Pq.pqTrain(planted, m = 2, dim = dim, k = 2, iters = 2).collect()
    assert(cb.length == 4)
    assert(cb.map(r => (r.getInt(0), r.getLong(1))).toSet ==
      Set((0, 0L), (0, 1L), (1, 0L), (1, 1L)))
    assert(cb.forall(_.getSeq[Double](2).length == 2))
  }

  test("codes: m rows per vector in [0,k); identical vectors get identical codes") {
    val cb = Pq.pqTrain(planted, m = 2, dim = dim, k = 2, iters = 2)
    val codes = Pq.pqEncode(planted, cb, m = 2, dim = dim)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(codes.size == 8 * 2)
    assert(codes.values.forall(c => c >= 0 && c < 2))
    for (s <- 0 until 2; copy <- Seq(4L, 6L))
      assert(codes((copy, s)) == codes((0L, s)))
    for (s <- 0 until 2; copy <- Seq(5L, 7L))
      assert(codes((copy, s)) == codes((1L, s)))
    // the two planted blobs are separated per subspace → different codes
    for (s <- 0 until 2) assert(codes((0L, s)) != codes((1L, s)))
  }

  test("ADC distance is exactly the sum of per-subspace distance-table lookups") {
    val cb = Pq.pqTrain(planted, m = 2, dim = dim, k = 2, iters = 2)
    val codes = Pq.pqEncode(planted, cb, m = 2, dim = dim)
    val q = planted.filter($"vec_id" < 2)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val got = Pq.adcTopK(q, codes, cb, m = 2, dim = dim, topK = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap

    // independent recomputation from collected tables
    val cents = cb.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
    val codeMap = codes.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val vecs = planted.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    def dq(sv: Seq[Double], c: Seq[Double]): Double = {
      val d2 = sv.zip(c).foldLeft(0.0) { case (a, (x, y)) => a + (x - y) * (x - y) }
      math.floor(d2 * 1e6 + 0.5) / 1e6
    }
    for (((qid, nid), ad) <- got) {
      val expect = (0 until 2).map { s =>
        dq(vecs(qid).slice(s * 2, s * 2 + 2), cents((s, codeMap((nid, s)))))
      }.sum
      assert(math.floor(expect * 1e6 + 0.5) / 1e6 == ad, s"($qid,$nid)")
    }
    // a query's exact copy has ADC distance equal to the prototype's own
    // quantization error — identical for copies, and rank orders by it
    assert(got((0L, 4L)) == got((0L, 0L)))
    assert(got((1L, 5L)) == got((1L, 1L)))
  }

  test("ranking: ad nondecreasing with rank, ids break ties, topK bounds rows") {
    val e = core.Tables.embeddings(spark, sf0001)
    val cb = Pq.pqTrain(e, m = 2, dim = 64, k = 4, iters = 1)
    val codes = Pq.pqEncode(e, cb, m = 2, dim = 64)
    val q = e.filter($"vec_id" < 3).select($"vec_id".as("qid"), $"embedding".as("qv"))
    val rows = Pq.adcTopK(q, codes, cb, m = 2, dim = 64, topK = 5)
      .orderBy($"qid", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(rows.groupBy(_._1).forall(_._2.length == 5))
    for ((_, g) <- rows.groupBy(_._1)) {
      val sorted = g.sortBy(_._3)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 < b._4 || (a._4 == b._4 && a._2 < b._2)
        case _ => true
      })
    }
  }
}
