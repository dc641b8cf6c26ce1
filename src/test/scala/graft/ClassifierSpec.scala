package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Hashed-bigram linear classifier: hand-computed logits (independent JVM
  * md5 replay), degenerate documents, and the keep decision. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val w: Array[Double] = Array.tabulate(64)(i => (i - 32) / 256.0)
  private val bias = 0.0078125 // 2/256

  /** Independent spelling of the operator's bucket hash. */
  private def bucket(gram: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(gram.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 8), 16) % w.length).toInt
  }

  test("logit equals the hand-computed mean bucket weight plus bias") {
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "one two"),
      (3L, "alpha beta gamma alpha beta")).toDF("doc_id", "text")
    val got = TextAnalysis.linearQualityFilter(docs, w, bias, tau = 0.0)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getBoolean(3)))).toMap
    for ((id, text) <- Seq((1L, "the quick brown fox jumps"), (2L, "one two"),
        (3L, "alpha beta gamma alpha beta"))) {
      val toks = text.split(" ")
      val grams = toks.sliding(2).map(_.mkString(" ")).toSeq
      val sum = grams.foldLeft(0.0)((acc, g) => acc + w(bucket(g)))
      val expect = math.floor((bias + sum / grams.length) * 1e6 + 0.5) / 1e6
      val (n, logit, keep) = got(id)
      assert(n == grams.length, s"doc $id n_bigrams")
      assert(logit == expect, s"doc $id logit: $logit vs $expect")
      assert(keep == (logit > 0.0), s"doc $id keep")
    }
  }

  test("documents with fewer than two tokens score the quantized bias") {
    val docs = Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text")
    val rows = TextAnalysis.linearQualityFilter(docs, w, bias, tau = 0.0)
      .collect().map(r => (r.getInt(1), r.getDouble(2)))
    val qBias = math.floor(bias * 1e6 + 0.5) / 1e6
    assert(rows.forall { case (n, logit) => n == 0 && logit == qBias })
  }

  test("repeated bigrams carry multiplicity (not a distinct-feature bag)") {
    val docs = Seq((1L, "x y x y x y")).toDF("doc_id", "text")
    // bigrams: [x y, y x, x y, y x, x y] — "x y" counted 3×, "y x" 2×
    val logit = TextAnalysis.linearQualityFilter(docs, w, bias, tau = 0.0)
      .head().getDouble(2)
    val expect = math.floor(
      (bias + (3 * w(bucket("x y")) + 2 * w(bucket("y x"))) / 5.0) * 1e6 + 0.5) / 1e6
    assert(logit == expect)
  }

  test("tau moves the keep boundary") {
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val lo = TextAnalysis.linearQualityFilter(docs, w, bias, tau = -1e9)
      .head().getBoolean(3)
    val hi = TextAnalysis.linearQualityFilter(docs, w, bias, tau = 1e9)
      .head().getBoolean(3)
    assert(lo && !hi)
  }
}
