package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}
import graft.expressions.EarlierBandCollisionExpr

/** The bucket-local tier's exactly-once predicate, unit-level. The
  * end-to-end contract (both verify tiers emit identical pair sets, capped
  * and uncapped) is pinned in DedupSpec; this spec pins the predicate's own
  * truth table — in WHOLE-STAGE CODEGEN, the path the Σ occ² join fan
  * actually runs — plus interpreted-eval parity and null semantics. */
class EarlierBandCollisionSpec extends SparkSpec {
  import spark.implicits._

  // (sigsA, okmA, sigsB, okmB, band) -> expected
  private val cases: Seq[((Seq[Long], Long, Seq[Long], Long, Int), Option[Boolean])] = Seq(
    // collision in band 0, both surviving, band 0 < 2 -> earlier
    ((Seq(1L, 2L, 3L, 4L), 15L, Seq(1L, 9L, 8L, 7L), 15L, 2), Some(true)),
    // same collision but band 0 SHED on one side -> not earlier (the pair
    // may meet again later; a shed bucket must never count)
    ((Seq(1L, 2L, 3L, 4L), 14L, Seq(1L, 9L, 8L, 7L), 15L, 2), Some(false)),
    ((Seq(1L, 2L, 3L, 4L), 15L, Seq(1L, 9L, 8L, 7L), 14L, 2), Some(false)),
    // collision exactly AT the current band -> strictly-before means no
    ((Seq(1L, 2L, 3L, 4L), 15L, Seq(9L, 9L, 3L, 7L), 15L, 2), Some(false)),
    // collision after the current band -> no
    ((Seq(1L, 2L, 3L, 4L), 15L, Seq(9L, 9L, 8L, 4L), 15L, 2), Some(false)),
    // band 0 has no earlier bands by construction
    ((Seq(1L, 2L, 3L, 4L), 15L, Seq(1L, 2L, 3L, 4L), 15L, 0), Some(false)),
    // collision in band 1 with band 0 differing -> earlier for band >= 2
    ((Seq(1L, 2L, 3L, 4L), 15L, Seq(9L, 2L, 8L, 7L), 15L, 3), Some(true)),
    // both sides shed EVERYTHING -> never earlier
    ((Seq(1L, 2L, 3L, 4L), 0L, Seq(1L, 2L, 3L, 4L), 0L, 4), Some(false)))

  test("codegen truth table (the join-fan path)") {
    val df = cases.map { case ((sa, ma, sb, mb, bd), _) =>
      (sa, ma, sb, mb, bd)
    }.toDF("sigsA", "okmA", "sigsB", "okmB", "band")
    val got = df.select(EarlierBandCollisionExpr.earlierCollision(
      $"sigsA", $"okmA", $"sigsB", $"okmB", $"band").as("r")).collect()
    cases.zip(got).foreach { case (((_, _, _, _, _), exp), row) =>
      assert(Option(row.get(0)).map(_.asInstanceOf[Boolean]) == exp)
    }
  }

  test("interpreted eval matches codegen on every case, and null inputs yield null") {
    def lit(a: Seq[Long]) =
      Literal.create(new GenericArrayData(a.toArray), ArrayType(LongType, false))
    cases.foreach { case ((sa, ma, sb, mb, bd), exp) =>
      val e = EarlierBandCollisionExpr(lit(sa), Literal(ma), lit(sb), Literal(mb), Literal(bd))
      assert(Option(e.eval(InternalRow.empty)).map(_.asInstanceOf[Boolean]) == exp)
    }
    val nullArr = Literal.create(null, ArrayType(LongType, false))
    val e = EarlierBandCollisionExpr(nullArr, Literal(15L),
      lit(Seq(1L, 2L)), Literal(15L), Literal(1))
    assert(e.eval(InternalRow.empty) == null)
  }

  test("type checking rejects wrong shapes at analysis time") {
    val bad = EarlierBandCollisionExpr(Literal(1L), Literal(15L),
      Literal(2L), Literal(15L), Literal(1))
    assert(!bad.checkInputDataTypes().isSuccess)
  }
}
