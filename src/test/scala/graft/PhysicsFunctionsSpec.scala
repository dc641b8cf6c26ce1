package graft

import org.apache.spark.sql.functions._
import graft.functions.PhysicsFunctions._

class PhysicsFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.cast("double").as("v")).head().getDouble(0)

  test("deltaPhi wraps to (-pi, pi]") {
    // phi1=3.1, phi2=-3.1 → naive diff 6.2, wrapped ≈ -0.0832 (2π−6.2 negated)
    val wrapped = eval1(deltaPhi(lit(3.1), lit(-3.1)))
    assert(math.abs(wrapped - (6.2 - 2 * math.Pi)) < 1e-9)
    assert(math.abs(eval1(deltaPhi(lit(0.5), lit(0.2))) - 0.3) < 1e-9)
  }

  test("deltaR on wrap-around pair is small, naive would be large") {
    val dr = eval1(deltaR(lit(1.0), lit(3.14), lit(1.0), lit(-3.14)))
    assert(dr < 0.01, s"wrap-around dR should be tiny, got $dr")
  }

  test("invariant mass closure: back-to-back massless partons") {
    // Two massless particles, pt=50, eta=0, phi=0 vs phi=pi:
    // E=50 each, p cancels → m = 100.
    val m = eval1(invariantMass(
      lit(50.0), lit(0.0), lit(0.0), lit(0.0),
      lit(50.0), lit(0.0), lit(math.Pi), lit(0.0)))
    assert(math.abs(m - 100.0) < 1e-6)
  }

  test("invariant mass matches massless-limit formula on a generic pair") {
    // m² ≈ 2·pt1·pt2·(cosh Δη − cos Δφ) for massless inputs
    val (pt1, eta1, phi1) = (40.0, 0.5, 1.0)
    val (pt2, eta2, phi2) = (60.0, -1.2, 2.5)
    val m = eval1(invariantMass(
      lit(pt1), lit(eta1), lit(phi1), lit(0.0),
      lit(pt2), lit(eta2), lit(phi2), lit(0.0)))
    val expected = math.sqrt(2 * pt1 * pt2 * (math.cosh(eta1 - eta2) - math.cos(phi1 - phi2)))
    assert(math.abs(m - expected) < 1e-6, s"got $m expected $expected")
  }

  test("collinear massless pair has zero invariant mass") {
    val m = eval1(invariantMass(
      lit(30.0), lit(1.0), lit(0.7), lit(0.0),
      lit(70.0), lit(1.0), lit(0.7), lit(0.0)))
    assert(math.abs(m) < 1e-4)
  }

  test("inRange is exclusive on both edges (reference op.in_range)") {
    assert(eval1(inRange(76, lit(90.0), 106).cast("int")) == 1.0)
    assert(eval1(inRange(76, lit(76.0), 106).cast("int")) == 0.0)
    assert(eval1(inRange(76, lit(106.0), 106).cast("int")) == 0.0)
  }

  test("working-point bitmask: bit 2 = medium") {
    assert(eval1(passWorkingPoint(lit(7), 2).cast("int")) == 1.0) // 0b111
    assert(eval1(passWorkingPoint(lit(4), 2).cast("int")) == 1.0) // 0b100
    assert(eval1(passWorkingPoint(lit(3), 2).cast("int")) == 0.0) // 0b011
    assert(eval1(passWorkingPoint(lit(0), 2).cast("int")) == 0.0)
  }
}
