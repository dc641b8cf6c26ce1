package graft

import org.apache.spark.sql.functions._
import graft.functions.CollectionOps._
import graft.physics.{Event, Met, Particle, Jet}

class CollectionOpsSpec extends SparkSpec {
  import spark.implicits._

  private def p(pt: Double, eta: Double = 0, phi: Double = 0, charge: Int = 1,
                idpass: Int = 7, isopass: Int = 7) =
    Particle(pt.toFloat, eta.toFloat, phi.toFloat, 0.105f, charge, idpass, isopass)

  private val ev = Event(
    1L, 1.0,
    elec = Seq(p(80, eta = 0.1, phi = 0.0), p(25, eta = 2.8)),
    muon = Seq(p(60, eta = 0.1, phi = 0.05), p(30, eta = 1.0, phi = -2.0), p(15, eta = 0.5)),
    jetpuppi = Seq(
      Jet(120f, 0.1f, 0.02f, 10f, 7),   // near the 80-GeV electron AND 60-GeV muon (dR<0.3)
      Jet(90f, 1.0f, -2.02f, 10f, 0),   // near the 30-GeV muon
      Jet(45f, -1.5f, 2.0f, 10f, 7),    // isolated
      Jet(28f, 0.0f, 1.0f, 10f, 0)),    // isolated but below pt 30
    metpuppi = Seq(Met(55f, 0.3f)))

  private lazy val df = spark.createDataset(Seq(ev)).toDF()

  test("selectWhere chains compose (lazy views)") {
    val r = df.select(
      rngLen(selectWhere(selectWhere(col("muon"), m => m("pt") > 20), m => m("eta") < 0.5))
        .as("n")).head().getInt(0)
    assert(r == 1) // pt>20 keeps 60,30; eta<0.5 keeps the 60 GeV one
  }

  test("rngAny / rngAll quantifiers") {
    val row = df.select(
      rngAny(col("muon"), m => m("pt") > 50).as("any50"),
      rngAny(col("muon"), m => m("pt") > 100).as("any100"),
      rngAll(col("muon"), m => m("pt") > 10).as("all10")).head()
    assert(row.getBoolean(0) && !row.getBoolean(1) && row.getBoolean(2))
  }

  test("sortByDesc / topKBy / nth give pt-ordered access") {
    val row = df.select(
      nth(sortByDesc(col("muon"), "pt"), 0)("pt").as("lead"),
      nth(sortByDesc(col("muon"), "pt"), 1)("pt").as("sub"),
      rngLen(topKBy(col("muon"), "pt", 2)).as("k")).head()
    assert(row.getFloat(0) == 60f && row.getFloat(1) == 30f && row.getInt(2) == 2)
  }

  test("crossClean removes jets within dR<0.3 of leptons (nested-loop anti-join)") {
    val cleaned = df.select(
      crossClean(crossClean(col("jetpuppi"), col("elec"), 0.3), col("muon"), 0.3).as("c"))
      .select(rngLen(col("c")).as("n"), nth(col("c"), 0)("pt").as("lead"))
      .head()
    // jets 1 and 2 are within 0.3 of a lepton; 45 GeV and 28 GeV survive
    assert(cleaned.getInt(0) == 2)
    assert(cleaned.getFloat(1) == 45f)
  }

  test("crossClean respects phi wrap-around") {
    val ev2 = Event(2L, 1.0,
      elec = Seq(p(50, eta = 0.0, phi = 3.14)),
      muon = Seq(p(40, eta = 0.0, phi = -3.14)), // dR ≈ 0.0032 across the wrap
      jetpuppi = Nil, metpuppi = Seq(Met(0f, 0f)))
    val n = spark.createDataset(Seq(ev2)).toDF()
      .select(rngLen(crossClean(col("muon"), col("elec"), 0.3)).as("n")).head().getInt(0)
    assert(n == 0, "wrap-around pair must be cleaned")
  }
}
