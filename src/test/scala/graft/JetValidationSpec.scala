package graft

import graft.physics.{EventGen, JetValidationAnalysis => JVA}

class JetValidationSpec extends SparkSpec {

  private lazy val events = EventGen.dataFrame(spark, 2000)
  private lazy val result = JVA.run(events)

  test("49-selection grid: all registered, monotone in multiplicity and pt") {
    val objs = JVA.withObjects(events)
    val (_, chain) = JVA.selections()
    assert(chain.size == 49) // noSel + 3 pt × 4 regions × 4 multiplicities
    val cf = graft.flow.CutFlowReport.report(objs, chain)
    val byName = cf.map(e => e.name -> e.n).toMap
    for (pt <- JVA.ptThresholds; (region, _) <- JVA.etaRegions; k <- 1 to 3)
      assert(byName(s"nJet${pt}_${region}_ge${k + 1}") <= byName(s"nJet${pt}_${region}_ge$k"),
        s"multiplicity monotonicity broken at $pt/$region/$k")
    for ((region, _) <- JVA.etaRegions; k <- 1 to 4) {
      assert(byName(s"nJet50_${region}_ge$k") <= byName(s"nJet30_${region}_ge$k"))
      assert(byName(s"nJet100_${region}_ge$k") <= byName(s"nJet50_${region}_ge$k"))
    }
  }

  test("eta regions partition the jets: barrel+mid+forward = all") {
    val objs = JVA.withObjects(events)
    val (_, chain) = JVA.selections()
    import org.apache.spark.sql.functions._
    val sums = objs.agg(
      sum(size(col("jets_30_all"))), sum(size(col("jets_30_0to1_5"))),
      sum(size(col("jets_30_1_5to3"))), sum(size(col("jets_30_3toInf")))).head()
    assert(sums.getLong(0) == sums.getLong(1) + sums.getLong(2) + sums.getLong(3),
      "eta regions must partition (reference's mid-eta tautology corrected)")
  }

  test("all 66 reference histograms fill in one pass") {
    val objs = JVA.withObjects(events)
    val (noSel, chain) = JVA.selections()
    val registered = JVA.plots(noSel, chain)
    assert(registered.size == 66, s"expected 66 plots, got ${registered.size}")
    val perPlot = result._1.groupBy("plot").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // deep grid cells (e.g. 4 forward jets >100 GeV) may legitimately be
    // empty on 2000 synthetic events; the broad ones must be populated
    assert(perPlot.getOrElse("nJets_jetPT_30GeV", 0L) > 0)
    assert(perPlot.getOrElse("Jet1_pT_jetPT_30GeV", 0L) > 0)
    assert(perPlot.getOrElse("MET_jetPT_30GeV", 0L) > 0)
    assert(perPlot.size >= 40, s"only ${perPlot.size} of 66 plots non-empty")
  }

  test("4-entry cutflow mirrors the reference report") {
    val cf = result._2
    assert(cf.map(_.name) == Seq("noSel", "nJet30_all_ge1", "nJet50_all_ge1", "nJet100_all_ge1"))
    assert(cf.head.n == 2000)
  }
}
