package graft.physics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.CollectionOps._
import graft.functions.PhysicsFunctions._
import graft.flow._

/** Spark-first re-expression of the reference's Z→μμ+jets+MET analysis
  * (reference phaseII-analysis.py:306-363) — the end-to-end proof that the
  * engine covers the reference's object-selection algebra, selection DAG,
  * and single-pass histogram/cutflow execution.
  *
  * Object definitions (all lazy HOF views, zero materialization):
  *  - electrons/muons: pt > 20, |eta| < 2.5          (py:306-312)
  *  - ΔR(0.3) cross-cleaning e↔μ                     (py:314-316, 323-325)
  *  - isolation & ID at medium WP (bit 2)            (py:319-329)
  *  - jets cleaned vs id'd leptons, pt>30, |eta|<2.5 (py:333-342)
  *  - b-tag at medium WP                             (py:342)
  *
  * Selection chain (py:349-363):
  *  nmumu → InvM (Z-window veto) → njet → btag → MET
  */
object ZMuMuAnalysis {

  def mediumWP(c: Column): Column = passWorkingPoint(c, 2)

  /** All derived object collections as named columns on the event frame. */
  def withObjects(events: DataFrame): DataFrame = {
    val electrons = selectWhere(col("elec"), el => el("pt") > 20.0 && abs(el("eta")) < 2.5)
    val muons = selectWhere(col("muon"), mu => mu("pt") > 20.0 && abs(mu("eta")) < 2.5)
    events
      .withColumn("sel_elec", electrons)
      .withColumn("sel_muon", muons)
      .withColumn("id_elec",
        selectWhere(
          crossClean(col("sel_elec"), col("sel_muon"), 0.3),
          el => mediumWP(el("isopass")) && mediumWP(el("idpass"))))
      .withColumn("id_muon",
        selectWhere(
          crossClean(col("sel_muon"), col("sel_elec"), 0.3),
          mu => mediumWP(mu("isopass")) && mediumWP(mu("idpass"))))
      .withColumn("good_jets",
        selectWhere(
          crossClean(crossClean(col("jetpuppi"), col("id_elec"), 0.3), col("id_muon"), 0.3),
          j => j("pt") > 30.0 && abs(j("eta")) < 2.5))
      .withColumn("btag_jets", selectWhere(col("good_jets"), j => mediumWP(j("btag"))))
      .withColumn("inv_mass_mumu",
        when(rngLen(col("id_muon")) > 1,
          invariantMass(leading(col("id_muon")), subleading(col("id_muon")))))
      .withColumn("met_pt", leading(col("metpuppi"))("pt"))
  }

  /** The 5-step refine chain rooted at noSel (weights from `weight` col). */
  def selections(): (Selection, Seq[Selection]) = {
    val noSel = Selection.root("noSel", col("weight"))
    val sel1 = noSel.refine("nmumu",
      cut = rngLen(col("id_muon")) > 1 &&
        (leading(col("id_muon"))("charge") * subleading(col("id_muon"))("charge")) < 0)
    val sel2 = sel1.refine("InvM", cut = !inRange(76, col("inv_mass_mumu"), 106))
    val sel3 = sel2.refine("njet", cut = rngLen(col("good_jets")) > 1)
    val sel4 = sel3.refine("btag",
      cut = mediumWP(nth(col("good_jets"), 0)("btag")) || mediumWP(nth(col("good_jets"), 1)("btag")))
    val sel5 = sel4.refine("MET", cut = col("met_pt") > 40)
    (noSel, Seq(noSel, sel1, sel2, sel3, sel4, sel5))
  }

  /** Representative plot set (of the reference's 61; same binnings,
    * py:368-498) — all evaluated in ONE pass by HistogramPass. */
  def plots(noSel: Selection, chain: Seq[Selection]): Seq[Plot] = {
    val sel5 = chain.last
    Seq(
      Plot("nJetsNoSel", rngLen(col("good_jets")), noSel, EquidistantBinning(10, 0, 10)),
      Plot("nbtaggedJetsNoSel", rngLen(col("btag_jets")), noSel, EquidistantBinning(10, 0, 10)),
      Plot("nMuNoSel", rngLen(col("id_muon")), noSel, EquidistantBinning(10, 0, 10)),
      Plot("metNoSel", col("met_pt"), noSel, EquidistantBinning(50, 0, 250)),
      Plot("leadMuPt", nth(col("id_muon"), 0)("pt"), chain(1), EquidistantBinning(50, 0, 250)),
      Plot("subleadMuPt", nth(col("id_muon"), 1)("pt"), chain(1), EquidistantBinning(50, 0, 250)),
      Plot("invMassMuMu", col("inv_mass_mumu"), chain(1), EquidistantBinning(60, 0, 300)),
      Plot("leadJetPt", nth(col("good_jets"), 0)("pt"), chain(3), EquidistantBinning(50, 0, 500)),
      Plot("metSel5", col("met_pt"), sel5, EquidistantBinning(50, 0, 250)))
  }

  /** Full single-pass run: (histograms DF, cutflow entries). */
  def run(events: DataFrame): (DataFrame, Seq[CutFlowReport.Entry]) = {
    val objs = withObjects(events)
    val (noSel, chain) = selections()
    val hists = HistogramPass.run(objs, plots(noSel, chain))
    val cutflow = CutFlowReport.report(objs, chain)
    (hists, cutflow)
  }
}
