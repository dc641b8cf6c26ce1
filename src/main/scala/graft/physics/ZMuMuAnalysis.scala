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
object ZMuMuAnalysis extends AnalysisModule {

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

  /** The reference's COMPLETE 61-plot set (py:368-498), identical names,
    * observables, and binnings — all evaluated in ONE pass by
    * HistogramPass. `muons[i]` plots index the pre-ID selected muons
    * (py:310-312), nMu/InvMass use the identified muons — as in the
    * reference. */
  def plots(noSel: Selection, chain: Seq[Selection]): Seq[Plot] = {
    def eqb(n: Int, lo: Double, hi: Double) = EquidistantBinning(n, lo, hi)
    val nJets = rngLen(col("good_jets"))
    val nBtag = rngLen(col("btag_jets"))
    val nMu = rngLen(col("id_muon"))
    def muPt(i: Int) = nth(col("sel_muon"), i)("pt")
    def muEta(i: Int) = nth(col("sel_muon"), i)("eta")
    def jetPt(i: Int) = nth(col("good_jets"), i)("pt")
    def jetEta(i: Int) = nth(col("good_jets"), i)("eta")
    val mass = col("inv_mass_mumu")
    val met = col("met_pt")
    val Seq(sel1, sel2, sel3, sel4, sel5) = chain.drop(1)

    Seq(
      Plot("nJetsNoSel", nJets, noSel, eqb(10, 0, 10)),
      Plot("nbtaggedJetsNoSel", nBtag, noSel, eqb(10, 0, 10)),
      Plot("nMuNoSel", nMu, noSel, eqb(15, 0, 15)),
      Plot("METptNoSel", met, noSel, eqb(50, 0, 250)),

      Plot("nJetsSel1", nJets, sel1, eqb(10, 0, 10)),
      Plot("nbtaggedJetsSel1", nBtag, sel1, eqb(10, 0, 10)),
      Plot("nMuSel1", nMu, sel1, eqb(10, 0, 10)),
      Plot("InvMassTwoMuonsSel1", mass, sel1, eqb(30, 0, 300)),
      Plot("LeadingMuonPTSel1", muPt(0), sel1, eqb(30, 0, 250)),
      Plot("SubLeadingMuonPTSel1", muPt(1), sel1, eqb(30, 0, 250)),
      Plot("LeadingMuonEtaSel1", muEta(0), sel1, eqb(30, -3, 3)),
      Plot("SubLeadingMuonEtaSel1", muEta(1), sel1, eqb(30, -3, 3)),
      Plot("METptSel1", met, sel1, eqb(50, 0, 250)),

      Plot("nJetsSel2", nJets, sel2, eqb(10, 0, 10)),
      Plot("nbtaggedJetsSel2", nBtag, sel2, eqb(10, 0, 10)),
      Plot("nMuSel2", nMu, sel2, eqb(10, 0, 10)),
      Plot("InvMassTwoMuonsSel2", mass, sel2, eqb(20, 20, 300)),
      Plot("LeadingMuonPTSel2", muPt(0), sel2, eqb(30, 0, 250)),
      Plot("SubLeadingMuonPTSel2", muPt(1), sel2, eqb(30, 0, 200)),
      Plot("LeadingMuonEtaSel2", muEta(0), sel2, eqb(30, -3, 3)),
      Plot("SubLeadingMuonEtaSel2", muEta(1), sel2, eqb(30, -3, 3)),
      Plot("METptSel2", met, sel2, eqb(50, 0, 250)),

      Plot("nJetsSel3", nJets, sel3, eqb(10, 0, 10)),
      Plot("nbtaggedJetsSel3", nBtag, sel3, eqb(10, 0, 10)),
      Plot("LeadingJetPTSel3", jetPt(0), sel3, eqb(50, 0, 350)),
      Plot("SubLeadingJetPTSel3", jetPt(1), sel3, eqb(50, 0, 350)),
      Plot("LeadingJetEtaSel3", jetEta(0), sel3, eqb(30, -3, 3)),
      Plot("SubLeadingJetEtaSel3", jetEta(1), sel3, eqb(30, -3, 3)),
      Plot("nMuSel3", nMu, sel3, eqb(10, 0, 10)),
      Plot("LeadingMuonPTSel3", muPt(0), sel3, eqb(30, 0, 250)),
      Plot("SubLeadingMuonPTSel3", muPt(1), sel3, eqb(30, 0, 200)),
      Plot("LeadingMuonEtaSel3", muEta(0), sel3, eqb(30, -3, 3)),
      Plot("SubLeadingMuonEtaSel3", muEta(1), sel3, eqb(30, -3, 3)),
      Plot("InvMassTwoMuonsSel3", mass, sel3, eqb(30, 0, 300)),
      Plot("METptSel3", met, sel3, eqb(50, 0, 250)),

      Plot("nJetsSel4", nJets, sel4, eqb(10, 0, 10)),
      Plot("nbtaggedJetsSel4", nBtag, sel4, eqb(10, 0, 10)),
      Plot("LeadingJetPTSel4", jetPt(0), sel4, eqb(50, 0, 250)),
      Plot("SubLeadingJetPTSel4", jetPt(1), sel4, eqb(50, 0, 250)),
      Plot("LeadingJetEtaSel4", jetEta(0), sel4, eqb(30, -3, 3)),
      Plot("SubLeadingJetEtaSel4", jetEta(1), sel4, eqb(30, -3, 3)),
      Plot("nMuSel4", nMu, sel4, eqb(10, 0, 10)),
      Plot("LeadingMuonPTSel4", muPt(0), sel4, eqb(30, 0, 250)),
      Plot("SubLeadingMuonPTSel4", muPt(1), sel4, eqb(30, 0, 200)),
      Plot("LeadingMuonEtaSel4", muEta(0), sel4, eqb(30, -3, 3)),
      Plot("SubLeadingMuonEtaSel4", muEta(1), sel4, eqb(30, -3, 3)),
      Plot("InvMassTwoMuonsSel4", mass, sel4, eqb(30, 0, 300)),
      Plot("METptSel4", met, sel4, eqb(50, 0, 250)),

      Plot("nJetsSel5", nJets, sel5, eqb(10, 0, 10)),
      Plot("nbtaggedJetsSel5", nBtag, sel5, eqb(10, 0, 10)),
      Plot("LeadingJetPTSel5", jetPt(0), sel5, eqb(50, 0, 250)),
      Plot("SubLeadingJetPTSel5", jetPt(1), sel5, eqb(50, 0, 250)),
      Plot("LeadingJetEtaSel5", jetEta(0), sel5, eqb(30, -3, 3)),
      Plot("SubLeadingJetEtaSel5", jetEta(1), sel5, eqb(30, -3, 3)),
      Plot("nMuSel5", nMu, sel5, eqb(10, 0, 10)),
      Plot("LeadingMuonPTSel5", muPt(0), sel5, eqb(30, 0, 250)),
      Plot("SubLeadingMuonPTSel5", muPt(1), sel5, eqb(30, 0, 200)),
      Plot("LeadingMuonEtaSel5", muEta(0), sel5, eqb(30, -3, 3)),
      Plot("SubLeadingMuonEtaSel5", muEta(1), sel5, eqb(30, -3, 3)),
      Plot("InvMassTwoMuonsSel5", mass, sel5, eqb(30, 0, 300)),
      Plot("METptSel5", met, sel5, eqb(50, 0, 250)))
  }

  // single-pass run(events) inherited from AnalysisModule
}
