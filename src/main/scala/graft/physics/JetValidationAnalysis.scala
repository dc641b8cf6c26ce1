package graft.physics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.CollectionOps._
import graft.functions.PhysicsFunctions._
import graft.flow._

/** Spark re-expression of the reference's jet-validation module
  * (reference jet_test.py:340-518): a systematic grid of jet selections —
  * pt threshold {30, 50, 100} × |η| region {all, barrel <1.5, mid 1.5–3,
  * forward >3} × multiplicity ≥{1,2,3,4} — all siblings of noSel, with
  * leading-jet kinematic histograms per node: the reference's 51-selection
  * / 66-histogram single-pass stress case.
  *
  * Note: the reference's mid-η predicate `NOT(|η|<1.5 AND |η|>3)`
  * (jet_test.py:384-385) is a tautology (the conjunction is unsatisfiable),
  * so its "1_5to3" collections actually contain every jet above threshold.
  * We implement the evidently intended region 1.5 ≤ |η| ≤ 3 — capability
  * parity, not bug parity.
  */
object JetValidationAnalysis extends AnalysisModule {

  val ptThresholds: Seq[Int] = Seq(30, 50, 100)
  val etaRegions: Seq[(String, Column => Column)] = Seq(
    "all" -> (_ => lit(true)),
    "0to1_5" -> (eta => abs(eta) < 1.5),
    "1_5to3" -> (eta => abs(eta) >= 1.5 && abs(eta) <= 3.0),
    "3toInf" -> (eta => abs(eta) > 3.0))

  private def jetsCol(pt: Int, region: String) = s"jets_${pt}_$region"

  def mediumWP(c: Column): Column = passWorkingPoint(c, 2)

  /** Identified leptons (shared with ZMuMu) + the 12 jet collections. */
  def withObjects(events: DataFrame): DataFrame = {
    val electrons = selectWhere(col("elec"), el => el("pt") > 20.0 && abs(el("eta")) < 2.5)
    val muons = selectWhere(col("muon"), mu => mu("pt") > 20.0 && abs(mu("eta")) < 2.5)
    val base = events
      .withColumn("sel_elec", electrons)
      .withColumn("sel_muon", muons)
      .withColumn("id_elec",
        selectWhere(crossClean(col("sel_elec"), col("sel_muon"), 0.3),
          el => mediumWP(el("isopass")) && mediumWP(el("idpass"))))
      .withColumn("id_muon",
        selectWhere(crossClean(col("sel_muon"), col("sel_elec"), 0.3),
          mu => mediumWP(mu("isopass")) && mediumWP(mu("idpass"))))
      .withColumn("cleaned_jets",
        crossClean(crossClean(col("jetpuppi"), col("id_elec"), 0.3), col("id_muon"), 0.3))
      .withColumn("met_pt", leading(col("metpuppi"))("pt"))
    ptThresholds.foldLeft(base) { (acc, pt) =>
      etaRegions.foldLeft(acc) { case (acc2, (region, pred)) =>
        acc2.withColumn(jetsCol(pt, region),
          selectWhere(col("cleaned_jets"), j => j("pt") > pt.toDouble && pred(j("eta"))))
      }
    }
  }

  /** noSel + the 48-node multiplicity grid (reference jet_test.py:416-518). */
  def selections(): (Selection, Seq[Selection]) = {
    val noSel = Selection.root("noSel", col("weight"))
    val grid = for {
      pt <- ptThresholds
      (region, _) <- etaRegions
      k <- 1 to 4
    } yield noSel.refine(s"nJet${pt}_${region}_ge$k", rngLen(col(jetsCol(pt, region))) >= k)
    (noSel, noSel +: grid)
  }

  /** The reference's COMPLETE 66-plot set (jet_test.py:524-724), identical
    * names and binnings: per threshold — nJets EqB(15,0,15), MET at the
    * ≥1-jet node EqB(50,0,1000), and for each jet index k∈1..4 at the
    * matching ≥k node: pt EqB(50,0,4000), η EqB(30,−3,3), and per-region
    * pt spectra indexed into the region collections. */
  def plots(noSel: Selection, chain: Seq[Selection]): Seq[Plot] = {
    val byName = chain.map(s => s.name -> s).toMap
    ptThresholds.flatMap { pt =>
      val base = Seq(
        Plot(s"nJets_jetPT_${pt}GeV", rngLen(col(jetsCol(pt, "all"))), noSel,
          EquidistantBinning(15, 0, 15)),
        Plot(s"MET_jetPT_${pt}GeV", col("met_pt"), byName(s"nJet${pt}_all_ge1"),
          EquidistantBinning(50, 0, 1000)))
      val perK = (1 to 4).flatMap { k =>
        val allSel = byName(s"nJet${pt}_all_ge$k")
        Seq(
          Plot(s"Jet${k}_pT_jetPT_${pt}GeV", nth(col(jetsCol(pt, "all")), k - 1)("pt"),
            allSel, EquidistantBinning(50, 0, 4000)),
          Plot(s"Jet${k}_eta_jetPT_${pt}GeV", nth(col(jetsCol(pt, "all")), k - 1)("eta"),
            allSel, EquidistantBinning(30, -3, 3))) ++
          etaRegions.collect { case (region, _) if region != "all" =>
            Plot(s"Jet${k}_pT_${region}_jetPT_${pt}GeV",
              nth(col(jetsCol(pt, region)), k - 1)("pt"),
              byName(s"nJet${pt}_${region}_ge$k"), EquidistantBinning(50, 0, 4000))
          }
      }
      base ++ perK // 2 + 4×5 = 22 per threshold → 66 total
    }
  }

  override def run(events: DataFrame): (DataFrame, Seq[CutFlowReport.Entry]) = {
    val objs = withObjects(events)
    val (noSel, chain) = selections()
    val hists = HistogramPass.run(objs, plots(noSel, chain))
    // 4-entry cutflow like the reference (jet_test.py:728-734)
    val cutflow = CutFlowReport.report(objs,
      Seq(noSel) ++ Seq(30, 50, 100).map(pt =>
        chain.find(_.name == s"nJet${pt}_all_ge1").get))
    (hists, cutflow)
  }
}
