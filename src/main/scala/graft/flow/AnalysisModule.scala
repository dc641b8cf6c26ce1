package graft.flow

import org.apache.spark.sql.DataFrame

/** The user-facing analysis contract — the Spark twin of the reference's
  * HistogramsModule (`definePlots` hook, reference phaseII-analysis.py:297,
  * jet_test.py:337): implement three declarative methods and the engine
  * runs everything in one pass per sample via [[SampleRunner]].
  */
trait AnalysisModule {
  /** Derived object collections as columns on the event frame. */
  def withObjects(events: DataFrame): DataFrame
  /** The selection DAG: (root, all registered nodes). */
  def selections(): (Selection, Seq[Selection])
  /** Histogram actions attached to DAG nodes. */
  def plots(noSel: Selection, chain: Seq[Selection]): Seq[Plot]

  /** Single-pass execution: (histograms, cutflow entries). Override to
    * report a different cutflow subset (e.g. JetValidationAnalysis). */
  def run(events: DataFrame): (DataFrame, Seq[CutFlowReport.Entry]) = {
    val objs = withObjects(events)
    val (noSel, chain) = selections()
    (HistogramPass.run(objs, plots(noSel, chain)), CutFlowReport.report(objs, chain))
  }
}
