package graft.flow

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Cutflow accounting over a selection DAG — N, SumW, SumW² per registered
  * node, plus step and total efficiencies (reference `CutFlowReport`,
  * phaseII-analysis.py:502-510 registered, 168-262 reported;
  * jet_test.py:728-734).
  *
  * Physical design: ONE wide aggregation of conditional sums over all
  * registered flag columns — a single scan, no matter how many selections
  * (51 in jet_test). The aggregate output is one row of 3×|selections|
  * values; efficiency arithmetic happens driver-side on that row, exactly
  * like the reference's report phase (SURVEY.md §3 entry point 3).
  */
object CutFlowReport {

  final case class Entry(
      name: String, n: Long, sumw: Double, sumw2: Double,
      /** SumW_i / SumW_parent (1.0 at the root) — reference phaseII-analysis.py:107-111. */
      stepEff: Double,
      /** SumW_i / SumW_root. */
      totalEff: Double)

  /** Distributed part: one wide agg → (sel, n, sumw, sumw2) rows. */
  def wide(df: DataFrame, sels: Seq[Selection]): DataFrame = {
    val flagged = SelectionFlow.withFlags(df, sels)
    val ordered = SelectionFlow.nodes(sels)
    val aggs = ordered.flatMap { s =>
      Seq(
        count(when(s.flag, 1)).as(s"n_${s.name}"),
        sum(when(s.flag, s.weight).otherwise(0.0)).as(s"sumw_${s.name}"),
        sum(when(s.flag, s.weight * s.weight).otherwise(0.0)).as(s"sumw2_${s.name}"))
    }
    flagged.agg(aggs.head, aggs.tail: _*)
  }

  /** Full report with efficiencies (collects ONE row — driver-side by design). */
  def report(df: DataFrame, sels: Seq[Selection]): Seq[Entry] = {
    val ordered = SelectionFlow.nodes(sels)
    val row: Row = wide(df, sels).head()
    val byName = ordered.map { s =>
      s.name -> (
        row.getAs[Long](s"n_${s.name}"),
        row.getAs[Double](s"sumw_${s.name}"),
        row.getAs[Double](s"sumw2_${s.name}"))
    }.toMap
    val rootSumw = ordered.headOption.map(r => byName(r.name)._2).getOrElse(0.0)
    ordered.map { s =>
      val (n, sumw, sumw2) = byName(s.name)
      val parentSumw = s.parent.map(p => byName(p.name)._2).getOrElse(sumw)
      Entry(
        s.name, n, sumw, sumw2,
        stepEff = if (parentSumw != 0.0) sumw / parentSumw else 0.0,
        totalEff = if (rootSumw != 0.0) sumw / rootSumw else 0.0)
    }
  }

  /** LaTeX yields table (reference printCutFlowReports → yields.tex,
    * phaseII-analysis.py:168-262: per-step and total efficiencies with the
    * same tabular shape). Underscores escaped for TeX. */
  def renderLatex(entries: Seq[Entry], caption: String = "Cutflow yields"): String = {
    def tex(s: String) = s.replace("_", "\\_")
    val rows = entries.map { e =>
      f"${tex(e.name)} & ${e.n}%d & ${e.sumw}%.3f & ${e.stepEff * 100}%.2f\\%% & ${e.totalEff * 100}%.2f\\%% \\\\"
    }
    (Seq(
      "\\begin{table}[h]", "\\centering",
      "\\begin{tabular}{lrrrr}", "\\hline",
      "selection & N & SumW & step eff & total eff \\\\", "\\hline") ++
      rows ++
      Seq("\\hline", "\\end{tabular}", s"\\caption{${tex(caption)}}", "\\end{table}"))
      .mkString("\n")
  }

  /** yields-table text rendering (reference printCutFlowReports → yields.tex,
    * phaseII-analysis.py:168-262). */
  def render(entries: Seq[Entry]): String = {
    val header = f"${"selection"}%-20s ${"N"}%10s ${"SumW"}%14s ${"stepEff%"}%10s ${"totalEff%"}%10s"
    val lines = entries.map { e =>
      f"${e.name}%-20s ${e.n}%10d ${e.sumw}%14.3f ${e.stepEff * 100}%10.3f ${e.totalEff * 100}%10.3f"
    }
    (header +: lines).mkString("\n")
  }
}
