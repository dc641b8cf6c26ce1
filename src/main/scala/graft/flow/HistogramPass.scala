package graft.flow

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass multi-histogram execution — the engine's core physical-design
  * decision (SURVEY.md §4 "multi-action single pass").
  *
  * The reference evaluates ~60 filters + ~60 histograms in ONE event loop
  * per sample (RDataFrame lazy multi-action model; reference
  * phaseII-analysis.py:368-510 registers everything before `:512` runs).
  * Naive Spark would launch one job — one full scan — per histogram. Instead
  * we encode every plot as an entry of a per-row array of
  * `(plot, bucket, w)` structs, explode, and aggregate all plots in one
  * `groupBy(plot, bucket)`:
  *
  *   - ONE scan of the sample regardless of the number of plots;
  *   - partial (map-side) aggregation collapses each partition to at most
  *     Σ_plots (nBins+2) rows, so the shuffle is O(plots × bins) — tiny and
  *     independent of input size. At 100 TB the scan dominates; adding a
  *     plot costs arithmetic, not I/O.
  *
  * Output schema: (plot, bucket, n, sumw, sumw2) — bin statistics including
  * sumw2 for error propagation (reference phaseII-analysis.py:150-151).
  */
object HistogramPass {

  /** Run all plots in one scan. `df` must already carry the flag/weight
    * columns of every referenced selection (`SelectionFlow.withFlags`). */
  def run(df: DataFrame, plots: Seq[Plot]): DataFrame = {
    require(plots.nonEmpty, "no plots registered")
    require(plots.map(_.name).distinct.size == plots.size, "duplicate plot names")
    val leaves = plots.map(_.selection)
    val flagged = SelectionFlow.withFlags(df, leaves)
    val entries = plots.map { p =>
      struct(
        lit(p.name).as("plot"),
        when(p.selection.flag, p.binning.bucket(p.value)).as("bucket"),
        p.selection.weight.as("w"))
    }
    flagged
      .select(explode(array(entries: _*)).as("e"))
      .filter(col("e.bucket").isNotNull)
      .select(col("e.plot").as("plot"), col("e.bucket").as("bucket"), col("e.w").as("w"))
      .groupBy(col("plot"), col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("w")).as("sumw"),
        sum(col("w") * col("w")).as("sumw2"))
  }
}
