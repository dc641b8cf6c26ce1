package graft.flow

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Post-processing arithmetic over aggregated results — all driver-side or
  * over tiny aggregate tables, mirroring the reference's postProcess phase
  * (reference phaseII-analysis.py:270-286; plotIt normalization README.md:29-36).
  */
object Normalization {

  /** MC normalization factor: lumi × xsec / generated-events
    * (reference yml `cross-section`/`generated-events`, phaseII-analysis-FS.yml:12-13;
    * applied by plotIt — SURVEY.md §3 step 7). */
  def scaleFactor(luminosity: Double, crossSection: Double, generatedEvents: Double): Double =
    luminosity * crossSection / generatedEvents

  /** Scale a HistogramPass output: contents ×s, sumw2 ×s² (variance of a
    * scaled weighted count). */
  def scaleHistograms(hists: DataFrame, s: Double): DataFrame =
    hists
      .withColumn("sumw", col("sumw") * s)
      .withColumn("sumw2", col("sumw2") * s * s)

  /** Element-wise stack sum across samples of a group (reference Stack,
    * phaseII-analysis.py:67-75,141): input = union of per-sample scaled
    * histogram tables with a `sample`+`group` column. */
  def stack(perSample: DataFrame): DataFrame =
    perSample
      .groupBy(col("group"), col("plot"), col("bucket"))
      .agg(
        sum(col("n")).as("n"),
        sum(col("sumw")).as("sumw"),
        sum(col("sumw2")).as("sumw2"))

  /** Data/MC ratio with error propagation (reference phaseII-analysis.py:146-152):
    * ratio = d/m, err = sqrt(m²·σ_d² + d²·(σ_m² + syst²)) / m². */
  def ratioWithError(d: Double, sigmaD2: Double, m: Double, sigmaM2: Double, syst2: Double = 0.0): (Double, Double) = {
    if (m == 0.0) (0.0, 0.0)
    else (d / m, math.sqrt(m * m * sigmaD2 + d * d * (sigmaM2 + syst2)) / (m * m))
  }
}
