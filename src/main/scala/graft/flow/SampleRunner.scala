package graft.flow

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{AnalysisConfig, SampleConfig}

/** Per-sample orchestration — the Spark lifecycle twin of `bambooRun`
  * (SURVEY.md §3): for each sample in the config, run ONE single-pass job
  * (all histograms + cutflow), write results + counter sidecar, then
  * post-process across samples (normalization, group stacking, overlay
  * comparison).
  *
  * Results layout under `outDir`:
  *   results/{sample}/all/          combined single-pass aggregate
  *   results/{sample}/histograms/   (plot, bucket, n, sumw, sumw2)
  *   results/{sample}/cutflow/      (sel, n, sumw, sumw2) — selections with
  *                                  zero passing events have no row (= 0)
  *   results/{sample}/counters/     (file, n_events) — mergeCounters parity
  *     (reference phaseII-analysis.py:21-35): per-input-file event counts
  *     persisted next to results, read back for normalization checks.
  */
object SampleRunner {

  final case class SampleResult(sample: SampleConfig, scale: Double)

  private val CutPrefix = "__cutflow__"

  /** One analysis pass for one sample. `analysis` supplies the object
    * definitions + selections + plots (e.g. ZMuMuAnalysis).
    *
    * TRUE single pass (the reference's one-event-loop model, SURVEY.md §4):
    * the cutflow rides the histogram pass as one-bin pseudo-plots per
    * selection node, so ALL histograms AND the cutflow come from one scan;
    * the combined aggregate (O(plots × bins) rows) is written once and the
    * two result tables are split from that tiny output. Only the per-file
    * counter sidecar is a second (count-only, column-pruned) pass. */
  def runSample(
      spark: SparkSession,
      events: DataFrame,
      module: AnalysisModule,
      outDir: String,
      sample: SampleConfig): Unit = {
    val objs = module.withObjects(events)
    val (noSel, chain) = module.selections()
    val cutflowPlots = chain.map(s =>
      Plot(CutPrefix + s.name, lit(0.5), s, EquidistantBinning(1, 0, 1)))
    val combined = HistogramPass.run(objs, module.plots(noSel, chain) ++ cutflowPlots)
    val allPath = s"$outDir/results/${sample.name}/all"
    combined.write.mode("overwrite").parquet(allPath)
    val all = spark.read.parquet(allPath)
    all.filter(!col("plot").startsWith(CutPrefix))
      .write.mode("overwrite").parquet(s"$outDir/results/${sample.name}/histograms")
    all.filter(col("plot").startsWith(CutPrefix))
      .select(
        expr(s"substring(plot, ${CutPrefix.length + 1})").as("sel"),
        col("n"), col("sumw"), col("sumw2"))
      .write.mode("overwrite").parquet(s"$outDir/results/${sample.name}/cutflow")
    // counter sidecar: per-input-file event counts (counter-merge sink)
    events.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_events"))
      .write.mode("overwrite").parquet(s"$outDir/results/${sample.name}/counters")
  }

  /** Counter source (readCounters parity): total generated events per sample. */
  def readCounters(spark: SparkSession, outDir: String, sample: String): Long =
    spark.read.parquet(s"$outDir/results/$sample/counters")
      .agg(sum(col("n_events"))).head().getLong(0)

  /** Results source + normalization + group stacking (postProcess parity):
    * returns per-(group, plot, bucket) stacked, lumi-normalized histograms. */
  def postProcess(spark: SparkSession, cfg: AnalysisConfig, outDir: String): DataFrame = {
    val perSample = cfg.samples.map { s =>
      val scale = cfg.scaleFor(s)
      spark.read.parquet(s"$outDir/results/${s.name}/histograms")
        .withColumn("sample", lit(s.name))
        .withColumn("group", lit(s.group))
        .withColumn("sumw", col("sumw") * scale)
        .withColumn("sumw2", col("sumw2") * scale * scale)
    }.reduce(_ unionByName _)
    Normalization.stack(perSample)
  }

  /** Side-by-side overlay of two samples' histograms keyed by plot/bucket
    * (the FS-vs-Delphes comparison shape, SURVEY.md §2.7): full outer join
    * so missing buckets surface as nulls on either side. */
  def overlay(spark: SparkSession, outDir: String, sampleA: String, sampleB: String): DataFrame = {
    def side(name: String, tag: String) =
      spark.read.parquet(s"$outDir/results/$name/histograms")
        .select(col("plot"), col("bucket"),
          col("n").as(s"n_$tag"), col("sumw").as(s"sumw_$tag"))
    side(sampleA, "a").join(side(sampleB, "b"), Seq("plot", "bucket"), "full_outer")
  }
}
