package graft

import org.apache.spark.sql.functions._
import graft.core.AnalysisConfig
import graft.flow._
import graft.physics.{EventGen, ZMuMuAnalysis}

/** End-to-end multi-sample pipeline: config → per-sample single-pass run →
  * results + counter sidecars → normalization/stacking → overlay. */
class SampleRunnerSpec extends SparkSpec {

  private lazy val outDir =
    java.nio.file.Files.createTempDirectory("graft_results").toString

  private lazy val cfg = AnalysisConfig.fromYamlString(
    """tree: events
      |eras:
      |  HL-LHC:
      |    luminosity: 3000000
      |samples:
      |  TT:
      |    era: HL-LHC
      |    type: MC
      |    group: Top
      |    generated-events: 1000
      |    cross-section: 950
      |  DY:
      |    era: HL-LHC
      |    type: MC
      |    group: DrellYan
      |    generated-events: 800
      |    cross-section: 5620
      |""".stripMargin)

  private lazy val ran: Unit = cfg.samples.zipWithIndex.foreach { case (s, i) =>
    val events = EventGen.dataFrame(spark, 1000).withColumn("event_id", col("event_id") + i * 100000)
    SampleRunner.runSample(spark, events, ZMuMuAnalysis, outDir, s)
  }

  test("per-sample results and counter sidecars are written and readable") {
    ran
    cfg.samples.foreach { s =>
      val h = spark.read.parquet(s"$outDir/results/${s.name}/histograms")
      assert(h.count() > 0)
      assert(h.columns.toSet == Set("plot", "bucket", "n", "sumw", "sumw2"))
      assert(SampleRunner.readCounters(spark, outDir, s.name) == 1000L)
      // single-pass cutflow: long-format rows per selection, noSel = all events
      val cf = spark.read.parquet(s"$outDir/results/${s.name}/cutflow")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(cf("noSel") == 1000L)
      assert(cf.contains("nmumu") && cf("nmumu") <= cf("noSel"))
      // no histogram rows leak the cutflow prefix
      assert(h.filter(org.apache.spark.sql.functions.col("plot")
        .startsWith("__cutflow__")).count() == 0)
    }
  }

  test("postProcess stacks normalized histograms per group") {
    ran
    val stacked = SampleRunner.postProcess(spark, cfg, outDir)
    assert(stacked.select("group").distinct().count() == 2)
    // normalization: TT scale = 3e6*950/1000; stacked sumw of a plot must
    // equal raw sumw × scale for the single-sample group
    val ttScale = cfg.scaleFor(cfg.samples.find(_.name == "TT").get)
    val rawTT = spark.read.parquet(s"$outDir/results/TT/histograms")
      .filter(col("plot") === "METptNoSel").agg(sum("sumw")).head().getDouble(0)
    val stackedTT = stacked.filter(col("group") === "Top" && col("plot") === "METptNoSel")
      .agg(sum("sumw")).head().getDouble(0)
    assert(math.abs(stackedTT - rawTT * ttScale) < 1e-6 * math.abs(stackedTT))
  }

  test("overlay compares two samples side by side (full outer)") {
    ran
    val ov = SampleRunner.overlay(spark, outDir, "TT", "DY")
    assert(ov.count() > 0)
    assert(ov.columns.toSet == Set("plot", "bucket", "n_a", "sumw_a", "n_b", "sumw_b"))
    // same generator input ⇒ same unweighted counts per bucket where present
    val mismatch = ov.filter(col("n_a").isNotNull && col("n_b").isNotNull &&
      col("n_a") =!= col("n_b")).count()
    assert(mismatch == 0)
  }
}
