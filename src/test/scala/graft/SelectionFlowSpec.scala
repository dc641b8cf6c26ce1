package graft

import org.apache.spark.sql.functions._
import graft.flow._

class SelectionFlowSpec extends SparkSpec {
  import spark.implicits._

  // 6 rows: x = 1..6, weight w = 0.5·x. Chain: x>1 → x>3 → x>5.
  private lazy val df = (1 to 6).map(x => (x, 0.5 * x)).toDF("x", "w")

  private def chain() = {
    val root = Selection.root("all", col("w"))
    val a = root.refine("gt1", col("x") > 1)
    val b = a.refine("gt3", col("x") > 3)
    val c = b.refine("gt5", col("x") > 5)
    (root, Seq(root, a, b, c))
  }

  test("golden cutflow: hand-computed N / SumW / efficiencies") {
    val (_, sels) = chain()
    val entries = CutFlowReport.report(df, sels)
    val byName = entries.map(e => e.name -> e).toMap
    // SumW(all)=0.5·(1+..+6)=10.5; gt1: 2..6 → 10; gt3: 4..6 → 7.5; gt5: 6 → 3
    assert(byName("all").n == 6 && math.abs(byName("all").sumw - 10.5) < 1e-12)
    assert(byName("gt1").n == 5 && math.abs(byName("gt1").sumw - 10.0) < 1e-12)
    assert(byName("gt3").n == 3 && math.abs(byName("gt3").sumw - 7.5) < 1e-12)
    assert(byName("gt5").n == 1 && math.abs(byName("gt5").sumw - 3.0) < 1e-12)
    assert(math.abs(byName("gt3").stepEff - 0.75) < 1e-12)
    assert(math.abs(byName("gt5").totalEff - 3.0 / 10.5) < 1e-12)
    // sumw2(gt5) = (0.5·6)² = 9
    assert(math.abs(byName("gt5").sumw2 - 9.0) < 1e-12)
  }

  test("yields are monotone non-increasing along a refine chain") {
    val (_, sels) = chain()
    val entries = CutFlowReport.report(df, sels)
    entries.sliding(2).foreach { case Seq(a, b) =>
      assert(b.n <= a.n && b.sumw <= a.sumw + 1e-12)
      assert(b.stepEff > 0 && b.stepEff <= 1.0)
    case _ => ()
    }
  }

  test("per-node extra weight factors multiply down the chain") {
    val root = Selection.root("all", col("w"))
    val a = root.refine("gt1", col("x") > 1, weight = lit(2.0))
    val entries = CutFlowReport.report(df, Seq(root, a))
    assert(math.abs(entries.last.sumw - 20.0) < 1e-12) // 10 × 2
  }

  test("render produces a yields table") {
    val (_, sels) = chain()
    val txt = CutFlowReport.render(CutFlowReport.report(df, sels))
    assert(txt.contains("gt5") && txt.contains("SumW"))
  }

  test("renderLatex produces a compilable-shaped yields.tex table") {
    val (_, sels) = chain()
    val tex = CutFlowReport.renderLatex(CutFlowReport.report(df, sels), caption = "smoke_test")
    assert(tex.contains("\\begin{tabular}{lrrrr}"))
    assert(tex.contains("gt5 & 1 & 3.000 & 40.00\\% & 28.57\\% \\\\"))
    assert(tex.contains("smoke\\_test"))
  }
}
