package graft.flow

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** Rendered-plot parity with the reference's plotIt stage (reference
  * README.md:29-36 — the pipeline ends in stacked per-group images;
  * phaseII-analysis-FS-Delphes.yml:40-51 configures the stacks) and the
  * cutflow histogram image (README.md:55-57).
  *
  * Deliberately dependency-free: output is SVG built from strings — no
  * plotting library exists in the runtime, and none is needed, because by
  * this stage the data is a tiny driver-side aggregate (O(plots × bins)
  * rows, the same table `SampleRunner.postProcess` returns). The heavy
  * lifting (the single-pass histogram fill over the full dataset) already
  * happened distributed; rendering tiny aggregates driver-side is the
  * correct 100 TB split.
  */
object PlotRender {

  /** group → fill color, cycled (plotIt's per-group fill-color yml knob). */
  private val Palette = Vector(
    "#4e79a7", "#f28e2b", "#e15759", "#76b7b2", "#59a14f",
    "#edc948", "#b07aa1", "#ff9da7", "#9c755f", "#bab0ac")

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")

  private def fmt(x: Double): String =
    if (x == x.floor && math.abs(x) < 1e7) x.toLong.toString
    else f"$x%.3g"

  /** Stacked 1-D histogram: `series` = (group, bucket → (sumw, sumw2)),
    * stacked in the given order with a per-bin √(Σ sumw2) error bar on the
    * stack top. Under/overflow buckets (−1 and nBins) are not drawn,
    * matching the reference's default view.
    */
  def stackedSvg(plotName: String, binning: Binning,
      series: Seq[(String, Map[Int, (Double, Double)])],
      width: Int = 720, height: Int = 480): String = {
    val (mL, mR, mT, mB) = (62, 18, 34, 46)
    val pw = width - mL - mR
    val ph = height - mT - mB
    val n = binning.nBins
    val stackTop = (0 until n).map(b => series.map(_._2.getOrElse(b, (0.0, 0.0))._1).sum)
    val stackErr = (0 until n).map(b =>
      math.sqrt(series.map(_._2.getOrElse(b, (0.0, 0.0))._2).sum))
    val yMax0 = stackTop.zip(stackErr).map { case (t, e) => t + e }.foldLeft(0.0)(math.max)
    val yMax = if (yMax0 <= 0) 1.0 else yMax0 * 1.08
    def xOf(b: Int): Double = mL + pw.toDouble * b / n
    def yOf(v: Double): Double = mT + ph - ph * (v / yMax)
    val bw = pw.toDouble / n

    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height" viewBox="0 0 $width $height">"""
    sb ++= s"""<rect width="$width" height="$height" fill="white"/>"""
    // stacked bars, bottom-up in series order
    for (b <- 0 until n) {
      var base = 0.0
      series.zipWithIndex.foreach { case ((g, by), gi) =>
        val v = by.getOrElse(b, (0.0, 0.0))._1
        if (v > 0) {
          val y1 = yOf(base + v); val y0 = yOf(base)
          sb ++= f"""<rect x="${xOf(b)}%.2f" y="$y1%.2f" width="$bw%.2f" height="${y0 - y1}%.2f" fill="${Palette(gi % Palette.size)}" stroke="#333" stroke-width="0.4"><title>${esc(g)} bin $b: ${fmt(v)}</title></rect>"""
          base += v
        }
      }
      // per-bin stack error bar
      val e = stackErr(b)
      if (e > 0 && stackTop(b) > 0) {
        val cx = xOf(b) + bw / 2
        sb ++= f"""<line x1="$cx%.2f" y1="${yOf(stackTop(b) - e)}%.2f" x2="$cx%.2f" y2="${yOf(math.min(stackTop(b) + e, yMax))}%.2f" stroke="#111" stroke-width="1"/>"""
      }
    }
    // axes
    sb ++= s"""<line x1="$mL" y1="${mT + ph}" x2="${mL + pw}" y2="${mT + ph}" stroke="#000"/>"""
    sb ++= s"""<line x1="$mL" y1="$mT" x2="$mL" y2="${mT + ph}" stroke="#000"/>"""
    // x ticks: bin edges, thinned to ≤ 12 labels; the final edge (b = n,
    // the axis upper bound) is always drawn even when step ∤ n
    val step = math.max(1, n / 10)
    ((0 until n by step) :+ n).foreach { b =>
      val edge = if (b < n) binning.lowEdge(b)
        else binning match { case e: EquidistantBinning => e.hi; case v: VariableBinning => v.edges.last }
      sb ++= f"""<line x1="${xOf(b)}%.2f" y1="${mT + ph}" x2="${xOf(b)}%.2f" y2="${mT + ph + 5}" stroke="#000"/>"""
      sb ++= f"""<text x="${xOf(b)}%.2f" y="${mT + ph + 18}" font-size="11" text-anchor="middle" font-family="sans-serif">${fmt(edge)}</text>"""
    }
    // y ticks: 5 divisions
    (0 to 5).foreach { i =>
      val v = yMax * i / 5
      sb ++= f"""<line x1="${mL - 5}" y1="${yOf(v)}%.2f" x2="$mL" y2="${yOf(v)}%.2f" stroke="#000"/>"""
      sb ++= f"""<text x="${mL - 8}" y="${yOf(v) + 4}%.2f" font-size="11" text-anchor="end" font-family="sans-serif">${fmt(v)}</text>"""
    }
    // title + legend
    sb ++= s"""<text x="${mL}" y="20" font-size="14" font-family="sans-serif" font-weight="bold">${esc(plotName)}</text>"""
    series.zipWithIndex.foreach { case ((g, _), gi) =>
      val lx = mL + pw - 130; val ly = mT + 8 + gi * 18
      sb ++= s"""<rect x="$lx" y="$ly" width="12" height="12" fill="${Palette(gi % Palette.size)}"/>"""
      sb ++= s"""<text x="${lx + 17}" y="${ly + 10}" font-size="12" font-family="sans-serif">${esc(g)}</text>"""
    }
    sb ++= "</svg>"
    sb.toString
  }

  /** Cutflow bar chart (reference's cutflow histogram image): one bar per
    * selection stage, in the given order, labeled with weighted yields. */
  def cutflowSvg(rows: Seq[(String, Double)], width: Int = 720, height: Int = 480): String = {
    val (mL, mR, mT, mB) = (62, 18, 34, 80)
    val pw = width - mL - mR
    val ph = height - mT - mB
    val n = math.max(rows.size, 1)
    val yMax0 = rows.map(_._2).foldLeft(0.0)(math.max)
    val yMax = if (yMax0 <= 0) 1.0 else yMax0 * 1.08
    val bw = pw.toDouble / n
    def yOf(v: Double): Double = mT + ph - ph * (v / yMax)
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height" viewBox="0 0 $width $height">"""
    sb ++= s"""<rect width="$width" height="$height" fill="white"/>"""
    rows.zipWithIndex.foreach { case ((sel, v), i) =>
      val x = mL + i * bw
      sb ++= f"""<rect x="${x + bw * 0.1}%.2f" y="${yOf(v)}%.2f" width="${bw * 0.8}%.2f" height="${mT + ph - yOf(v)}%.2f" fill="#4e79a7" stroke="#333" stroke-width="0.4"/>"""
      sb ++= f"""<text x="${x + bw / 2}%.2f" y="${yOf(v) - 4}%.2f" font-size="11" text-anchor="middle" font-family="sans-serif">${fmt(v)}</text>"""
      sb ++= f"""<text x="${x + bw / 2}%.2f" y="${mT + ph + 14}" font-size="11" text-anchor="end" font-family="sans-serif" transform="rotate(-35 ${x + bw / 2}%.2f ${mT + ph + 14})">${esc(sel)}</text>"""
    }
    sb ++= s"""<line x1="$mL" y1="${mT + ph}" x2="${mL + pw}" y2="${mT + ph}" stroke="#000"/>"""
    sb ++= s"""<line x1="$mL" y1="$mT" x2="$mL" y2="${mT + ph}" stroke="#000"/>"""
    sb ++= s"""<text x="$mL" y="20" font-size="14" font-family="sans-serif" font-weight="bold">Cutflow</text>"""
    sb ++= "</svg>"
    sb.toString
  }

  /** Render every plot in a `SampleRunner.postProcess` output (columns
    * group/plot/bucket/n/sumw/sumw2) to `outDir/plots/<plot>.svg`, stacking
    * groups in sorted order. The input is a tiny aggregate — the collect is
    * O(plots × bins × groups). Returns the written paths. */
  def renderStacks(stacked: DataFrame, binnings: Map[String, Binning], outDir: String): Seq[String] = {
    val rows = stacked.select("group", "plot", "bucket", "sumw", "sumw2").collect()
    val byPlot = rows.groupBy(_.getString(1))
    val dir = Paths.get(outDir, "plots")
    Files.createDirectories(dir)
    byPlot.toSeq.sortBy(_._1).flatMap { case (plot, rs) =>
      binnings.get(plot).map { binning =>
        val series = rs.groupBy(_.getString(0)).toSeq.sortBy(_._1).map { case (g, grs) =>
          g -> grs.map(r => r.getInt(2) -> (r.getDouble(3), r.getDouble(4))).toMap
        }
        val path = dir.resolve(s"$plot.svg")
        Files.write(path, stackedSvg(plot, binning, series).getBytes(StandardCharsets.UTF_8))
        path.toString
      }
    }
  }
}
