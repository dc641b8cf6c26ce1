package graft

import javax.xml.parsers.DocumentBuilderFactory
import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets

import graft.flow.{EquidistantBinning, PlotRender}

class PlotRenderSpec extends SparkSpec {

  private def parseXml(svg: String): org.w3c.dom.Document = {
    val f = DocumentBuilderFactory.newInstance()
    f.newDocumentBuilder().parse(new ByteArrayInputStream(svg.getBytes(StandardCharsets.UTF_8)))
  }

  test("stackedSvg is well-formed XML with bars, legend, and escaping") {
    val binning = EquidistantBinning(4, 0.0, 100.0)
    val svg = PlotRender.stackedSvg("m_ll <GeV>", binning, Seq(
      "TT" -> Map(0 -> (10.0, 4.0), 1 -> (20.0, 9.0), 3 -> (5.0, 1.0)),
      "DY" -> Map(0 -> (3.0, 1.0), 1 -> (8.0, 2.0), 2 -> (2.0, 0.5))))
    val doc = parseXml(svg)
    assert(doc.getDocumentElement.getTagName == "svg")
    assert(doc.getElementsByTagName("rect").getLength >= 7) // bg + 6 bars + legend
    assert(svg.contains("TT") && svg.contains("DY"))
    assert(svg.contains("m_ll &lt;GeV&gt;"), "plot name must be XML-escaped")
  }

  test("stack heights accumulate: top of stack equals group sum") {
    val binning = EquidistantBinning(1, 0.0, 1.0)
    val svg = PlotRender.stackedSvg("p", binning,
      Seq("A" -> Map(0 -> (30.0, 0.0)), "B" -> Map(0 -> (70.0, 0.0))))
    // with yMax = 100*1.08 and ph = 480-34-46 = 400: total bar height =
    // 400 * (100/108) ≈ 370.4 spread over two rects
    val rects = parseXml(svg).getElementsByTagName("rect")
    val rectHeights = (0 until rects.getLength).map(rects.item)
      .collect { case e: org.w3c.dom.Element if e.getAttribute("stroke") == "#333" =>
        e.getAttribute("height").toDouble }
    assert(math.abs(rectHeights.sum - 400.0 * 100 / 108) < 1.5,
      s"stacked rect heights $rectHeights should sum to the total bar")
  }

  test("cutflowSvg renders one bar per selection with yields") {
    val svg = PlotRender.cutflowSvg(Seq("noSel" -> 1000.0, "two muons" -> 420.0, "Z window" -> 77.0))
    parseXml(svg)
    assert(svg.contains("noSel") && svg.contains("Z window"))
    assert(svg.contains(">1000<") && svg.contains(">77<"))
  }

  test("renderStacks writes one svg per plot from a postProcess-shaped table") {
    import spark.implicits._
    val stacked = Seq(
      ("TT", "mll", 0, 5L, 10.0, 4.0), ("TT", "mll", 1, 3L, 6.0, 2.0),
      ("DY", "mll", 0, 2L, 4.0, 1.0),
      ("TT", "met", 0, 7L, 14.0, 5.0))
      .toDF("group", "plot", "bucket", "n", "sumw", "sumw2")
    val dir = java.nio.file.Files.createTempDirectory("plotrender").toString
    val binnings = Map(
      "mll" -> EquidistantBinning(2, 0.0, 200.0),
      "met" -> EquidistantBinning(1, 0.0, 100.0))
    val paths = PlotRender.renderStacks(stacked, binnings, dir)
    assert(paths.size == 2)
    paths.foreach { p =>
      val svg = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), StandardCharsets.UTF_8)
      parseXml(svg)
    }
    assert(paths.exists(_.endsWith("mll.svg")) && paths.exists(_.endsWith("met.svg")))
  }
}
