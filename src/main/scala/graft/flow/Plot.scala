package graft.flow

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Histogram binning schemes (reference `EqB`/`VarBin`,
  * phaseII-analysis.py:368-498; jet_test.py:524-724).
  *
  * Bucket convention: −1 = underflow, 0..n−1 = in-range, n = overflow —
  * matching ROOT's under/overflow bins shifted to 0-based. The bucket
  * expression is pure arithmetic (`floor((x−lo)·n/(hi−lo))`) so it stays
  * in whole-stage codegen and is bit-reproducible across engines.
  */
sealed trait Binning {
  def nBins: Int
  def bucket(x: Column): Column
  /** Low edge of in-range bucket i (driver-side, for rendering). */
  def lowEdge(i: Int): Double
}

final case class EquidistantBinning(nBins: Int, lo: Double, hi: Double) extends Binning {
  require(nBins > 0 && hi > lo)
  def bucket(x: Column): Column =
    when(x < lo, lit(-1))
      .when(x >= hi, lit(nBins))
      .otherwise(floor((x - lit(lo)) * lit(nBins.toDouble) / lit(hi - lo)).cast("int"))
  def lowEdge(i: Int): Double = lo + i * (hi - lo) / nBins
}

final case class VariableBinning(edges: Seq[Double]) extends Binning {
  require(edges.size >= 2 && edges == edges.sorted)
  def nBins: Int = edges.size - 1
  def bucket(x: Column): Column = {
    // Fold of whens — fine for the O(10..50) bin counts the reference uses.
    val pairs = edges.sliding(2).toSeq.zipWithIndex
    val inRange = pairs.foldLeft(lit(nBins): Column) {
      case (acc, (lohi, i)) => when(x >= lohi.head && x < lohi(1), lit(i)).otherwise(acc)
    }
    when(x < edges.head, lit(-1)).otherwise(inRange)
  }
  def lowEdge(i: Int): Double = edges(i)
}

/** A 1-D weighted histogram action attached to a selection node
  * (reference `Plot.make1D`, phaseII-analysis.py:368-498). */
final case class Plot(name: String, value: Column, selection: Selection, binning: Binning)
