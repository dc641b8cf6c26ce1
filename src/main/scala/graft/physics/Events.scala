package graft.physics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CMS Phase-2-style event-table model (SURVEY.md §1, FIXTURES.md §A).
  *
  * One row = one collision event carrying variable-length particle
  * collections as array-of-struct columns — the Spark mapping of the
  * reference's decorated flat tree (reference phaseII-analysis.py:16-18).
  * Collections are generated pt-sorted descending, the producer-side
  * ordering guarantee the reference indexes against
  * (phaseII-analysis.py:386-388 "Leading/SubLeading").
  */
final case class Particle(
    pt: Float, eta: Float, phi: Float, mass: Float,
    charge: Int, idpass: Int, isopass: Int)

final case class Jet(pt: Float, eta: Float, phi: Float, mass: Float, btag: Int)

final case class Met(pt: Float, phi: Float)

final case class Event(
    event_id: Long,
    weight: Double,
    elec: Seq[Particle],
    muon: Seq[Particle],
    jetpuppi: Seq[Jet],
    metpuppi: Seq[Met])

/** Deterministic synthetic event generation for parity tests — a
  * SplitMix64-style mixer keyed on (event_id, stream), so any event is
  * reproducible independently (embarrassingly parallel: at scale this maps
  * onto `spark.range(n)` with the same arithmetic). */
object EventGen {

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Uniform in [0,1) from (id, stream). */
  private def u(id: Long, stream: Long): Double =
    (mix(mix(id) ^ stream) >>> 11).toDouble / (1L << 53).toDouble

  private def genParticle(id: Long, s: Long): Particle = {
    val pt = (10.0 + 90.0 * u(id, s)).toFloat
    val eta = (-3.0 + 6.0 * u(id, s + 1)).toFloat
    val phi = (-math.Pi + 2 * math.Pi * u(id, s + 2)).toFloat
    val charge = if (u(id, s + 3) < 0.5) -1 else 1
    // Cumulative working points: loose(bit0) ⊇ medium(bit2 ⇒ bits 0..2).
    val idpass = if (u(id, s + 4) < 0.7) 7 else 1
    val isopass = if (u(id, s + 5) < 0.7) 7 else 1
    Particle(pt, eta, phi, 0.105f, charge, idpass, isopass)
  }

  private def genJet(id: Long, s: Long): Jet = {
    val pt = (20.0 + 180.0 * u(id, s)).toFloat
    val eta = (-4.0 + 8.0 * u(id, s + 1)).toFloat
    val phi = (-math.Pi + 2 * math.Pi * u(id, s + 2)).toFloat
    val btag = if (u(id, s + 3) < 0.3) 7 else 0
    Jet(pt, eta, phi, 10f, btag)
  }

  def event(id: Long): Event = {
    val nMu = (u(id, 100) * 4).toInt      // 0..3
    val nEl = (u(id, 200) * 3).toInt      // 0..2
    val nJet = (u(id, 300) * 6).toInt     // 0..5
    val mus = (0 until nMu).map(i => genParticle(id, 1000 + i * 10)).sortBy(-_.pt)
    val els = (0 until nEl).map(i => genParticle(id, 2000 + i * 10)).sortBy(-_.pt)
    val jets = (0 until nJet).map(i => genJet(id, 3000 + i * 10)).sortBy(-_.pt)
    val met = Met((120.0 * u(id, 400)).toFloat, (-math.Pi + 2 * math.Pi * u(id, 401)).toFloat)
    Event(id, 1.0 + u(id, 500), els, mus, jets, Seq(met))
  }

  /** Distributed event frame. The repartition matters: a bare local
    * relation would let Catalyst's ConvertToLocalRelation fold downstream
    * projections into an eager, single-threaded, interpreted driver-side
    * evaluation (measured 75+ s for the 66-plot pass on 20k events); the
    * exchange keeps the analysis distributed and codegen'd, like a real
    * file source. */
  def dataFrame(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.createDataset((0L until n.toLong).map(event)).toDF()
      .repartition(spark.sparkContext.defaultParallelism)
  }
}
