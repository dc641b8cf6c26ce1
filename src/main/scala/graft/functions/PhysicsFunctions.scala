package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Physics expression library — Column compositions only, so every formula
  * stays inside Catalyst/whole-stage codegen (no UDFs; SURVEY.md §2.8, §2.11).
  *
  * Semantics follow the reference's DSL operators:
  *  - `deltaR` / `deltaPhi`: √(Δη² + Δφ²) with Δφ wrapped to (−π,π]
  *    (reference phaseII-analysis.py:315,324,334,335).
  *  - `invariantMass`: m² = (ΣE)² − |Σp⃗|² from (pt,eta,phi,mass) components
  *    (reference phaseII-analysis.py:331).
  *  - `inRange(lo,x,hi)`: exclusive range test (reference phaseII-analysis.py:353).
  *  - `passWorkingPoint`: bitmask test `x & (1<<bit) != 0`
  *    (reference phaseII-analysis.py:319,321,327,329,342).
  *
  * All functions accept either flat component columns or a `p4`-style struct
  * column with fields (pt, eta, phi, mass).
  */
object PhysicsFunctions {

  /** Δφ wrapped to (−π,π] via atan2(sin Δφ, cos Δφ) — branch-free, codegen-friendly. */
  def deltaPhi(phi1: Column, phi2: Column): Column =
    atan2(sin(phi1 - phi2), cos(phi1 - phi2))

  def deltaR(eta1: Column, phi1: Column, eta2: Column, phi2: Column): Column =
    sqrt(pow(eta1 - eta2, lit(2)) + pow(deltaPhi(phi1, phi2), lit(2)))

  /** ΔR between two (pt,eta,phi,mass) structs. */
  def deltaR(p4a: Column, p4b: Column): Column =
    deltaR(p4a("eta"), p4a("phi"), p4b("eta"), p4b("phi"))

  def px(pt: Column, phi: Column): Column = pt * cos(phi)
  def py(pt: Column, phi: Column): Column = pt * sin(phi)
  def pz(pt: Column, eta: Column): Column = pt * sinh(eta)

  /** E = √(m² + |p⃗|²), with |p⃗| = pt·cosh(eta). */
  def energy(pt: Column, eta: Column, mass: Column): Column =
    sqrt(pow(mass, lit(2)) + pow(pt * cosh(eta), lit(2)))

  /** Invariant mass of the sum of two 4-vectors from components.
    * m² is clamped at 0 before the sqrt to absorb float cancellation. */
  def invariantMass(
      pt1: Column, eta1: Column, phi1: Column, m1: Column,
      pt2: Column, eta2: Column, phi2: Column, m2: Column): Column = {
    val e = energy(pt1, eta1, m1) + energy(pt2, eta2, m2)
    val sx = px(pt1, phi1) + px(pt2, phi2)
    val sy = py(pt1, phi1) + py(pt2, phi2)
    val sz = pz(pt1, eta1) + pz(pt2, eta2)
    val m2sum = pow(e, lit(2)) - pow(sx, lit(2)) - pow(sy, lit(2)) - pow(sz, lit(2))
    sqrt(greatest(m2sum, lit(0.0)))
  }

  /** Invariant mass of two (pt,eta,phi,mass) structs. */
  def invariantMass(p4a: Column, p4b: Column): Column =
    invariantMass(
      p4a("pt"), p4a("eta"), p4a("phi"), p4a("mass"),
      p4b("pt"), p4b("eta"), p4b("phi"), p4b("mass"))

  /** Exclusive range test lo < x < hi (reference `op.in_range`). */
  def inRange(lo: Double, x: Column, hi: Double): Column =
    x > lit(lo) && x < lit(hi)

  /** Working-point bitmask test: bit `bit` set in packed quality mask. */
  def passWorkingPoint(mask: Column, bit: Int): Column =
    mask.bitwiseAND(lit(1 << bit)) =!= 0
}
