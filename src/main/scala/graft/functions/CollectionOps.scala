package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-event collection operators over array-of-struct columns.
  *
  * These are the Spark expression of the reference DSL's collection algebra
  * (SURVEY.md §2.2/§2.3/§2.4): chained selections compose as nested
  * higher-order `filter` calls that Catalyst collapses into one expression
  * tree — like the reference's lazy index-list views, no intermediate
  * collection is ever materialized (reference phaseII-analysis.py:306-344).
  * Everything is row-local: no shuffle, fully parallel at any scale.
  */
object CollectionOps {

  /** `op.select(coll, pred)` — filter a per-event collection, composable. */
  def selectWhere(arr: Column, pred: Column => Column): Column =
    filter(arr, pred)

  /** `op.rng_len` — collection count (reference phaseII-analysis.py:350,356,368). */
  def rngLen(arr: Column): Column = size(arr)

  /** `op.rng_any` — existential quantifier (reference phaseII-analysis.py:315,324). */
  def rngAny(arr: Column, pred: Column => Column): Column = exists(arr, pred)

  /** Universal quantifier (dual of rngAny). */
  def rngAll(arr: Column, pred: Column => Column): Column = forall(arr, pred)

  /** Sort a collection by a numeric struct field, descending (pt-ordering
    * guarantee the reference assumes from its producer; SURVEY.md §2.5). */
  def sortByDesc(arr: Column, field: String): Column =
    array_sort(arr, (l, r) =>
      when(l(field) > r(field), -1).when(l(field) < r(field), 1).otherwise(0))

  /** Top-k elements by a struct field (implicit top-k of SURVEY.md §2.6). */
  def topKBy(arr: Column, field: String, k: Int): Column =
    slice(sortByDesc(arr, field), 1, k)

  /** 0-based element access, mirroring the reference's `coll[i]`
    * (reference phaseII-analysis.py:331,350; jet_test.py:527-585). */
  def nth(arr: Column, i: Int): Column = element_at(arr, i + 1)

  def leading(arr: Column): Column = nth(arr, 0)
  def subleading(arr: Column): Column = nth(arr, 1)

  /** ΔR cross-cleaning — the reference's intra-event nested-loop anti-join:
    * keep elements of `arrA` with no element of `arrB` inside the ΔR cone
    * (reference phaseII-analysis.py:314-316,323-325,333-336). Both arrays
    * must be (pt,eta,phi,mass,...) structs. Row-local: outer lambda variable
    * is captured inside the inner `exists`. */
  def crossClean(arrA: Column, arrB: Column, maxDR: Double): Column =
    filter(arrA, a => !exists(arrB, b => PhysicsFunctions.deltaR(a, b) < lit(maxDR)))
}
