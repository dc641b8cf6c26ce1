package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability, wired into the driver's correctness gate.
  *
  * `build` constructs the DataFrame plan against the tables under `dir`
  * (a `/root/testdata/sf*` directory). `oracle`, when present, is the
  * ANSI-SQL equivalent the driver executes in DuckDB over the same Parquet
  * tables; result columns MUST carry identical names on both sides and both
  * sides order rows deterministically (every query ends in a total ORDER BY).
  *
  * Floating-point discipline: any aggregated double is wrapped in `round(x, n)`
  * on BOTH sides so that cross-engine summation-order differences (~1e-13
  * relative) cannot flip the hash; raw (unaggregated) doubles are passed
  * through untouched since both engines read identical bits from Parquet.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false,
    // gate = false keeps the query out of the driver's correctness gate
    // (Verify/queries) while still benching it when headline = true — for
    // production twins whose outputs are engine-specific by design (sketch
    // estimates) and whose semantics are pinned by a spec instead.
    gate: Boolean = true)

object QueryDef {
  /** Registry helper: modules expose `defs: Seq[QueryDef]`. */
  def toQueriesMap(all: Seq[QueryDef]): Map[String, (SparkSession, String) => DataFrame] =
    all.filter(_.gate).map(q => q.name -> q.build).toMap

  def toOracleMap(all: Seq[QueryDef]): Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
