package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins — the manual fallback when AQE's
  * skew-join splitting isn't available or a key is pathologically hot.
  *
  * `saltedJoin` spreads each hot key of the LARGE side over `buckets`
  * synthetic sub-keys (deterministic salt from a row hash) and replicates
  * the SMALL side once per bucket, so a single reducer never receives a
  * whole hot key's rows. Replication cost: |small| × buckets rows —
  * appropriate when the small side is dimension-sized but above the
  * broadcast threshold, and the large side's key distribution is skewed.
  * Correctness: inner equi-join semantics are preserved exactly (every
  * (large, small) key match meets in exactly one salt bucket).
  */
object Skew {

  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      largeKey: Column,
      smallKey: Column,
      buckets: Int): DataFrame = {
    require(buckets > 1, "need at least 2 salt buckets")
    // Deterministic per-row salt on the large side: spreads a hot key's
    // rows across `buckets` reducers. xxhash64 over the whole row via its
    // columns keeps it stable across retries.
    val salted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col).toSeq: _*), lit(buckets)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    salted.join(replicated,
        largeKey === smallKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
