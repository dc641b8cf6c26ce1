package graft

import org.apache.spark.sql.functions._
import graft.operators.Maintenance

/** snapshotDiff: presence vs payload-null semantics, null-safe payload
  * comparison, multi-column payloads. */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("added / removed / changed / unchanged classification, nulls included") {
    val oldSnap = Seq(
      (1L, Some("a")),  // unchanged
      (2L, Some("b")),  // changed
      (3L, Some("c")),  // removed
      (4L, None),       // NULL payload, unchanged (null <=> null)
      (5L, None)        // NULL → value: changed
    ).toDF("k", "p")
    val newSnap = Seq(
      (1L, Some("a")),
      (2L, Some("B")),
      (4L, None),
      (5L, Some("v")),
      (6L, Some("n"))   // added
    ).toDF("k", "p")
    val got = Maintenance.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "changed", 6L -> "added"))
  }

  test("multi-column payload: any differing column marks the key changed") {
    val oldSnap = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "p", "q")
    val newSnap = Seq((1L, "a", 10L), (2L, "b", 21L)).toDF("k", "p", "q")
    val got = Maintenance.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("p", "q"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("diff composes with upsertLatest: replaying the diff reconciles old to new") {
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "p")
    val newSnap = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "p")
    val diff = Maintenance.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("p"))
    // changelog from the diff: upserts for added/changed, tombstones for removed
    val changes = diff.filter($"status" =!= "unchanged")
      .join(newSnap.withColumnRenamed("p", "np"), Seq("k"), "left")
      .select($"k", $"np".as("p"), lit(1L).as("version"),
        ($"status" === "removed").as("del"))
    val base = oldSnap.select($"k", $"p", lit(0L).as("version"), lit(false).as("del"))
    val reconciled = Maintenance.upsertLatest(base, changes, Seq("k"), "version", Some("del"))
      .select($"k", $"p").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expect = newSnap.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(reconciled == expect)
  }
}
