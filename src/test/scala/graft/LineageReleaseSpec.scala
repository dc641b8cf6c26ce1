package graft

import graft.core.{Lineage, Tables}
import graft.operators.{Dedup, Graph, Similarity}
import org.apache.spark.sql.DataFrame

/** The round-9 block-hygiene contract (VERDICT r8 finding 1): every
  * iterative operator must RELEASE the superseded round's lineage-cut
  * blocks, so live block-manager storage per query is O(1), not
  * O(rounds) — in a long shared session (the bench, a notebook) the old
  * behavior piled every prior iterative query's dead localCheckpoint
  * blocks onto the next one's executors, the prime suspect for the r8
  * q97 late-bench slowdown.
  *
  * These specs measure `sc.getPersistentRDDs` directly: the map entry is
  * removed synchronously by `unpersist`, so counts are deterministic
  * (suites run sequentially in the forked test JVM — `Test / fork := true`
  * with sbt's default non-parallel forked execution). */
class LineageReleaseSpec extends SparkSpec {
  import spark.implicits._
  import graft.core.Lineage.CutOps

  private def sc = spark.sparkContext

  /** Run `build`, fully materialize its result, and return
    * (live-cut-frame delta, result row count). Releases the result frame
    * afterwards so specs leave the shared session clean. */
  private def liveDelta(build: => DataFrame): (Int, Long) = {
    val before = sc.getPersistentRDDs.keySet
    val out = build
    val n = out.count()
    val live = (sc.getPersistentRDDs.keySet -- before).size
    Lineage.release(out)
    out.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ =>
    }
    (live, n)
  }

  test("release: drops a cut frame's blocks (true) and no-ops on a plain frame (false)") {
    // delta-SET based, not count based: in a long shared-session suite the
    // async ContextCleaner can GC an OLD frame between the two reads and
    // shrink the raw count under us (observed as a full-suite-only flake)
    val before = sc.getPersistentRDDs.keySet
    val cut = Seq(1, 2, 3).toDF("x").cutLineage()
    assert((sc.getPersistentRDDs.keySet -- before).size == 1)
    assert(Lineage.release(cut), "release on a cut frame must return true")
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty,
      "unpersist must remove the persistentRdds entry synchronously")
    assert(!Lineage.release(Seq(1).toDF("x")),
      "release on an un-cut frame must be a no-op returning false")
  }

  test("pageRank: live checkpoint storage is O(1) in iterations, not O(rounds)") {
    val edges = Seq((1, 2, 1.0), (2, 3, 2.0), (3, 1, 1.0), (3, 4, 1.0),
      (4, 5, 1.0), (5, 1, 3.0), (6, 1, 1.0)).toDF("src", "dst", "w")
    def run(iters: Int) =
      liveDelta(Graph.pageRank(edges, "src", "dst", "w", iters))
    val (d2, n2) = run(2)
    val (d10, n10) = run(10)
    assert(n2 == 6 && n10 == 6)
    assert(d2 == d10, s"live cut frames must not grow with rounds: $d2 vs $d10")
    assert(d2 <= 1, s"only the returned frame's blocks may survive, got $d2")
  }

  test("labelPropagation + seedDistances + kCore: only the result survives") {
    val chain = (0L to 9L).map(i => (i, i + 1)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("node")
    val (dL, _) = liveDelta(Graph.labelPropagation(chain, "src", "dst", iters = 6))
    assert(dL <= 1, s"LPA left $dL live cut frames")
    val (dS, _) = liveDelta(
      Graph.seedDistances(chain, "src", "dst", seeds, iters = 6))
    assert(dS <= 1, s"seedDistances left $dS live cut frames")
    val (dK, _) = liveDelta(Graph.kCore(chain, "src", "dst", k = 1, rounds = 4))
    // kCore's return is lazy over the final peel — that one cut survives
    assert(dK <= 1, s"kCore left $dK live cut frames")
  }

  test("hits: two surviving frames (h and a), independent of iterations") {
    val edges = Seq((1, 2, 1.0), (2, 3, 1.0), (3, 1, 2.0)).toDF("src", "dst", "w")
    def run(iters: Int) =
      liveDelta(Graph.hits(edges, "src", "dst", "w", iters))._1
    val (d2, d6) = (run(2), run(6))
    assert(d2 == d6, s"live cut frames must not grow with rounds: $d2 vs $d6")
    assert(d2 <= 2, s"only h and a may survive, got $d2")
  }

  test("connectedComponents: convergence loop releases every superseded labeling") {
    // chain of 12 → needs several pointer-doubling rounds
    val pairs = (0L to 11L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val (d, n) = liveDelta(Dedup.connectedComponents(pairs))
    assert(n == 13)
    assert(d <= 1, s"CC left $d live cut frames")
  }

  test("pcaTopK: deflation rounds release superseded censuses") {
    val embs = Tables.embeddings(spark, sf0001).limit(64)
    val (d, n) = liveDelta(Similarity.pcaTopK(embs, k = 3, iters = 4))
    assert(n > 0)
    // k cut `out` frames survive (the returned union reads them); every
    // cov census, power-iteration round, and the cut tr must be gone
    assert(d <= 3, s"pcaTopK left $d live cut frames (expected <= k = 3)")
  }
}
