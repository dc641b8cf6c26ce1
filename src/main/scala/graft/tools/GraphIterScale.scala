package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Round-12 directive 3: extend the reliable-checkpoint measurement beyond
  * CC. `spark.graft.checkpointDir` was measured load-bearing only for
  * `connectedComponents` (r11: 384x OOMs under localCheckpoint at any
  * heap, completes reliable) — the OTHER iterative graph families share
  * the per-round `Lineage.cut` contract but claim CENSUS-sized round
  * state. This probe runs the q120b LPA cells ladder (and kCore +
  * PageRank, the two remaining shapes: per-round EDGE cuts and static
  * edge cut + |V| round churn) at 64x-256x in whichever mode the env
  * selects, so SCALING.md §R12 can record the family map with numbers:
  *
  *  - pair/edge-proportional per-round cuts (CC, kCore): need the knob
  *    past the ~4e8-edge-row single-JVM yardstick;
  *  - static edge cut + census round churn (PageRank, HITS, LPA,
  *    seedDistances): mode-invariant until the static cut hits that wall;
  *  - census-only (pcaTopK, k-means): never knob-bound.
  *
  * Edge ladder: the q120b LSH-cell candidate graph over sf0.1 embeddings
  * ([[Graph.lpaCellEdges]] — the production community-pass shape),
  * replicated rx with SHIFTED node ids (disjoint copies: V and E scale
  * linearly, communities replicate, LPA/kCore answers per copy are
  * identical — checked via invariant counts across rungs). A background
  * sampler records PEAK block-manager residency (mem + disk) so the
  * census-vs-edge round-state claim is measured, not asserted.
  *
  * The sf0.1 cell graph is tiny (134 base edges — every rung through
  * 256x is a few MB of blocks), so the "big" ops probe the SAME family
  * claims at the scale where they bind: a deterministic circulant
  * lattice (node i ~ i+1..i+k mod n; SPARK_GRAFT_GRAPH_N nodes, default
  * 1e7, SPARK_GRAFT_GRAPH_K=8 → 8e7 undirected edges — the order of the
  * CC yardstick) where LPA's per-round blocks should stay |V|-sized
  * while kCore's are the full E-sized edge set every peel.
  *
  * Modes: default = localCheckpoint; SPARK_GRAFT_CKPT_DIR=<dir> =
  * reliable checkpoint files (the NearDupScale convention). Rungs via
  * SPARK_GRAFT_SCALE_REPS (default "64,128,256"), ops via
  * SPARK_GRAFT_SCALE_OPS ⊆ {lpa, kcore, pagerank, lpabig, kcorebig,
  * prbig} (default the three ladder ops).
  */
object GraphIterScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val b = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = sys.env.get("SPARK_GRAFT_CKPT_DIR")
      .fold(b)(d => b.config(graft.core.Lineage.ConfKey, d)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mode = if (sys.env.contains("SPARK_GRAFT_CKPT_DIR")) "reliable"
      else "localCheckpoint"

    // peak block-manager residency sampler: the round-state claim is about
    // what LIVES in executor storage mid-run, which a post-hoc snapshot
    // misses (rounds release eagerly)
    val peakMem = new java.util.concurrent.atomic.AtomicLong(0)
    val peakDisk = new java.util.concurrent.atomic.AtomicLong(0)
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val infos = spark.sparkContext.getRDDStorageInfo
        val m = infos.map(_.memSize).sum
        val d = infos.map(_.diskSize).sum
        var c = peakMem.get; while (m > c && !peakMem.compareAndSet(c, m)) c = peakMem.get
        var e = peakDisk.get; while (d > e && !peakDisk.compareAndSet(e, d)) e = peakDisk.get
        Thread.sleep(100)
      }
    })
    sampler.setDaemon(true); sampler.start()

    def time[T](label: String)(f: => T): T = {
      peakMem.set(0); peakDisk.set(0)
      // host channels per rung (r13 directive 2): single-run rungs are
      // only adjudicable host-vs-code when the row carries load1 + steal%
      val (r, secs, l1, steal) = HostLoad.measured(f)
      println(f"[graphiter] $label [$mode]: $secs%.2f s " +
        f"peakBlocks mem=${peakMem.get / 1e6}%.1f MB disk=${peakDisk.get / 1e6}%.1f MB " +
        f"(load1 $l1%.2f, steal $steal%.2f%%)")
      r
    }
    def measure(label: String, mk: => DataFrame): Long = {
      val n = time(label)(mk.groupBy().count().head().getLong(0))
      println(s"[graphiter]   $label rows=$n")
      n
    }

    val reps = sys.env.get("SPARK_GRAFT_SCALE_REPS")
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(64, 128, 256))
    val ops: Set[String] = sys.env.get("SPARK_GRAFT_SCALE_OPS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set("lpa", "kcore", "pagerank"))

    val e0 = Graph.lpaCellEdges(spark, sfDir)
      .repartition(32).localCheckpoint(true)
    val ne = e0.count()
    val off = e0.agg(max(greatest(col("a_id"), col("b_id")))).head().getLong(0) + 1L
    println(s"[graphiter] base q120b cell-edge graph = $ne edges ($sfDir), id offset $off")

    for (r <- reps) {
      val eR = (0 until r).map(i => e0.select(
          (col("a_id") + lit(i * off)).as("a_id"),
          (col("b_id") + lit(i * off)).as("b_id")))
        .reduce(_ unionAll _).repartition(32).localCheckpoint(true)
      println(s"[graphiter] edges ${r}x = ${eR.count()}")

      if (ops("lpa"))
        measure(s"q120b labelPropagation(iters=${Graph.KnnGraph.LpaIters}) ${r}x",
          Graph.labelPropagation(eR, "a_id", "b_id", Graph.KnnGraph.LpaIters))
      if (ops("kcore"))
        measure(s"kCore(k=3, rounds=6) ${r}x",
          Graph.kCore(eR, "a_id", "b_id", 3))
      if (ops("pagerank"))
        measure(s"pageRank(5 iters) ${r}x",
          Graph.pageRank(eR.withColumn("w", lit(1.0)), "a_id", "b_id", "w", 5))

      eR.unpersist()
    }

    if (ops("lpabig") || ops("kcorebig") || ops("prbig")) {
      val n = sys.env.getOrElse("SPARK_GRAFT_GRAPH_N", "10000000").toLong
      val k = sys.env.getOrElse("SPARK_GRAFT_GRAPH_K", "8").toInt
      // circulant lattice: connected, degree 2k, deterministic — E = n·k
      // undirected edges with no construction shuffle (range + explode)
      val big = spark.range(n).select(col("id").as("a_id"),
          explode(sequence(lit(1), lit(k))).as("j"))
        .select(col("a_id"), ((col("a_id") + col("j")) % n).as("b_id"))
        .repartition(32).localCheckpoint(true)
      println(s"[graphiter] circulant n=$n k=$k: ${big.count()} directed edge rows")
      if (ops("lpabig"))
        measure(s"labelPropagation(iters=2) circulant n=$n",
          Graph.labelPropagation(big, "a_id", "b_id", 2))
      if (ops("kcorebig"))
        measure(s"kCore(k=3, rounds=3) circulant n=$n",
          Graph.kCore(big, "a_id", "b_id", 3, rounds = 3))
      if (ops("prbig"))
        measure(s"pageRank(3 iters) circulant n=$n",
          Graph.pageRank(big.withColumn("w", lit(1.0)), "a_id", "b_id", "w", 3))
      big.unpersist()
    }
    sampling = false
    spark.stop()
  }
}
