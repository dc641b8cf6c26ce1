package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Dedup, Fuzzy}

/** Round-10 directive: the HONEST near-dup axis the r9 identical-copy
  * probes deliberately skipped. Every document gets r−1 textually DISTINCT
  * mutated near-twins:
  *
  *  - documents: copy j appends one twin-specific token (`nd<j>`) — any
  *    two copies of an n-token doc share n−2 of n shingles, so J = (n−2)/n
  *    ≥ 0.8 for n ≥ 10 and every (r choose 2) pair inside a twin family is
  *    a TRUE near-dup pair;
  *  - titles (q110): copy j substitutes one character at a j-dependent
  *    position — any two copies differ in ≤ 2 positions, so lev ≤ 2 and
  *    every family pair qualifies.
  *
  * By construction the identity collapse is VACUOUS (zero byte-identical
  * texts): rep pairs = true pairs ∝ corpus × r², the regime a real web
  * crawl presents and exactly where the r9 forced broadcasts would have
  * shipped a corpus-proportional frame to every executor (q46
  * broadcast(cand) = pair-sized, dedupCorpus broadcast(labels) = one row
  * per paired doc). After the r10 un-hinting, AQE is free to pick shuffle
  * joins here — each measurement prints the FINALIZED join census (from
  * the same execution that produced the count; static explain lies under
  * AQE) so SCALING.md records the choice alongside pair counts and times.
  *
  * Ladder via SPARK_GRAFT_SCALE_REPS (default "1,16,64"), corpus via
  * SPARK_GRAFT_SF_DIR (default sf0.1 = 5000 base docs → 64× ≈ 320k docs,
  * ≈ 10M true pairs). Numbers recorded in SCALING.md §Round-10.
  */
object NearDupScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val b = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // opt into RELIABLE lineage cuts (graft.core.Lineage) — the
    // 1000-executor deployment shape: round state goes to checkpoint
    // FILES instead of executor block storage. On the big corpusbl rungs
    // the localCheckpoint default holds pair-proportional edge blocks in
    // the one local JVM's heap alongside the verify joins' execution
    // memory — measured OOM at 384×/80g — while the reliable mode trades
    // that heap residency for disk.
    val spark = sys.env.get("SPARK_GRAFT_CKPT_DIR")
      .fold(b)(d => b.config(graft.core.Lineage.ConfKey, d)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // straggler witness (r12 directive 1): the longest single task seen
    // since the last reset — a mega-bucket funneled into one window task
    // shows up here as one task's duration approaching the stage's wall
    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0)
    // per-stage task census: (tasks, total ms, max ms) keyed by stageId —
    // a long max task means nothing without knowing WHICH stage and how
    // its siblings fared (straggler vs genuinely serial stage)
    val stageStats = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Long)]()
    // min-free-disk sampler (r13 directive 1): the bucket-local tiers'
    // claim is a corpus-bounded footprint — "free disk never moving" must
    // be a measured series per rung, not a post-hoc glance (a transient
    // spill peak between samples of a manual `df` check would hide)
    val minFree = new java.util.concurrent.atomic.AtomicLong(Long.MaxValue)
    @volatile var diskSampling = true
    val tmpDir = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    val diskSampler = new Thread(() => {
      while (diskSampling) {
        val f = tmpDir.getUsableSpace
        var c = minFree.get
        while (f < c && !minFree.compareAndSet(c, f)) c = minFree.get
        Thread.sleep(200)
      }
    })
    diskSampler.setDaemon(true); diskSampler.start()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val d = if (t.taskInfo != null) t.taskInfo.duration else 0L
        var c = maxTaskMs.get
        while (d > c && !maxTaskMs.compareAndSet(c, d)) c = maxTaskMs.get
        stageStats.merge(t.stageId, (1L, d, d), (a, b) =>
          (a._1 + b._1, a._2 + b._2, math.max(a._3, b._3)))
      }
    })
    def time[T](label: String)(f: => T): T = {
      maxTaskMs.set(0); stageStats.clear()
      val free0 = tmpDir.getUsableSpace; minFree.set(free0)
      // host channels per rung (r13 directive 2): single-run rungs are
      // only adjudicable host-vs-code when the row carries load1 + steal%
      val (r, secs, l1, steal) = HostLoad.measured(f)
      println(f"[neardup] $label: $secs%.2f s " +
        f"(longest task ${maxTaskMs.get / 1e3}%.1f s, " +
        f"load1 $l1%.2f, steal $steal%.2f%%, " +
        f"disk free ${free0 / 1e9}%.1f -> min ${minFree.get / 1e9}%.1f GB)")
      import scala.jdk.CollectionConverters._
      val top = stageStats.asScala.toSeq.sortBy(-_._2._3).take(3)
      top.foreach { case (sid, (n, tot, mx)) =>
        println(f"[neardup]     stage $sid: tasks=$n max=${mx / 1e3}%.1f s " +
          f"mean=${tot / math.max(n, 1) / 1e3}%.1f s total=${tot / 1e3}%.1f s")
      }
      r
    }
    /** One execution: timed count through the frame's own aggregate, then
      * the finalized adaptive plan's join census from that execution.
      * `mk` is BY-NAME and built inside the timed block: dedupCorpus runs
      * its CC fixpoint EAGERLY at construction (driver-looped cuts), so an
      * eagerly-evaluated argument would silently exclude CC from the time. */
    def measure(label: String, mk: => DataFrame): Long = {
      val (cnt, n) = time(label) {
        val c = mk.groupBy().count()
        // collect(), NEVER head() (r13): head(n) runs a SEPARATE limit(n)
        // QueryExecution, so the join census below would read the STATIC
        // plan (isFinalPlan=false) — the r12 censuses printed through
        // head() under-reported AQE's actual join choices
        (c, c.collect()(0).getLong(0))
      }
      val p = cnt.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val joins = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
        .map(j => s"$j=${p.linesIterator.count(_.contains(j))}").mkString(" ")
      println(s"[neardup]   $label rows=$n  joins: $joins")
      n
    }
    val reps = sys.env.get("SPARK_GRAFT_SCALE_REPS")
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(1, 16, 64))
    // op selection (r11): rungs past 64× are run op-by-op — the default
    // verify tier is EXPECTED to hit the disk wall there (the named
    // output-proportional boundary), so it must be optable-out rather than
    // killing the whole ladder. Keys: q46, q46bl (bucket-local verify),
    // corpus, corpusbl, q104, q136, refdedup, q110.
    val ops: Set[String] = sys.env.get("SPARK_GRAFT_SCALE_OPS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set("q46", "q104", "corpus", "q136", "refdedup", "q110"))
    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val nd = base.count()
    println(s"[neardup] base corpus = $nd docs ($sfDir)")
    for (r <- reps) {
      // distinct near-twins: j = 0 is the original, j >= 1 appends nd<j>
      val docs = (0 until r).map { j =>
          val t = if (j == 0) col("text")
            else concat(col("text"), lit(s" nd$j"))
          base.select((col("doc_id") + lit(j * 10L * nd)).as("doc_id"), t.as("text"))
        }
        .reduce(_ union _).repartition(32).localCheckpoint(true)
      println(s"[neardup] corpus ${r}x = ${docs.count()} docs (all texts distinct)")

      if (ops("q46"))
        measure(s"q46 minhashLshPairs ${r}x", Dedup.minhashLshPairs(docs, 4, 5))
      // r11 directive: the bucket-local verify tier — shuffle ∝ corpus ×
      // bands, pair-proportional rows are 32 bytes — on the rungs where the
      // default tier's array-at-pair-cardinality shuffle hits the disk wall
      if (ops("q46bl"))
        measure(s"q46 minhashLshPairs BUCKET-LOCAL ${r}x",
          Dedup.minhashLshPairs(docs, 4, 5, bucketLocalVerify = true))
      // r12 directive 1: CAPPED bucket-local with a planted 10k-member
      // NEAR-identical class (distinct texts — the identity collapse is
      // vacuous, so ~10k-occupancy band buckets genuinely reach the
      // survival census). The de-windowed census must shed them without a
      // straggler task dominating the stage (the `longest task` print is
      // the witness; the old count() OVER (PARTITION BY band, sig) would
      // buffer each mega-bucket in one window task).
      if (ops("q46blcap")) {
        val megaBase = base.orderBy(col("doc_id")).limit(1)
          .select(col("text")).localCheckpoint(true)
        val mega = megaBase
          .select(explode(sequence(lit(0L), lit(9999L))).as("j"), col("text"))
          .select((lit(900000000L) + col("j")).as("doc_id"),
            concat(col("text"), lit(" mg"), col("j")).as("text"))
        val withMega = docs.unionByName(mega).localCheckpoint(true)
        measure(s"q46 BUCKET-LOCAL capped(512) + 10k mega-class ${r}x",
          Dedup.minhashLshPairs(withMega, 4, 5, maxBucket = 512,
            bucketLocalVerify = true))
        withMega.unpersist()
      }
      // r12: the DEFAULT tier's capBuckets got the same de-windowing (the
      // census anti-join replaces count() OVER (PARTITION BY band, sig)) —
      // same planted mega-class witness: the ~10k-occupancy buckets must
      // shed via the map-side census, not straggle in one window task
      if (ops("q46cap")) {
        val megaBase = base.orderBy(col("doc_id")).limit(1)
          .select(col("text")).localCheckpoint(true)
        val mega = megaBase
          .select(explode(sequence(lit(0L), lit(9999L))).as("j"), col("text"))
          .select((lit(900000000L) + col("j")).as("doc_id"),
            concat(col("text"), lit(" mg"), col("j")).as("text"))
        val withMega = docs.unionByName(mega).localCheckpoint(true)
        measure(s"q46 DEFAULT capped(512) + 10k mega-class ${r}x",
          Dedup.minhashLshPairs(withMega, 4, 5, maxBucket = 512))
        withMega.unpersist()
      }
      if (ops("q104"))
        measure(s"q104 prefixJaccardPairs ${r}x", Dedup.prefixJaccardPairs(docs, 4, 5))
      // r12 directive 4, the "or implement it" arm: the bucket-local
      // PREFIX tier — exact like q104, shuffle ∝ corpus × prefix length
      // like the minhash bucket-local tier — on the rungs where the
      // default prefix verify hits the pair-proportional scratch wall
      if (ops("q104bl"))
        measure(s"q104 prefixJaccardPairs BUCKET-LOCAL ${r}x",
          Dedup.prefixJaccardPairs(docs, 4, 5, bucketLocalVerify = true))
      // r13 directive 1: the ladder's cross-check rung — materialize BOTH
      // bucket-local tiers (prefix = exact, minhash = banding-miss budget)
      // to parquet and diff the pair sets. The exact tier must be a
      // SUPERSET (spurious = 0 always — minhash verifies exact Jaccard
      // too); missed = the realized banding miss at this corpus, the
      // number `bandingFor` budgets. Writes go to parquet (not
      // localCheckpoint) so 10⁸-pair sets never live in the probe JVM's
      // block storage next to the verify joins' execution memory.
      if (ops("q104blx")) {
        def mat(label: String, mk: => DataFrame): DataFrame = {
          val dir = s"/tmp/graft_nd_pairs_${label.replaceAll("[^a-zA-Z0-9]", "_")}"
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
          time(s"$label (materialize)") {
            mk.select(col("a_id"), col("b_id"))
              .write.mode("overwrite").parquet(dir)
          }
          spark.read.parquet(dir)
        }
        val pfx = mat(s"q104 prefix BUCKET-LOCAL ${r}x",
          Dedup.prefixJaccardPairs(docs, 4, 5, bucketLocalVerify = true))
        val mh = mat(s"q46 minhash BUCKET-LOCAL ${r}x",
          Dedup.minhashLshPairs(docs, 4, 5, bucketLocalVerify = true))
        val np = pfx.count(); val nm = mh.count()
        val missed = pfx.join(mh, Seq("a_id", "b_id"), "left_anti").count()
        val spurious = mh.join(pfx, Seq("a_id", "b_id"), "left_anti").count()
        println(s"[neardup]   cross-check ${r}x: prefix=$np minhash=$nm " +
          s"bandingMiss=$missed spurious=$spurious")
        require(spurious == 0L,
          s"minhash tier emitted pairs the exact tier lacks: $spurious")
      }
      // r13 directive 3: the prefix bucket-local tier's planted
      // mega-family witness — 10k DISTINCT-text near-identical docs (the
      // q46cap construction: identity collapse is vacuous). In the PREFIX
      // scheme each member's df=1 variant shingles head its rarity-ordered
      // prefix, but the remaining ~p−ShingleN slots are the family's
      // SHARED rare base shingles — so those buckets go ~10k deep
      // (Σ occ² ≈ p·10⁸ combos) and, because every family pair shares the
      // same first-shared base hash, the election funnels all C(10k,2)
      // surviving verifications into ONE bucket = one SMJ task. This op
      // measures whether that degrades smoothly (fan model: combos are
      // thin-condition cheap; the single-task verify is the open question)
      // or cliffs — the scaladoc records the outcome either way.
      if (ops("q104blmega")) {
        val megaBase = base.orderBy(col("doc_id")).limit(1)
          .select(col("text")).localCheckpoint(true)
        val mega = megaBase
          .select(explode(sequence(lit(0L), lit(9999L))).as("j"), col("text"))
          .select((lit(900000000L) + col("j")).as("doc_id"),
            concat(col("text"), lit(" mg"), col("j")).as("text"))
        val withMega = docs.unionByName(mega).localCheckpoint(true)
        measure(s"q104 prefix BUCKET-LOCAL + 10k mega-family ${r}x",
          Dedup.prefixJaccardPairs(withMega, 4, 5, bucketLocalVerify = true))
        withMega.unpersist()
      }
      if (ops("corpus"))
        measure(s"dedupCorpus survivors ${r}x", Dedup.dedupCorpus(docs, 4, 5))
      if (ops("corpusbl"))
        measure(s"dedupCorpus survivors BUCKET-LOCAL ${r}x",
          Dedup.dedupCorpus(docs, 4, 5, bucketLocalVerify = true))
      // containment's candidate filter is already a narrow chunk-count
      // census (shared*2 >= min chunks), so its honest-regime candidates
      // track TRUE containment pairs — array verification is output-bound,
      // the post-fix q104 shape; measured here to claim it
      if (ops("q136"))
        measure(s"q136 containmentPairs capped(4096) ${r}x",
          Dedup.containmentPairs(docs, maxChunkDocs = 4096))
      // cross-corpus decontamination where (almost) EVERY incoming doc
      // matches the reference: dupIds ∝ incoming — the corpus-proportional
      // frame whose broadcast hint r10 removed (cross-corpus q46 form)
      if (ops("refdedup"))
        measure(s"fuzzyReferenceDedup survivors ${r}x",
          Dedup.fuzzyReferenceDedup(docs, base, 4, 5))

      // q110 face: distinct one-char-mutated title twins, hot-key cap on
      if (ops("q110")) {
        val titles = (0 until r).map { j =>
            val t = if (j == 0) substring(col("text"), 1, 24)
              else concat(
                substring(col("text"), 1, (j % 20)),
                lit(('a' + j / 20).toChar.toString),
                substring(col("text"), (j % 20) + 2, 24 - (j % 20) - 1))
            base.select((col("doc_id") + lit(j * 10L * nd)).as("doc_id"), t.as("title"))
          }
          .reduce(_ union _).repartition(32).localCheckpoint(true)
        measure(s"q110 editDistancePairs capped(4096) ${r}x",
          Fuzzy.editDistancePairs(titles, "title", "doc_id",
            maxDist = 2, maxKeyCount = 4096))
        titles.unpersist()
      }
      // r12: the fuzzy variant cap's de-windowed census, witnessed with a
      // planted mega VARIANT bucket: 10k DISTINCT titles, each = the base
      // 23-char prefix with one char INSERTED at a j-dependent position
      // plus one char APPENDED (distinct (pos, c, d) triples — the
      // identity collapse is vacuous). Deleting the two planted chars maps
      // every one of them into the SAME deletion-variant bucket (~2.5x the
      // 4096 cap) — the census must shed that bucket map-side while the
      // per-(pos, c) sub-buckets (occupancy 26, under cap) still verify
      // their true lev-1 pairs
      if (ops("q110cap")) {
        val megaT = base.orderBy(col("doc_id")).limit(1)
          .select(substring(col("text"), 1, 23).as("t0")).localCheckpoint(true)
        val megaTitles = megaT
          .select(explode(sequence(lit(0L), lit(9999L))).as("j"), col("t0"))
          .select((lit(900000000L) + col("j")).as("doc_id"),
            expr("concat(" +
              "substring(t0, 1, 1 + CAST(j DIV 676 AS INT) % 15), " +
              "char(97 + CAST(j % 26 AS INT)), " +
              "substring(t0, 2 + CAST(j DIV 676 AS INT) % 15), " +
              "char(97 + CAST((j DIV 26) % 26 AS INT)))").as("title"))
        val titles = (0 until r).map { j =>
            val t = if (j == 0) substring(col("text"), 1, 24)
              else concat(
                substring(col("text"), 1, (j % 20)),
                lit(('a' + j / 20).toChar.toString),
                substring(col("text"), (j % 20) + 2, 24 - (j % 20) - 1))
            base.select((col("doc_id") + lit(j * 10L * nd)).as("doc_id"), t.as("title"))
          }
          .reduce(_ union _).unionByName(megaTitles)
          .repartition(32).localCheckpoint(true)
        measure(s"q110 editDistancePairs capped(4096) + 10k mega-variant ${r}x",
          Fuzzy.editDistancePairs(titles, "title", "doc_id",
            maxDist = 2, maxKeyCount = 4096))
        titles.unpersist()
      }

      docs.unpersist()
    }
    spark.stop()
  }
}
