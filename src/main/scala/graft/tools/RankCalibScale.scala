package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Curation

/** Round-13 directive 6: witness q115's skew-split claim. The r12
  * de-windowing of the rank normalization argued the (source, quality)
  * join-back is "a composite key AQE can skew-split, unlike a window
  * partition" — shipped on algebra alone. This probe plants the two skew
  * flavors the claim covers and records the task census for each shape:
  *
  *  - a MEGA-SOURCE holding ≥ half the corpus (source = "megasrc" on half
  *    the replicas): the composite key already spreads it across the
  *    quality dimension — no single join partition is source-sized;
  *  - a MEGA-CELL: one (source, quality) value pair holding ~1/4 of the
  *    corpus (hot copies of ONE doc, distinct ids, same text ⇒ same
  *    quantized quality) — the composite key cannot spread this; it is
  *    exactly what AQE's OptimizeSkewedJoin must split.
  *
  * Three measured shapes on the same planted corpus:
  *  1. `rankCalibration` as shipped — the census side is vocabulary-sized,
  *     so AQE picks a broadcast join-back: per-task work is uniform
  *     REGARDLESS of source distribution (the production shape; skew
  *     becomes a non-event before skew-splitting is even needed).
  *  2. `rankCalibration` with broadcasts disabled and the skew thresholds
  *     scaled to the probe corpus (defaults bind at 256 MB partitions —
  *     a probe-sized corpus never reaches them; production partitions
  *     do): the SMJ's mega-cell partition must come back as skewed
  *     AQEShuffleRead splits, task census balanced.
  *  3. The WINDOW form q115 replaced (percent_rank over a per-source
  *     window): the megasrc+hotcell partition funnels into ONE window
  *     task — the straggler the census shape exists to avoid.
  *
  * Env: SPARK_GRAFT_SCALE_REPS (default "64"), SPARK_GRAFT_HOT (default
  * 100000 hot-cell rows). Numbers → SCALING.md §R13.
  */
object RankCalibScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0)
    val stageStats = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Long)]()
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
      val (r, secs, l1, steal) = HostLoad.measured(f)
      println(f"[rankcalib] $label: $secs%.2f s " +
        f"(longest task ${maxTaskMs.get / 1e3}%.1f s, " +
        f"load1 $l1%.2f, steal $steal%.2f%%)")
      import scala.jdk.CollectionConverters._
      stageStats.asScala.toSeq.sortBy(-_._2._3).take(3).foreach {
        case (sid, (n, tot, mx)) =>
          println(f"[rankcalib]     stage $sid: tasks=$n max=${mx / 1e3}%.1f s " +
            f"mean=${tot / math.max(n, 1) / 1e3}%.1f s total=${tot / 1e3}%.1f s")
      }
      r
    }
    // force the full frame through an aggregate; return checksums so the
    // three shapes are also proven to agree on content, not just time.
    // doc_id MUST be referenced (bit_xor: exact, order-independent) — an
    // aggregate over only pr/cd lets column pruning strip doc_id from the
    // join, and the hot cell's remaining (source, quality) columns are
    // constants that lz4 compresses below any skew threshold: the planted
    // skew becomes invisible to AQE AND unrepresentative of production,
    // where the join output carries the ids downstream.
    def force(df: DataFrame): (Long, Double, Long) = {
      val r = df.agg(count(lit(1)), sum(col("pr")) + sum(col("cd")),
        expr("bit_xor(doc_id)")).head()
      (r.getLong(0), r.getDouble(1), r.getLong(2))
    }
    def joinCensus(df: DataFrame): String = {
      // plan must come from the EXECUTED aggregate (the finalized adaptive
      // plan) — and via collect(), NEVER head(): head(n) runs a SEPARATE
      // limit(n) QueryExecution, leaving this frame's AdaptiveSparkPlanExec
      // un-executed (isFinalPlan=false, every AQE decision invisible)
      // same aggregate as force(): the census is a separate execution, and
      // a count(1)-only probe would prune doc_id, deflate the hot cell's
      // compressed bytes, and read a DIFFERENT skew decision than the
      // timed run just took
      val c = df.agg(count(lit(1)), expr("bit_xor(doc_id)"))
      c.collect()
      val p = c.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val joins = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
        .map(j => s"$j=${p.linesIterator.count(_.contains(j))}").mkString(" ")
      val skewed = p.linesIterator.count(l =>
        l.toLowerCase.contains("skew"))
      // the join + shuffle lines verbatim: skew handling renders
      // differently across Spark versions (AQEShuffleRead "skewed",
      // SortMergeJoin "skew=true"), and the EXCHANGE partitionings tell
      // whether the join really co-partitions on the composite key or
      // reuses the window's source-only exchange — the raw lines are the
      // evidence
      val wantFull = sys.env.contains("SPARK_GRAFT_DUMP_PLAN")
      p.linesIterator.filter(l => wantFull || l.contains("AQEShuffleRead") ||
          l.contains("SortMergeJoin") || l.contains("Exchange") ||
          l.toLowerCase.contains("skew"))
        .foreach(l => println(s"[rankcalib]     plan| ${l.stripLineEnd.take(170)}"))
      s"$joins skewLines=$skewed"
    }

    // ---- mechanism CONTROL: a minimal hot-key SMJ where OptimizeSkewedJoin
    // is known to apply (thin two-table equi-join, one key holding half the
    // rows). If the control splits and rankCalibration's join does not, the
    // non-split is plan-shape-specific; if neither splits, it's config.
    {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "512k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")
      // the payload must be INCOMPRESSIBLE and must survive column
      // pruning: skew detection reads compressed map-output bytes, and a
      // constant/sequential hot partition lz4-compresses below any
      // threshold (a first control carrying only the constant key never
      // fired — 2M rows of zeros are a few KB of shuffle)
      val big = spark.range(0, 4000000L)
        .select(when(col("id") < 2000000L, lit(0L))
          .otherwise(col("id") % 1000).as("k"), xxhash64(col("id")).as("v"))
      val small = spark.range(0, 1000L)
        .select(col("id").as("k"), (col("id") * 2).as("w"))
      val j = big.join(small, "k")
        .agg(count(lit(1)), sum(col("w")), sum(col("v").cast("double")))
      // collect(), NEVER head(): head(n) runs a SEPARATE limit(n)
      // QueryExecution, so this frame's AdaptiveSparkPlanExec would stay
      // un-executed and the census below would read the STATIC plan
      // (isFinalPlan=false) — every AQE decision invisible
      j.collect()
      val p = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val skewed = p.linesIterator.count(_.toLowerCase.contains("skew"))
      println(s"[rankcalib] CONTROL hot-key SMJ: skewLines=$skewed")
      Seq("spark.sql.adaptive.enabled", "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes")
        .foreach(k => println(s"[rankcalib]     conf| $k=" +
          scala.util.Try(spark.conf.get(k)).getOrElse("<unset>")))
      val wantCtrlFull = sys.env.contains("SPARK_GRAFT_DUMP_PLAN")
      p.linesIterator.filter(l => wantCtrlFull || l.contains("SortMergeJoin") ||
          l.contains("AQEShuffleRead") || l.toLowerCase.contains("skew"))
        .foreach(l => println(s"[rankcalib]     ctrl| ${l.stripLineEnd.take(170)}"))
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    }

    val reps = sys.env.get("SPARK_GRAFT_SCALE_REPS")
      .map(_.trim.toInt).getOrElse(256)
    val hot = sys.env.getOrElse("SPARK_GRAFT_HOT", "2000000").toLong
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
    val nd = base.count()
    // 3/4 of the replicas become ONE mega source (≥ half the corpus even
    // after the hot-cell rows join), the rest keep organic sources
    val organic = (0 until reps).map { i =>
      val src = if (i < reps * 3 / 4) lit("megasrc") else col("source")
      base.select((col("doc_id") + lit(i * 10L * nd)).as("doc_id"),
        src.as("source"), col("text"))
    }.reduce(_ unionAll _)
    // the mega-CELL: `hot` distinct-id copies of one doc (same text ⇒ same
    // quantized quality ⇒ one (source, quality) census cell)
    // a SHORT hot text: qualityScore is length-proportional, and scoring
    // 2M copies of a long doc would bury the join-stage signal under a
    // scoring stage 100x the rest of the probe
    val hotDoc = base.orderBy(col("doc_id")).limit(1)
      .select(substring(col("text"), 1, 200).as("text")).localCheckpoint(true)
    // SCRAMBLED hot-cell ids (xxhash64, not 900000000+j): production ids
    // are not a delta-compressible run, and skew detection reads
    // COMPRESSED shuffle bytes — sequential ids understate the hot cell
    val hotRows = hotDoc
      .select(explode(sequence(lit(0L), lit(hot - 1))).as("j"), col("text"))
      .select(xxhash64(col("j"), lit("hotcell")).as("doc_id"),
        lit("hotcell").as("source"), col("text"))
    val docs = organic.unionByName(hotRows).repartition(32).localCheckpoint(true)
    val total = docs.count()
    val megaN = docs.filter(col("source") === "megasrc").count()
    println(s"[rankcalib] corpus = $total docs; megasrc=$megaN " +
      s"(${100 * megaN / total}%), hotcell=$hot (one (source,quality) cell)")

    // shape 1: as shipped (census join-back; AQE broadcasts the tiny side)
    val (n1, s1, x1) = time(s"rankCalibration DEFAULT ${reps}x+hot") {
      force(Curation.rankCalibration(docs))
    }
    println(s"[rankcalib]   default: rows=$n1 checksum=$s1 " +
      s"joins: ${joinCensus(Curation.rankCalibration(docs))}")

    // shape 2: broadcasts off, skew thresholds scaled to the probe corpus.
    // NOTE the thresholds act on COMPRESSED shuffle bytes (the hot cell's
    // constant source/quality columns compress ~10x), and production
    // partitions reach the 256 MB default on their own — a probe-sized
    // corpus never does, so the scaled thresholds witness the MECHANISM.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      sys.env.getOrElse("SPARK_GRAFT_SKEW_THRESH", "512k"))
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      sys.env.getOrElse("SPARK_GRAFT_SKEW_ADVISORY", "128k"))
    sys.env.get("SPARK_GRAFT_SKEW_FORCE").foreach(_ =>
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true"))
    val (n2, s2, x2) = time(s"rankCalibration FORCED-SMJ ${reps}x+hot") {
      force(Curation.rankCalibration(docs))
    }
    println(s"[rankcalib]   forced-SMJ: rows=$n2 checksum=$s2 " +
      s"joins: ${joinCensus(Curation.rankCalibration(docs))}")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")

    // shape 3: the window form q115 replaced — per-source partition, so
    // megasrc+hotcell each funnel into one window task
    def windowForm(d: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      d.select(col("doc_id"), col("source"),
          graft.functions.TextOps.qualityScore(col("text")).as("quality"))
        .select(col("doc_id"), col("source"), col("quality"),
          percent_rank().over(Window.partitionBy(col("source"))
            .orderBy(col("quality"))).as("pr"),
          cume_dist().over(Window.partitionBy(col("source"))
            .orderBy(col("quality"))).as("cd"))
    }
    val (n3, s3, x3) = time(s"WINDOW form (the replaced shape) ${reps}x+hot") {
      force(windowForm(docs))
    }
    println(s"[rankcalib]   window: rows=$n3 checksum=$s3")

    require(n1 == n2 && n2 == n3, s"row counts diverge: $n1 / $n2 / $n3")
    require(x1 == x2 && x2 == x3, s"id xors diverge: $x1 / $x2 / $x3")
    require(math.abs(s1 - s2) < 1e-6 && math.abs(s1 - s3) < 1e-6,
      s"checksums diverge: $s1 / $s2 / $s3")
    println(s"[rankcalib] all three shapes agree: rows=$n1 checksum=$s1")
    spark.stop()
  }
}
