package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables
import graft.functions.VectorOps
import graft.streaming.EventStream

/** Round-12 directive 5: measure the `writeBucketIndex` salt knob on a
  * SKEWED index — one bucket holding ~half the vectors (the 100 TB shape
  * the scaladoc names: a boilerplate/burst cluster whose bucket outgrows
  * one write task). Index = sf0.1 embeddings replicated `spread`x with
  * shifted ids (organic occupancy, scaled) PLUS `hot` copies of vector 0
  * (distinct ids, byte-identical embedding — all land in ONE bucket).
  *
  * Reported per salt setting: write wall time, longest single task (the
  * straggler witness — salt 1 writes the hot bucket in one task), files
  * in the hot bucket directory, then a probed read against the hot bucket
  * (alert count parity across layouts proves the reader is
  * salt-oblivious). Env: SPARK_GRAFT_SALTS (default "1,16"),
  * SPARK_GRAFT_HOT (default 250000), SPARK_GRAFT_SPREAD (default 125).
  */
object BucketSaltScale {
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
    // per-stage census (r13): a longest-task number alone cannot say WHICH
    // stage funnels — the write job has a scan+signature map stage, the
    // salted exchange, and the per-directory write tasks
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
      // host channels per rung (r13 directive 2)
      val (r, secs, l1, steal) = HostLoad.measured(f)
      println(f"[salt] $label: $secs%.2f s " +
        f"(longest task ${maxTaskMs.get / 1e3}%.1f s, " +
        f"load1 $l1%.2f, steal $steal%.2f%%)")
      import scala.jdk.CollectionConverters._
      stageStats.asScala.toSeq.sortBy(-_._2._3).take(3).foreach {
        case (sid, (n, tot, mx)) =>
          println(f"[salt]     stage $sid: tasks=$n max=${mx / 1e3}%.1f s " +
            f"mean=${tot / math.max(n, 1) / 1e3}%.1f s total=${tot / 1e3}%.1f s")
      }
      r
    }

    val hot = sys.env.getOrElse("SPARK_GRAFT_HOT", "250000").toLong
    val spread = sys.env.getOrElse("SPARK_GRAFT_SPREAD", "125").toInt
    val salts = sys.env.getOrElse("SPARK_GRAFT_SALTS", "1,16")
      .split(",").toSeq.map(_.trim.toInt)
    val signs = VectorOps.rademacherSigns(6, 64, seed = 91)

    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val nb = base.count()
    val organic = (0 until spread).map(i => base.select(
        (col("vec_id") + lit(i * 10L * nb)).as("vec_id"), col("embedding")))
      .reduce(_ unionAll _)
    val hotVec = base.orderBy(col("vec_id")).limit(1)
      .select(col("embedding")).localCheckpoint(true)
    // DISTINCT hot vectors (r13): positive per-copy scaling keeps every
    // copy in the SAME bucket (sign bits are scale-invariant) and at
    // cosine 1.0 with its siblings (alerts unchanged), but makes the
    // bytes real — 4M byte-IDENTICAL copies dictionary-encode to almost
    // nothing, which made the write wall vanish and let the salted files
    // coalesce into one read task (file packing), neither of which a
    // production hot bucket (distinct near-dup vectors) exhibits
    // spark.range (32 splits) x broadcast 1-row vector, NOT an explode
    // from one row: the jitter projection must not serialize in one task
    val hotRows = spark.range(hot).select(col("id").as("j"))
      .crossJoin(broadcast(hotVec))
      .select((lit(800000000L) + col("j")).as("vec_id"),
        transform(col("embedding"),
          x => (x.cast("double") * (lit(1.0) + col("j").cast("double") / lit(1e6)))
            .cast("float")).as("embedding"))
    // repartition BEFORE the checkpoint: the hot rows explode from ONE
    // row in one task, and an un-spread checkpoint would hand a single
    // 4M-row partition to the signature projection (r13: that partition
    // sat alone in the scan stage while 31 threads idled)
    val index = organic.unionByName(hotRows)
      .repartition(32).localCheckpoint(true)
    val total = index.count()
    val hotBucket = hotVec
      .select(VectorOps.literalSignature(col("embedding"), signs).as("b"))
      .head().getLong(0)
    println(s"[salt] index = $total vectors, $hot (~${100 * hot / total}%) in bucket $hotBucket")

    val counts = salts.map { s =>
      val dir = s"/tmp/graft_salt_idx_$s"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      time(s"writeBucketIndex salt=$s") {
        EventStream.writeBucketIndex(index, signs, dir, saltBuckets = s)
      }
      val hotFiles = new java.io.File(s"$dir/bucket=$hotBucket").listFiles()
        .count(_.getName.endsWith(".parquet"))
      println(s"[salt]   salt=$s: hot-bucket files=$hotFiles")
      // probed read against the hot bucket: 4 probes x hot members
      val batch = index.filter(col("vec_id").between(800000000L, 800000003L))
      val n = time(s"probedNeighborAlerts hot-bucket batch salt=$s") {
        EventStream.probedNeighborAlerts(batch, dir, signs, tau = 0.99)
          .groupBy().count().head().getLong(0)
      }
      println(s"[salt]   salt=$s: alerts=$n")
      n
    }
    require(counts.distinct.size == 1,
      s"reader not salt-oblivious: alert counts $counts")
    println(s"[salt] alert parity across salts: ${counts.head}")
    spark.stop()
  }
}
