package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables
import graft.functions.VectorOps
import graft.operators.IvfIndex
import graft.streaming.EventStream

/** Round-11 directive 3: the honest near-dup corpus through the STREAMING
  * composition — the axis the r10 batch probes never exercised. Every base
  * embedding gets r−1 DISTINCT perturbed near-twins (the SemDupScale
  * recipe: cosine within a family ≈ 1, byte-identity never holds), and the
  * twin corpus arrives as a FILE STREAM in micro-batches:
  *
  *  1. `neighborAlerts` stream-static against the static base index —
  *     alert fan ∝ stream × family-members-in-index. Stateless by design,
  *     so the scaling axis is the per-batch join fan, not state: LSH
  *     bucket sizing follows the SemDup rule (4 + ⌈log2 r⌉ sign bits keeps
  *     expected bucket occupancy flat; the fixed-4-bit naive variant is
  *     measured at the small rung to show what the rule buys).
  *  2. exactly-once index ingest ([[IvfIndex.appendStream]]) of the whole
  *     twin stream, then a RESTART REPLAY (checkpoint wiped) that must add
  *     zero rows — the r8 spec contract, now at 16×/64× scale — with
  *     segment counts/bytes reported as the "state" the sink accretes.
  *  3. `neighborAlerts` against the GROWN index (base + ingested twins):
  *     the full honest fan, output ∝ stream × r.
  *
  * Numbers → SCALING.md §Round-11. Rungs via SPARK_GRAFT_SCALE_REPS
  * (default "16,64").
  */
object StreamNearDupScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[snd] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def duMb(path: String): Double = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
      walk(new java.io.File(path)) / 1e6
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def readStreamOf(dir: String) = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 4).parquet(dir)
    /** Drain a streaming frame through foreachBatch, counting rows. */
    def drain(label: String, alerts: DataFrame): Long = {
      val n = new LongAdder
      time(label) {
        val q = alerts.writeStream
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            n.add(b.count()); ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      println(s"[snd]   $label rows=${n.sum()}")
      n.sum()
    }
    val reps = sys.env.get("SPARK_GRAFT_SCALE_REPS")
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(16, 64))
    val base = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val ne = base.count()
    println(s"[snd] base = $ne vectors ($sfDir)")
    val baseIdx = java.nio.file.Files.createTempDirectory("snd_base_idx").toString
    time("build static base index")(IvfIndex.build(spark, base, baseIdx))
    for (r <- reps) {
      val embs = (0 until r).map { j =>
          // cast back to float: the perturbation arithmetic widens to
          // double, and the stream schema (matching the fixture) is float
          val e = if (j == 0) col("embedding")
            else transform(col("embedding"), (x, i) =>
              when(i === lit(j % 64), x + lit(0.001f) * (j + 1)).otherwise(x))
              .cast("array<float>")
          base.select((col("vec_id") + lit(j * 10L * ne)).as("vec_id"), e.as("embedding"))
        }
        .reduce(_ union _)
      val srcDir = java.nio.file.Files.createTempDirectory(s"snd_src_$r").toString
      embs.repartition(16).write.mode("overwrite").parquet(srcDir)
      println(s"[snd] corpus ${r}x = ${spark.read.parquet(srcDir).count()} streamed vectors, 4 micro-batches")

      // (1) alerts vs the STATIC base index, bucket bits per the SemDup rule
      val bits = 4 + (math.log(r.toDouble) / math.log(2.0)).ceil.toInt
      val sized = VectorOps.rademacherSigns(bits, 64, seed = 91)
      drain(s"neighborAlerts vs static base ($bits-bit) ${r}x",
        EventStream.neighborAlerts(readStreamOf(srcDir), base, sized, tau = 0.9))
      if (r <= 16) // the naive fixed-size quantizer, for the rule's delta
        drain(s"neighborAlerts vs static base (4-bit naive) ${r}x",
          EventStream.neighborAlerts(readStreamOf(srcDir), base,
            VectorOps.rademacherSigns(4, 64, seed = 91), tau = 0.9))

      // (2) exactly-once ingest of the twin stream + restart replay
      val idxDir = java.nio.file.Files.createTempDirectory(s"snd_idx_$r").toString
      val ckpt = java.nio.file.Files.createTempDirectory(s"snd_ckpt_$r").toString
      IvfIndex.build(spark, base, idxDir)
      time(s"exactly-once ingest ${r}x") {
        IvfIndex.appendStream(spark, idxDir, readStreamOf(srcDir), ckpt)
          .awaitTermination()
      }
      val served = IvfIndex.indexFrame(spark, idxDir).count()
      val segs = IvfIndex.sealedSegments(spark, idxDir)
      println(f"[snd]   served=$served (expect ${ne * (r + 1)}), " +
        f"segments=${segs.length}, index=${duMb(idxDir)}%.1f MB, ckpt=${duMb(ckpt)}%.1f MB")
      require(served == ne * (r + 1), "ingest lost or duplicated rows")
      deleteRecursively(new java.io.File(ckpt))
      time(s"restart replay (wiped checkpoint) ${r}x") {
        IvfIndex.appendStream(spark, idxDir, readStreamOf(srcDir), ckpt)
          .awaitTermination()
      }
      val replayed = IvfIndex.indexFrame(spark, idxDir).count()
      require(replayed == served, s"replay duplicated rows: $served -> $replayed")
      println(s"[snd]   replay added ${replayed - served} rows (exactly-once holds at ${r}x)")

      // (3) alerts vs the GROWN index: the full honest stream-static fan
      drain(s"neighborAlerts vs grown index ($bits-bit) ${r}x",
        EventStream.neighborAlerts(readStreamOf(srcDir),
          IvfIndex.indexFrame(spark, idxDir).select(col("vec_id"), col("embedding")),
          sized, tau = 0.9))

      // (4) the at-scale seat (r11): a TRICKLE of queries — the realistic
      // trigger shape, stream ≪ index — against the grown index, first as
      // the plain stream-static join (full index scan EVERY trigger), then
      // through writeBucketIndex + probedNeighborAlerts (per-trigger reads
      // limited to the batch's probed bucket directories, by path). Alerts
      // must agree; the reported file fraction is the per-trigger index
      // I/O the pruning buys, which at 100 TB is the whole game.
      val grown = IvfIndex.indexFrame(spark, idxDir)
        .select(col("vec_id"), col("embedding"))
      val trickleDir = java.nio.file.Files.createTempDirectory(s"snd_trickle_$r").toString
      spark.read.parquet(srcDir).filter(col("vec_id") % 201 === 0)
        .repartition(8).write.mode("overwrite").parquet(trickleDir)
      def trickleStream() = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(trickleDir)
      val nq = spark.read.parquet(trickleDir).count()
      println(s"[snd]   trickle = $nq queries in ~8 single-file triggers")
      val fullRows = drain(s"trickle vs grown index FULL-SCAN join ${r}x",
        EventStream.neighborAlerts(trickleStream(), grown, sized, tau = 0.9))
      val bIdx = java.nio.file.Files.createTempDirectory(s"snd_bidx_$r").toString
      time(s"writeBucketIndex (grown, $bits-bit) ${r}x") {
        EventStream.writeBucketIndex(grown, sized, bIdx)
      }
      val idxFiles = {
        def walk(f: java.io.File): Long =
          if (f.isDirectory) f.listFiles().map(walk).sum
          else if (f.getName.endsWith(".parquet")) 1L else 0L
        walk(new java.io.File(bIdx))
      }
      val probedRows = new LongAdder
      val filesRead = new LongAdder
      val batches = new LongAdder
      time(s"trickle vs grown index PROBED-BUCKET reads ${r}x") {
        val q = trickleStream().writeStream
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            val a = EventStream.probedNeighborAlerts(b.toDF(), bIdx, sized, tau = 0.9)
            probedRows.add(a.count())
            filesRead.add(a.inputFiles.count(_.contains("bucket=")))
            batches.add(1L); ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      println(f"[snd]   probed rows=${probedRows.sum()} (full-scan twin $fullRows), " +
        f"index files read ${filesRead.sum()} of ${batches.sum() * idxFiles} " +
        f"(${100.0 * filesRead.sum() / math.max(1L, batches.sum() * idxFiles)}%.1f%% of a " +
        f"full-scan-per-trigger read)")
      require(probedRows.sum() == fullRows,
        s"probed-bucket alerts diverge: ${probedRows.sum()} vs $fullRows")

      deleteRecursively(new java.io.File(srcDir))
      deleteRecursively(new java.io.File(idxDir))
      deleteRecursively(new java.io.File(ckpt))
      deleteRecursively(new java.io.File(trickleDir))
      deleteRecursively(new java.io.File(bIdx))
    }
    spark.stop()
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete(); ()
  }
}
