package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.streaming.EventStream

/** Streaming/batch agreement: every incremental pipeline must reproduce its
  * batch twin when driven over the same static parquet. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  // The file stream source requires a DIRECTORY — stage the single parquet
  // into a temp dir (symlink; testdata is read-only).
  private lazy val eventsPath: String = {
    import java.nio.file._
    val dir = Files.createTempDirectory("graft_events_stream")
    Files.createSymbolicLink(dir.resolve("events.parquet"),
      Paths.get(s"$sf0001/events.parquet"))
    dir.toString
  }
  private lazy val batch = graft.core.Tables.events(spark, sf0001)

  test("readEvents starts cleanly on an initially-empty source directory") {
    // a normal streaming start state: the query opens before any file has
    // landed; the ts-shape sniff must fall back to the declared schema
    // instead of throwing "unable to infer schema"
    val dir = java.nio.file.Files.createTempDirectory("graft_events_empty")
    val stream = EventStream.readEvents(spark, dir.toString)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("windowed counts: streaming equals batch") {
    val stream = EventStream.windowedCounts(EventStream.readEvents(spark, eventsPath))
    val got = EventStream.runToMemory(spark, stream, "win_counts")
      .select($"win_start", $"event_type", $"n", round($"sum_value", 6).as("sv"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val exp = batch
      .groupBy(window($"ts", "5 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 6).as("sv"))
      .select(unix_timestamp($"w.start"), $"event_type", $"n", $"sv")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got == exp)
    assert(got.nonEmpty)
  }

  test("windowed distinct (HLL): streaming registers equal the q106 batch twin; corrected estimates track exact") {
    val stream = EventStream.windowedDistinctUsers(EventStream.readEvents(spark, eventsPath))
    val got = EventStream.runToMemory(spark, stream, "wdu")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val q106 = graft.operators.Streams.defs.find(_.name == "q106_windowed_distinct").get
      .build(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got.nonEmpty)
    assert(got == q106,
      s"stream vs batch registers: ${got.toSet diff q106.toSet} / ${q106.toSet diff got.toSet}")
    // sink-side read path: daily n ≈ 11–15 ≪ 2.5m, so the corrected
    // (linear-counting) estimate applies; ±25% covers its ~4σ at this n
    // plus the integer-V granularity of m·ln(m/V)
    val est = graft.operators.Sketches.hllEstimateCorrected(
      spark.table("wdu").select(col("win_start").as("grp"), col("reg"), col("rho")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = batch.groupBy(window($"ts", "1 day").as("w"))
      .agg(countDistinct($"user_id").as("n"))
      .select(unix_timestamp($"w.start"), $"n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty)
    for ((w, n) <- exact)
      assert(math.abs(est(w) / n - 1.0) < 0.25, s"window $w: est ${est(w)} vs exact $n")
  }

  test("session windows: streaming equals batch session_window, and matches q54 session counts") {
    val stream = EventStream.sessionWindows(EventStream.readEvents(spark, eventsPath))
    val got = EventStream.runToMemory(spark, stream, "sessions")
    val gotPerUser = got.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cross-check against the lag/cumsum sessionization (q54)
    val q54 = graft.operators.Streams.defs.find(_.name == "q54_sessionization").get
      .build(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotPerUser == q54,
      s"session_window vs gap-SQL mismatch: ${gotPerUser.toSet diff q54.toSet}")
  }

  test("stream-stream interval join equals the batch interval join") {
    val stream = EventStream.purchaseClickJoin(EventStream.readEvents(spark, eventsPath))
    val got = EventStream.runToMemory(spark, stream, "ssj", OutputMode.Append())
      .select("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val clicks = batch.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("click_ts"), $"event_id".as("click_id"))
    val purchases = batch.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("purchase_ts"), $"event_id".as("purchase_id"))
    val exp = purchases.join(clicks,
        expr("""p_user = c_user AND
                click_ts >= purchase_ts - INTERVAL 30 MINUTES AND
                click_ts < purchase_ts"""))
      .select("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exp.nonEmpty && got == exp)
  }

  test("stream dedup drops nothing on an already-unique stream") {
    val stream = EventStream.dedupStream(EventStream.readEvents(spark, eventsPath))
    val got = EventStream.runToMemory(spark, stream, "dedup", OutputMode.Append())
    assert(got.count() == batch.count())
  }

  test("streaming reference dedup equals the batch q71 result (exact at fpp 0.5)") {
    import java.nio.file._
    val dir = Files.createTempDirectory("graft_docs_stream")
    Files.createSymbolicLink(dir.resolve("documents.parquet"),
      Paths.get(s"$sf0001/documents.parquet"))
    val fp = graft.functions.TextOps.fingerprint($"text")
    val ref = graft.core.Tables.documents(spark, sf0001)
      .filter($"doc_id" % 10 === 0).select(fp.as("fp"))
    val stream = EventStream.readDocuments(spark, dir.toString)
      .filter($"doc_id" % 10 =!= 0)
      .select($"doc_id", fp.as("fp"))
    // absurd fpp: half the stream routes through the verification join —
    // the result must still be the exact anti-join
    val deduped = EventStream.dedupAgainstReference(stream, ref, "fp", 100L, 0.5)
    val got = EventStream.runToMemory(spark, deduped, "refdedup", OutputMode.Append())
      .select($"doc_id").as[Long].collect().toSet
    val exp = SparkEntry.queries("q71_bloom_refdedup")(spark, sf0001)
      .select($"doc_id").as[Long].collect().toSet
    assert(exp.nonEmpty && got == exp)
  }

  test("trending terms: streaming census equals batch; top-k ranking agrees") {
    import java.nio.file._
    val dir = Files.createTempDirectory("graft_docs_trend")
    Files.createSymbolicLink(dir.resolve("documents.parquet"),
      Paths.get(s"$sf0001/documents.parquet"))
    // synthetic event time: one document per minute → several 10-min windows
    def withTs(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", timestamp_micros($"doc_id" * 60000000L))
    val census = EventStream.runToMemory(spark,
      EventStream.trendingTerms(withTs(EventStream.readDocuments(spark, dir.toString))),
      "trend_census")
    val batchCensus = withTs(graft.core.Tables.documents(spark, sf0001))
      .select($"ts", explode(graft.functions.TextOps.tokens($"text")).as("term"))
      .groupBy(window($"ts", "10 minutes").as("w"), $"term")
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp($"w.start").as("win_start"), $"term", $"n")
    def toSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(toSet(census).nonEmpty && toSet(census) == toSet(batchCensus))
    // ranking layer: k rows per window, deterministic tie-break, n ordered
    val top = EventStream.topTermsPerWindow(census, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    val byWin = top.groupBy(_._1)
    assert(byWin.values.forall(_.length == 3))
    for ((_, rows) <- byWin) {
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._4).sliding(2).forall { case Array(a, b) => a >= b })
    }
    // the scaladoc's scale claim: the rank filter must reach the map side
    // as a WindowGroupLimit below the exchange (k rows per partition
    // cross the wire, not every (window, term) count)
    val rankPlan = EventStream.topTermsPerWindow(batchCensus, k = 3)
      .queryExecution.executedPlan.toString
    assert(rankPlan.contains("WindowGroupLimit"), rankPlan)
  }

  test("drift monitor: TV per window is exact on a hand-computed case; zero on identity") {
    // window census: [a, a, b, c] -> p = {a: .5, b: .25, c: .25}
    // reference:     {a: .5, b: .5}
    // TV = (|.5-.5| + |.25-.5| + |.25-0|) / 2 = 0.25   (all binary-exact)
    val counts = Seq((600L, "a", 2L), (600L, "b", 1L), (600L, "c", 1L))
      .toDF("win_start", "term", "n")
    val ref = Seq(("a", 0.5), ("b", 0.5)).toDF("term", "p_ref")
    val row = EventStream.driftPerWindow(counts, ref).collect()
    assert(row.map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq ==
      Seq((600L, 0.25, 4L)))
    // identical distribution -> exactly zero drift
    val self = Seq(("a", 0.5), ("b", 0.25), ("c", 0.25)).toDF("term", "p_ref")
    assert(EventStream.driftPerWindow(counts, self).head().getDouble(1) == 0.0)
  }

  test("drift monitor composes with the streaming census on real documents") {
    import java.nio.file._
    val dir = Files.createTempDirectory("graft_docs_drift")
    Files.createSymbolicLink(dir.resolve("documents.parquet"),
      Paths.get(s"$sf0001/documents.parquet"))
    def withTs(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", timestamp_micros($"doc_id" * 60000000L))
    val census = EventStream.runToMemory(spark,
      EventStream.trendingTerms(withTs(EventStream.readDocuments(spark, dir.toString))),
      "drift_census")
    val ref = EventStream.tokenDistribution(graft.core.Tables.documents(spark, sf0001))
    val drift = EventStream.driftPerWindow(census, ref).collect()
    assert(drift.length > 1)
    // TV is a metric on distributions: in [0, 1], and the reference built
    // from the SAME corpus keeps every window's drift strictly below 1
    assert(drift.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) < 1.0))
    // window totals must re-add to the corpus token count
    val totTokens = graft.core.Tables.documents(spark, sf0001)
      .agg(sum(graft.functions.TextOps.tokenCount($"text"))).head().getLong(0)
    assert(drift.map(_.getLong(2)).sum == totTokens)
  }

  test("streaming neighbor alerts equal the batch LSH candidate/verify twin") {
    import java.nio.file._
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_emb_stream")
    Files.createSymbolicLink(dir.resolve("embeddings.parquet"),
      Paths.get(s"$sf0001/embeddings.parquet"))
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    // 4-bit cells, like q91: at sf0.001 (50 vectors) 8-bit cells leave
    // every vector alone in its bucket and no alert can fire
    val signs = graft.functions.VectorOps.rademacherSigns(4, 64, seed = 91)
    val staticIndex = graft.core.Tables.embeddings(spark, sf0001)
    val stream = EventStream.neighborAlerts(
      spark.readStream.schema(schema).parquet(dir.toString), staticIndex,
      signs, tau = 0.4)
    val got = EventStream.runToMemory(spark, stream, "nn_alerts", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the SAME stateless operator over the static frame is the batch twin
    val batchTwin = EventStream.neighborAlerts(staticIndex, staticIndex, signs, tau = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty && got == batchTwin)
    // alerts are genuinely verified: every emitted cosine clears τ
    assert(got.forall(_._3 >= 0.4))
  }

  test("probed-bucket alerts prune the partitioned index to the batch's buckets and equal the full-join twin") {
    import java.nio.file._
    val signs = graft.functions.VectorOps.rademacherSigns(4, 64, seed = 91)
    val staticIndex = graft.core.Tables.embeddings(spark, sf0001)
    val idxDir = Files.createTempDirectory("graft_bucket_idx").toString
    EventStream.writeBucketIndex(staticIndex, signs, idxDir)
    // one micro-batch: a slice of the corpus, probing a strict subset of
    // the occupied buckets (the pruning must be non-vacuous)
    val batch = staticIndex.filter($"vec_id" < 8)
    val got = EventStream.probedNeighborAlerts(batch, idxDir, signs, tau = 0.1)
    val gotRows = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val twin = EventStream.neighborAlerts(batch, staticIndex, signs, tau = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(twin.nonEmpty, "fixture regression: no same-bucket pair clears tau")
    assert(gotRows == twin)
    // the index read touched ONLY probed bucket directories, and fewer
    // than the index occupies — path-level pruning, no predicate needed
    val probed = batch.select(
        graft.functions.VectorOps.literalSignature($"embedding", signs).as("b"))
      .distinct().collect().map(_.getLong(0)).toSet
    val readBuckets = got.inputFiles.toSeq
      .filter(_.contains("bucket="))
      .map(f => f.split("bucket=")(1).split("/")(0).toLong).toSet
    val occupied = new java.io.File(idxDir).listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName.stripPrefix("bucket=").toLong).toSet
    assert(readBuckets.subsetOf(probed))
    assert(readBuckets.size < occupied.size,
      s"pruning is vacuous: batch probes $readBuckets of occupied $occupied")
    // empty batch → empty frame with the alert schema, no read at all
    val empty = EventStream.probedNeighborAlerts(batch.limit(0), idxDir, signs, tau = 0.1)
    assert(empty.columns.toSeq == Seq("q_id", "n_id", "cos") && empty.count() == 0)
    // end-to-end in its documented seat: foreachBatch over a file stream
    val sdir = Files.createTempDirectory("graft_emb_stream_pb")
    Files.createSymbolicLink(sdir.resolve("embeddings.parquet"),
      Paths.get(s"$sf0001/embeddings.parquet"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.types.StructField("label", org.apache.spark.sql.types.IntegerType)))
    val acc = scala.collection.mutable.Set[(Long, Long, Double)]()
    val q = spark.readStream.schema(schema).parquet(sdir.toString)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        acc.synchronized {
          acc ++= EventStream.probedNeighborAlerts(b, idxDir, signs, tau = 0.4)
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    // the boolean matters (ADVICE r11): on a timeout the query is still
    // running and acc is partially filled — fail with the real cause, not
    // a confusing set-inequality
    assert(q.awaitTermination(120000), "stream did not finish within 120 s")
    val fullTwin = EventStream.neighborAlerts(staticIndex, staticIndex, signs, tau = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(acc.toSet == fullTwin)
  }

  test("salted bucket index (saltBuckets > 1): alert parity, spread write tasks, writer guards") {
    import java.nio.file._
    val signs = graft.functions.VectorOps.rademacherSigns(4, 64, seed = 91)
    val staticIndex = graft.core.Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding")
    // planted null embedding: the writer must DROP it rather than write a
    // bucket=__HIVE_DEFAULT_PARTITION__ directory the reader's bucket-name
    // parse would choke on (ADVICE r11, both halves)
    val withNull = staticIndex.unionByName(
      Seq(-1L).toDF("vec_id").select($"vec_id",
        lit(null).cast("array<float>").as("embedding")))
    val idxDir = Files.createTempDirectory("graft_bucket_idx_salt").toString
    EventStream.writeBucketIndex(withNull, signs, idxDir, saltBuckets = 8)
    val dirs = new java.io.File(idxDir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("bucket=")))
    assert(!dirs.exists(_.contains("__HIVE_DEFAULT_PARTITION__")),
      s"null embedding leaked into a partition directory: $dirs")
    // the salt spreads a populous bucket over >1 write task → >1 file in
    // its directory (files ∝ buckets × salt, the skew knob's whole point)
    val filesPerBucket = dirs.map(d =>
      new java.io.File(s"$idxDir/$d").listFiles()
        .count(_.getName.endsWith(".parquet")))
    assert(filesPerBucket.max > 1,
      s"salt had no effect: files per bucket = $filesPerBucket")
    // reader is salt-oblivious: identical alerts to the unsalted twin
    val batch = staticIndex.filter($"vec_id" < 8)
    val got = EventStream.probedNeighborAlerts(batch, idxDir, signs, tau = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val twin = EventStream.neighborAlerts(batch, staticIndex, signs, tau = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(twin.nonEmpty && got == twin)
    // writer mirrors the reader's planes guard (ADVICE r11): a >24-plane
    // index is rejected at WRITE time, before 2^planes directories exist
    val wide = graft.functions.VectorOps.rademacherSigns(25, 64, seed = 7)
    intercept[IllegalArgumentException] {
      EventStream.writeBucketIndex(staticIndex, wide,
        Files.createTempDirectory("graft_bucket_idx_wide").toString)
    }
  }

  test("stateless curation stages run unchanged on a stream (PII scrub + chunking)") {
    // The scrub/prep map stages are plain Column compositions — the SAME
    // operator objects drive readStream with no code changes, which is the
    // point of keeping them stateless.
    import java.nio.file._
    val dir = Files.createTempDirectory("graft_docs_stream2")
    Files.createSymbolicLink(dir.resolve("documents.parquet"),
      Paths.get(s"$sf0001/documents.parquet"))
    val stream = EventStream.readDocuments(spark, dir.toString)
    val piped = graft.operators.Curation.chunkDocuments(
      graft.operators.Compliance.redactPii(stream).select($"doc_id", $"redacted".as("text")),
      chunkTokens = 32, stride = 24)
    val got = EventStream.runToMemory(spark, piped, "scrub_chunks", OutputMode.Append())
      .select($"doc_id", $"chunk_id", $"chunk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val batchTwin = graft.operators.Curation.chunkDocuments(
      graft.operators.Compliance.redactPii(graft.core.Tables.documents(spark, sf0001))
        .select($"doc_id", $"redacted".as("text")),
      chunkTokens = 32, stride = 24)
      .select($"doc_id", $"chunk_id", $"chunk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got.nonEmpty && got == batchTwin)
  }

  test("streaming funnel state equals the q112 batch stage census") {
    val stream = EventStream.streamingFunnel(spark, EventStream.readEvents(spark, eventsPath))
    val got = EventStream.runToMemory(spark, stream, "funnel", OutputMode.Update())
    // Update mode: keep the last emission per user (several batches possible)
    val finalStates = got.withColumn("rn", monotonically_increasing_id())
      .groupBy($"user_id")
      .agg(max(struct($"rn", $"s_t", $"c_t", $"p_t")).as("s"))
      .select($"s.s_t", $"s.c_t", $"s.p_t")
    val streamCensus = finalStates.agg(
        count($"s_t").as("n_signup"),
        count($"c_t").as("n_click_after"),
        count($"p_t").as("n_purchase_after"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    val batchCensus = SparkEntry.queries("q112_funnel")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    assert(streamCensus == batchCensus && streamCensus._1 > 0,
      s"stream $streamCensus vs batch $batchCensus")
  }

  test("streaming attribution emissions equal the q167 batch census") {
    val stream = EventStream.streamingAttribution(spark,
      EventStream.readEvents(spark, eventsPath))
    val got = EventStream.runToMemory(spark, stream, "attr", OutputMode.Update())
    // each purchase emits exactly once (on the batch it arrives in), so
    // the per-touch census of ALL emissions is the batch census
    val streamCensus = got.groupBy($"touch").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = SparkEntry.queries("q167_last_touch_attribution")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamCensus == batch && streamCensus.values.sum > 0,
      s"stream $streamCensus vs batch $batch")
  }

  test("streaming multi-touch and decay emissions equal the q178/q180 batch censuses") {
    for ((decay, qname) <- Seq(false -> "q178_multitouch_attribution",
        true -> "q180_decay_attribution")) {
      val stream = EventStream.streamingMultiTouch(spark,
        EventStream.readEvents(spark, eventsPath), decay = decay)
      val got = EventStream.runToMemory(spark, stream,
        s"mt_attr_$decay", OutputMode.Update())
      // each purchase emits its credit rows exactly once, so summing ALL
      // emissions by touch replays the batch micro-credit census
      val streamCensus = got.groupBy($"touch").agg(sum($"credit").as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val batch = SparkEntry.queries(qname)(spark, sf0001)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(streamCensus == batch && streamCensus.values.sum > 0,
        s"$qname: stream $streamCensus vs batch $batch")
    }
  }

  test("streaming funnel across restarts: in-order batches advance the state machine") {
    import java.nio.file._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_funnel_ckpt").toString
    val out = Files.createTempDirectory("graft_funnel_out").toString
    val ms = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val ev = ms.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // the memory sink cannot recover from a checkpoint; foreachBatch can
    // (the cdcSnapshotSink restart shape) — append each batch's emissions
    // with its batchId so "latest state per user" is well-ordered
    def run(): Map[Long, (Option[Long], Option[Long], Option[Long])] = {
      val q = EventStream.streamingFunnel(spark, ev).writeStream
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          b.withColumn("batch_id", lit(id))
            .write.mode("append").parquet(out): Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val rows = spark.read.parquet(out).collect()
      rows.groupBy(_.getLong(0)).map { case (u, g) =>
        val r = g.maxBy(_.getLong(4))
        u -> ((Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long])))
      }
    }
    def ts(ms0: Long) = new java.sql.Timestamp(ms0)
    // batch 1: signup then click
    ms.addData((1L, ts(10), 7L, "signup", 0.0, "{}"), (2L, ts(20), 7L, "click", 0.0, "{}"))
    val s1 = run()
    assert(s1(7L) == ((Some(10000L), Some(20000L), None)))
    // batch 2 (restarted query, same checkpoint): the purchase converts
    ms.addData((3L, ts(30), 7L, "purchase", 0.0, "{}"))
    val s2 = run()
    assert(s2(7L) == ((Some(10000L), Some(20000L), Some(30000L))))
  }

  test("model-based quality filter scores a stream unchanged (stateless classifier)") {
    import java.nio.file._
    import graft.operators.TextAnalysis
    val dir = Files.createTempDirectory("graft_docs_clf")
    Files.createSymbolicLink(dir.resolve("documents.parquet"),
      Paths.get(s"$sf0001/documents.parquet"))
    val w = TextAnalysis.LQ.weights
    val stream = TextAnalysis.linearQualityFilter(
      EventStream.readDocuments(spark, dir.toString), w, TextAnalysis.LQ.Bias, tau = 0.0)
    val got = EventStream.runToMemory(spark, stream, "clf", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3))).toSet
    val batchTwin = TextAnalysis.linearQualityFilter(
      graft.core.Tables.documents(spark, sf0001), w, TextAnalysis.LQ.Bias, tau = 0.0)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3))).toSet
    assert(got.nonEmpty && got == batchTwin)
  }

  test("flatMapGroupsWithState running totals equal batch group totals") {
    val stream = EventStream.runningUserTotals(spark, EventStream.readEvents(spark, eventsPath))
    val got = EventStream.runToMemory(spark, stream, "totals", OutputMode.Update())
    // Update mode emits one row per key per batch; AvailableNow over a static
    // source may produce several batches — keep the last emission per key.
    val latest = got.withColumn("rn", monotonically_increasing_id())
      .groupBy($"user_id").agg(max(struct($"rn", $"n", $"total")).as("s"))
      .select($"user_id", $"s.n".as("n"), round($"s.total", 6).as("total"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exp = batch.groupBy($"user_id")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 6).as("total"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(latest == exp)
  }

  test("CDC snapshot sink: incremental merges across restarts equal the batch fold") {
    import java.nio.file._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val snapDir = Files.createTempDirectory("graft_cdc_snap").toString
    val ckptDir = Files.createTempDirectory("graft_cdc_ckpt").toString
    val ms = MemoryStream[(Long, String, Long, Boolean)]
    val updates = ms.toDF().toDF("k", "payload", "version", "deleted")

    // batch 1: two inserts
    ms.addData((1L, "a", 1L, false), (2L, "b", 1L, false))
    EventStream.cdcSnapshotSink(spark, updates, snapDir, ckptDir,
      Seq("k"), "version", Some("deleted")).awaitTermination()
    val s1 = EventStream.currentSnapshot(spark, snapDir).get
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 == Map(1L -> "a", 2L -> "b"))

    // batch 2 (a RESTARTED query on the same checkpoint): update k=1,
    // delete k=2, insert k=3 — latest-wins + tombstone semantics
    ms.addData((1L, "a2", 2L, false), (2L, "b", 2L, true), (3L, "c", 1L, false))
    EventStream.cdcSnapshotSink(spark, updates, snapDir, ckptDir,
      Seq("k"), "version", Some("deleted")).awaitTermination()
    val s2 = EventStream.currentSnapshot(spark, snapDir).get
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(s2 == Map(1L -> (("a2", 2L)), 3L -> (("c", 1L))))

    // the streamed result must equal folding the same two batches in batch
    val b1 = Seq((1L, "a", 1L, false), (2L, "b", 1L, false))
      .toDF("k", "payload", "version", "deleted")
    val b2 = Seq((1L, "a2", 2L, false), (2L, "b", 2L, true), (3L, "c", 1L, false))
      .toDF("k", "payload", "version", "deleted")
    import graft.operators.Maintenance
    val fold1 = Maintenance.upsertLatest(b1.limit(0), b1, Seq("k"), "version", Some("deleted"))
      .withColumn("deleted", lit(false))
    val folded = Maintenance.upsertLatest(fold1, b2, Seq("k"), "version", Some("deleted"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(s2 == folded)

    // pointer commit hygiene: the temp-then-rename swap must leave no
    // ._LATEST.tmp-* residue, and _LATEST must name the NEWEST v<batch> dir
    val names = new java.io.File(snapDir).list().toSeq
    assert(!names.exists(_.startsWith("._LATEST.tmp")), s"tmp residue in $names")
    val newest = names.filter(_.matches("v\\d+")).maxBy(_.drop(1).toLong)
    assert(Files.readString(Paths.get(snapDir, "_LATEST")) == newest)

    // retention: vacuum keepLast=1 deletes every version but the newest,
    // and the snapshot read through the pointer is untouched
    val deleted = EventStream.vacuumSnapshots(spark, snapDir, keepLast = 1)
    val after = new java.io.File(snapDir).list().toSeq.filter(_.matches("v\\d+"))
    assert(after == Seq(newest), s"expected only $newest after vacuum, got $after")
    assert(deleted.nonEmpty && !deleted.contains(newest))
    val reread = EventStream.currentSnapshot(spark, snapDir).get
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(reread == s2)

    // pinned-version protection: a lagging _LATEST (crashed commit between
    // write and swap) must never be vacuumed out from under readers
    val lagDir = Files.createTempDirectory("graft_cdc_lag").toString
    for (v <- Seq("v0", "v1", "v2")) {
      Files.createDirectories(Paths.get(lagDir, v))
      Files.writeString(Paths.get(lagDir, v, "marker"), v)
    }
    Files.writeString(Paths.get(lagDir, "_LATEST"), "v0")
    val lagDeleted = EventStream.vacuumSnapshots(spark, lagDir, keepLast = 1)
    val lagAfter = new java.io.File(lagDir).list().toSeq
      .filter(_.matches("v\\d+")).sorted
    assert(lagAfter == Seq("v0", "v2"), s"pinned v0 must survive: $lagAfter")
    assert(lagDeleted == Seq("v1"))
  }

  test("windowed CMS: streaming cells equal the batch sketch per window; probe bounds exact") {
    import java.nio.file._
    val dir = Files.createTempDirectory("graft_docs_cms")
    Files.createSymbolicLink(dir.resolve("documents.parquet"),
      Paths.get(s"$sf0001/documents.parquet"))
    val params = graft.operators.Sketches.cmsParams(4, seed = 17)
    val w = 64
    def withTs(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", timestamp_micros($"doc_id" * 60000000L))
    val cells = EventStream.runToMemory(spark,
      EventStream.windowedSketchCounts(
        withTs(EventStream.readDocuments(spark, dir.toString)), w, params),
      "cms_cells")
    // batch twin: per window, Sketches.countMin over that window's hashed terms
    val batchTerms = withTs(graft.core.Tables.documents(spark, sf0001))
      .select(unix_timestamp(window($"ts", "10 minutes").getField("start")).as("win_start"),
        explode(graft.functions.TextOps.tokens($"text")).as("term"))
      .select($"win_start",
        pmod(xxhash64($"term"), lit(graft.operators.Sketches.P)).as("hk"))
    val wins = batchTerms.select($"win_start").distinct().collect().map(_.getLong(0))
    assert(wins.length > 1)
    def cellSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val streamed = cellSet(cells)
    val batch = wins.flatMap { ws =>
      graft.operators.Sketches.countMin(
        batchTerms.filter($"win_start" === ws).select($"hk"), "hk", w, params)
        .collect().map(r => (ws, r.getInt(0), r.getLong(1), r.getLong(2)))
    }.toSet
    assert(streamed == batch)
    // sink-side probe is one-sided vs the exact windowed census
    val watch = Seq("table", "sort", "no_such_term")
    val est = EventStream.probeWindowedSketch(cells, watch, w, params).collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    val exact = withTs(graft.core.Tables.documents(spark, sf0001))
      .select(unix_timestamp(window($"ts", "10 minutes").getField("start")).as("win_start"),
        explode(graft.functions.TextOps.tokens($"text")).as("term"))
      .filter($"term".isin(watch: _*))
      .groupBy($"win_start", $"term").count().collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    assert(exact.nonEmpty)
    exact.foreach { case (k, n) => assert(est(k) >= n, s"$k: est ${est(k)} < exact $n") }
    assert(est.keys.count(_._2 == "no_such_term") == wins.length)
    // the bounded-windows contract fails loudly, never an unbounded collect
    val e = intercept[IllegalArgumentException] {
      EventStream.probeWindowedSketch(cells, watch, w, params, maxWindows = 1)
    }
    assert(e.getMessage.contains("monitoring horizon"), e.getMessage)
  }
}
