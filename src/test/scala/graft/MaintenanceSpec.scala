package graft

import org.apache.spark.sql.functions._
import graft.operators.Maintenance

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("upsertLatest: latest-wins, delete markers suppress, untouched keys survive") {
    val base = Seq((1L, "a", 0L, false), (2L, "b", 0L, false), (3L, "c", 0L, false))
      .toDF("k", "v", "version", "del")
    val upd = Seq((2L, "b2", 1L, false), (3L, "c2", 1L, true), (4L, "d", 1L, false))
      .toDF("k", "v", "version", "del")
    val out = Maintenance.upsertLatest(base, upd, Seq("k"), "version", Some("del"))
      .select($"k", $"v", $"version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // 1 untouched, 2 updated, 3 deleted, 4 inserted
    assert(out == Set((1L, "a", 0L), (2L, "b2", 1L), (4L, "d", 1L)))
  }

  test("upsertLatest: highest version wins across multiple updates") {
    val base = Seq((1L, "v0", 0L)).toDF("k", "v", "version")
    val upd = Seq((1L, "v2", 2L), (1L, "v1", 1L), (1L, "v3", 3L)).toDF("k", "v", "version")
    val out = Maintenance.upsertLatest(base, upd, Seq("k"), "version")
      .select($"v").as[String].collect().toSeq
    assert(out == Seq("v3"))
  }

  test("zorderValue: known bit interleavings") {
    val df = Seq((3L, 1L), (2L, 3L), (0L, 0L), (65535L, 65535L)).toDF("a", "b")
    val z = df.select(Maintenance.zorderValue($"a", $"b", 16).as("z"))
      .as[Long].collect().toSeq
    // (3,1): a bits {0,1}→pos{0,2}=5; b bit {0}→pos{1}=2 → 7
    // (2,3): a bit {1}→pos{2}=4; b bits {0,1}→pos{1,3}=10 → 14
    // full 16-bit ones interleave to 2^32−1
    assert(z == Seq(7L, 14L, 0L, 4294967295L))
  }

  test("zorderValue: out-of-range input fails loudly instead of aliasing") {
    val df = Seq((70000L, 1L)).toDF("a", "b") // 70000 > 2^16
    val e = intercept[Exception] {
      df.select(Maintenance.zorderValue($"a", $"b", 16)).collect()
    }
    assert(e.getMessage.contains("zorderValue") ||
      Option(e.getCause).exists(_.getMessage.contains("zorderValue")), e.toString)
  }

  test("profileColumns: planted nulls/distincts, and ONE scan for all columns") {
    val df = Seq(
      (Some(1.0), Some(10.0)), (Some(2.0), None),
      (Some(2.0), Some(30.0)), (None, Some(10.0))).toDF("x", "y")
    val out = Maintenance.profileColumns(df, Seq("x", "y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(out("x") == ((4L, 1L, 2L, 1.0, 2.0)))
    assert(out("y") == ((4L, 1L, 2L, 10.0, 30.0)))
    // single scan: stack-unpivot + one aggregate, never a per-column pass
    val plan = Maintenance.profileColumns(
      graft.core.Tables.lineitem(spark, sf0001),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1,
      s"profiling must scan once:\n$plan")
    // and the scan reads only the profiled columns
    val schemaLine = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!schemaLine.contains("l_orderkey"), s"column pruning failed:\n$schemaLine")
  }

  test("zorder buckets: both dimensions stay range-local (the pruning property)") {
    val stats = SparkEntry.queries("q83_zorder_stats")(spark, sf0001).collect()
    assert(stats.length > 1, "expected multiple z-buckets")
    // a 14-bit bucket prefix leaves 7 low bits per dimension → spans < 128
    stats.foreach { r =>
      assert(r.getAs[Long]("a_max") - r.getAs[Long]("a_min") < 128, r.toString)
      assert(r.getAs[Long]("b_max") - r.getAs[Long]("b_min") < 128, r.toString)
    }
  }

  test("compactFiles: bin-packs small files to the byte target, preserves rows and sort") {
    import java.nio.file.Files
    val in = Files.createTempDirectory("graft_compact_in").toString
    val out = Files.createTempDirectory("graft_compact_out").toString + "/t"
    // 16 tiny files of ~25 rows each
    spark.range(400).select($"id", ($"id" % 7).as("grp"))
      .repartition(16).write.mode("overwrite").parquet(in)
    val bytes = new java.io.File(in).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val (before, after) = Maintenance.compactFiles(
      spark, in, out, targetBytes = (bytes + 2) / 3, sortCols = Seq("grp"))
    assert(before == 16)
    assert(after == 3, s"expected ceil(total/target)=3 output files, got $after")
    val got = spark.read.parquet(out)
    assert(got.count() == 400)
    assert(got.select(sum($"id")).first().getLong(0) == 399L * 400 / 2, "row content preserved")
    // clustering preserved: within every output file, grp is non-decreasing
    val perFile = got.select(input_file_name().as("f"), $"grp")
      .collect().groupBy(_.getString(0))
    assert(perFile.size == 3)
    // (round-robin repartition reorders rows; the sortWithinPartitions must
    // still leave each FILE internally sorted by grp)
    for ((_, rows) <- perFile) {
      val gs = rows.map(_.getLong(1))
      assert(gs.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
    }
  }

  test("compactFiles refuses outDir == inDir (overwrite would clobber the source mid-read)") {
    import java.nio.file.Files
    val in = Files.createTempDirectory("graft_compact_same").toString
    spark.range(10).write.mode("overwrite").parquet(in)
    // same dir under a different spelling must still be caught
    val e = intercept[IllegalArgumentException] {
      Maintenance.compactFiles(spark, in, in + "/", 1L << 20)
    }
    assert(e.getMessage.contains("must differ"))
  }

  test("compactFiles refuses a hive-partitioned root instead of flattening it") {
    import java.nio.file.Files
    val in = Files.createTempDirectory("graft_compact_part").toString
    spark.range(100).select($"id", ($"id" % 3).as("p"))
      .write.partitionBy("p").mode("overwrite").parquet(in)
    val e = intercept[IllegalArgumentException] {
      Maintenance.compactFiles(spark, in,
        Files.createTempDirectory("graft_compact_part_out").toString + "/t", 1L << 20)
    }
    assert(e.getMessage.contains("per partition directory"))
  }
}
