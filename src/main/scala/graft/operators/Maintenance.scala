package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}

/** Corpus-maintenance operators — keeping a 100 TB lake correct and
  * scan-efficient between training runs:
  *
  *  - CDC / snapshot upsert merge (latest-wins + delete markers) → q82
  *  - Z-order (Morton) layout clustering for multi-column pruning → q83
  *
  * Scale shapes: q82 is ONE hash shuffle on the merge key (with bucketed
  * base tables it is shuffle-free on the base side — only the delta
  * shuffles); q83's z-value is a pure map expression — the expensive part,
  * the re-sort, is exactly the write-time `repartitionByRange` a layout
  * job would run, and the payoff is read-time row-group pruning on BOTH
  * interleaved dimensions.
  */
object Maintenance {

  /** Delta-style merge: union base and update snapshots, keep the
    * highest-version row per key, then drop rows whose winner carries a
    * delete marker. ONE hash shuffle on (keys); at scale the base side
    * can be bucketed on the key so only the (small) changelog shuffles.
    * Ties on version resolve to the update side deterministically only if
    * the caller versions monotonically — enforce versions, not arrival
    * order (arrival order is not reproducible under retries). */
  def upsertLatest(base: DataFrame, updates: DataFrame, keys: Seq[String],
      versionCol: String, deleteCol: Option[String] = None): DataFrame = {
    val all = base.unionByName(updates)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(desc(versionCol))
    val latest = all
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
    deleteCol.fold(latest)(d => latest.filter(!coalesce(col(d), lit(false))).drop(d))
  }

  /** Morton (Z-order) value of two non-negative ints, `bits` bits each:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Pure integer
    * expression — identical in any engine with shifts; used as the
    * write-time clustering key so range scans on EITHER column touch few
    * row-groups.
    *
    * Inputs MUST fit in `bits` bits: dropped high bits would silently
    * alias far-apart keys into the same z-value and quietly destroy the
    * locality guarantee at scale (l_partkey outgrows 16 bits around sf0.3).
    * The guard is one comparison per row against 16+ shift terms — noise —
    * and fails the job instead of degrading the layout. */
  def zorderValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && 2 * bits <= 62, s"bits=$bits out of range")
    val limit = 1L << bits
    val guarded = when(a < 0 || a >= limit || b < 0 || b >= limit,
      raise_error(concat(lit(s"zorderValue: input exceeds $bits bits: a="),
        a.cast("string"), lit(" b="), b.cast("string"))))
    val z = (0 until bits).map { i =>
      val abit = shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
      val bbit = shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)
    coalesce(guarded.cast("bigint"), z)
  }

  /** The same interleave as [[zorderValue]] spelled in portable SQL. */
  def zorderSql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) | ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", ") | (", ")")

  /** Clustering audit for a z-ordered layout: bucket rows by z-value
    * prefix (the row-group analogue) and report each bucket's span in both
    * source dimensions. Tight per-bucket min/max spans ARE the pruning
    * guarantee: a predicate on either column maps to few buckets. */
  def zorderBucketStats(df: DataFrame, aCol: String, bCol: String,
      bits: Int, bucketShift: Int): DataFrame = {
    df.select(zorderValue(col(aCol), col(bCol), bits).as("z"),
        col(aCol).as("a"), col(bCol).as("b"))
      .withColumn("bucket", shiftright(col("z"), bucketShift))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("a")).as("a_min"), max(col("a")).as("a_max"),
        min(col("b")).as("b_min"), max(col("b")).as("b_max"))
  }

  /** Single-scan numeric column profiling (the data-quality monitor a
    * pipeline runs on every snapshot): for each named column — row count,
    * null count, exact distinct count, min, max. Implemented as an
    * unpivot (`stack`) into (col_name, v) followed by ONE groupBy: one
    * scan of exactly the profiled columns, shuffle of O(cols × distinct
    * partial states), never a second pass per column. min/max/counts are
    * aggregation-order independent, so results are engine-exact even on
    * doubles (no summation occurs). */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    val stackExpr = cols.map(c => s"'$c', cast($c as double)").mkString(
      s"stack(${cols.size}, ", ", ", ") as (col_name, v)")
    df.selectExpr(stackExpr)
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n"),
        count(lit(1)).minus(count(col("v"))).as("n_null"),
        countDistinct(col("v")).as("n_distinct"),
        min(col("v")).as("v_min"), max(col("v")).as("v_max"))
  }

  /** Small-file compaction — the OPTIMIZE of lake upkeep: a streaming/CDC
    * sink leaves thousands of KB-sized parquet files per partition, and
    * scan cost at 100 TB is dominated by file-open overhead + lost column
    * pruning, not bytes. Rewrites `inDir` into `outDir` with
    * `ceil(totalBytes / targetBytes)` output files. File count comes from
    * the FILESYSTEM census (actual bytes), not a row-count guess, so the
    * result tracks the real on-disk size; `sortCols` optionally re-sorts
    * within partitions to preserve/restore clustering (e.g. a
    * [[zorderValue]] key) through the rewrite — compaction must not undo
    * layout. Repartition is round-robin: parallel writers, near-equal
    * file sizes. Returns (filesBefore, filesAfter). */
  def compactFiles(spark: org.apache.spark.sql.SparkSession, inDir: String,
      outDir: String, targetBytes: Long, sortCols: Seq[String] = Nil): (Int, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val inPath = new org.apache.hadoop.fs.Path(inDir)
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val fs = inPath.getFileSystem(conf)
    // overwrite-into-source would clobber the input mid-read (the rewrite
    // streams from inDir while writing); compare fully-qualified paths so
    // "file:/x" and "/x/" can't sneak past as different spellings
    val inQ = fs.makeQualified(inPath)
    val outQ = outPath.getFileSystem(conf).makeQualified(outPath)
    require(inQ != outQ,
      s"compactFiles: outDir must differ from inDir ($inQ) — mode overwrite " +
        "would clobber the source mid-read; write to a sibling and swap")
    val entries = fs.listStatus(inPath)
    // FLAT-DIRECTORY contract: this compacts ONE leaf (= one partition
    // directory at lake scale — see SCALING.md: each leaf is independent
    // and embarrassingly parallel). A hive-partitioned root must be driven
    // per leaf; silently flattening it would both miscount (0 files seen
    // here) and destroy the partition layout on rewrite.
    val subDirs = entries.filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
    require(subDirs.isEmpty,
      s"compactFiles expects a flat leaf directory; $inDir contains " +
        s"subdirectories (${subDirs.take(3).map(_.getPath.getName).mkString(", ")}…) — " +
        "invoke per partition directory")
    val files = entries
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    require(files.nonEmpty, s"no .parquet files under $inDir")
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inDir).repartition(nOut)
    val sorted = if (sortCols.nonEmpty)
      df.sortWithinPartitions(sortCols.map(col): _*) else df
    sorted.write.mode("overwrite").parquet(outDir)
    // the output may live on a DIFFERENT filesystem (e.g. compact HDFS →
    // S3): count through outDir's own FS, not inDir's
    val after = outPath.getFileSystem(conf).listStatus(outPath)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    (files.length, after)
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- q82: CDC upsert merge ---------------------------------------------
    // Base = orders under 4000 at version 0; changelog = every 7th key
    // re-statused at version 1, every 13th of THOSE deleted. Latest-wins
    // with delete-marker suppression — the Delta/Iceberg MERGE semantics
    // as one window.
    QueryDef(
      "q82_upsert_merge",
      (s, d) => {
        val o = Tables.orders(s, d).filter(col("o_orderkey") < 4000)
        val base = o.select(col("o_orderkey"), col("o_orderstatus"),
          lit(0L).as("version"), lit(false).as("is_deleted"))
        val upd = o.filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
            lit(1L).as("version"), (col("o_orderkey") % 13 === 0).as("is_deleted"))
        upsertLatest(base, upd, Seq("o_orderkey"), "version", Some("is_deleted"))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey, o_orderstatus, 0 AS version, false AS is_deleted
             |  FROM orders WHERE o_orderkey < 4000),
             |upd AS (
             |  SELECT o_orderkey, 'U' AS o_orderstatus, 1 AS version,
             |    (o_orderkey % 13 = 0) AS is_deleted
             |  FROM orders WHERE o_orderkey < 4000 AND o_orderkey % 7 = 0),
             |merged AS (
             |  SELECT *, row_number() OVER (PARTITION BY o_orderkey
             |                               ORDER BY version DESC) AS rn
             |  FROM (SELECT * FROM base UNION ALL SELECT * FROM upd))
             |SELECT o_orderkey, o_orderstatus, version
             |FROM merged WHERE rn = 1 AND NOT is_deleted
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- q83: z-order clustering audit -------------------------------------
    // Interleave (l_partkey, l_suppkey) at 16 bits and audit the z-buckets:
    // the per-bucket min/max spans prove both dimensions stay range-local
    // under the interleaved order — the property multi-column row-group
    // pruning rests on.
    QueryDef(
      "q83_zorder_stats",
      (s, d) => zorderBucketStats(
          Tables.lineitem(s, d), "l_partkey", "l_suppkey",
          bits = 16, bucketShift = 14)
        .orderBy(col("bucket")),
      Some(s"""WITH z AS (
             |  SELECT ${zorderSql("l_partkey", "l_suppkey", 16)} AS z,
             |    l_partkey AS a, l_suppkey AS b
             |  FROM lineitem)
             |SELECT z >> 14 AS bucket, count(*) AS n,
             |  min(a) AS a_min, max(a) AS a_max,
             |  min(b) AS b_min, max(b) AS b_max
             |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // ---- q85: snapshot column profiling ------------------------------------
    // One scan profiles four numeric lineitem columns. Counts and extremes
    // involve no summation, so doubles compare engine-exact.
    QueryDef(
      "q85_column_profile",
      (s, d) => profileColumns(Tables.lineitem(s, d),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy(col("col_name")),
      Some("""WITH u AS (
             |  SELECT 'l_quantity' AS col_name, l_quantity AS v FROM lineitem
             |  UNION ALL
             |  SELECT 'l_extendedprice', l_extendedprice FROM lineitem
             |  UNION ALL
             |  SELECT 'l_discount', l_discount FROM lineitem
             |  UNION ALL
             |  SELECT 'l_tax', l_tax FROM lineitem)
             |SELECT col_name, count(*) AS n,
             |  count(*) - count(v) AS n_null,
             |  count(DISTINCT v) AS n_distinct,
             |  min(v) AS v_min, max(v) AS v_max
             |FROM u GROUP BY col_name ORDER BY col_name""".stripMargin)),

    // ---- q113: snapshot diff (what changed between two table versions) -----
    // The audit face of q82's MERGE: given two snapshots, classify every
    // key as added / removed / changed / unchanged. ONE full-outer join on
    // the key (co-partitioned shuffle both sides; at scale both snapshots
    // bucket on the key and the join is shuffle-free) and null-safe
    // payload comparison — presence markers, not payload nullability,
    // decide existence.
    QueryDef(
      "q113_snapshot_diff",
      (s, d) => {
        val o = Tables.orders(s, d).filter(col("o_orderkey") < 4000)
        val oldSnap = o.filter(col("o_orderkey") % 3 =!= 0)
          .select(col("o_orderkey"), col("o_orderstatus").as("payload"))
        val newSnap = o.filter(col("o_orderkey") % 5 =!= 0)
          .select(col("o_orderkey"),
            when(col("o_orderkey") % 7 === 0, lit("U"))
              .otherwise(col("o_orderstatus")).as("payload"))
        snapshotDiff(oldSnap, newSnap, Seq("o_orderkey"), Seq("payload"))
          .groupBy(col("status")).agg(count(lit(1)).as("n"))
          .orderBy(col("status"))
      },
      Some("""WITH o AS (
             |  SELECT o_orderkey, o_orderstatus AS payload FROM orders
             |  WHERE o_orderkey < 4000 AND o_orderkey % 3 != 0),
             |n AS (
             |  SELECT o_orderkey,
             |    CASE WHEN o_orderkey % 7 = 0 THEN 'U' ELSE o_orderstatus END AS payload
             |  FROM orders WHERE o_orderkey < 4000 AND o_orderkey % 5 != 0),
             |d AS (
             |  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS k,
             |    CASE
             |      WHEN o.o_orderkey IS NULL THEN 'added'
             |      WHEN n.o_orderkey IS NULL THEN 'removed'
             |      WHEN o.payload IS DISTINCT FROM n.payload THEN 'changed'
             |      ELSE 'unchanged' END AS status
             |  FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
             |SELECT status, CAST(count(*) AS BIGINT) AS n
             |FROM d GROUP BY status ORDER BY status""".stripMargin)),
  )

  /** Write `df` as a bucketed (and per-bucket sorted) external table: the
    * lake-layout half of shuffle elimination. Two tables bucketed on
    * their join key with the SAME bucket count satisfy the join's
    * hash-distribution requirement straight off disk, so every subsequent
    * join/aggregation on that key runs with ZERO exchanges — at 100 TB
    * the fact tables are written once this way and every downstream
    * pipeline stops paying the corpus shuffle (`BucketedJoinSpec` pins
    * the exchange-free plan). `sortBy` additionally pre-sorts buckets so
    * sort-merge joins skip their sort. Bucket count is a layout contract:
    * both sides must match (or be a multiple under AQE coalescing) —
    * pick once per lake, like the reference picks its file partitioning. */
  def writeBucketed(df: DataFrame, path: String, table: String,
      keys: Seq[String], nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Classify every key across two snapshots: added / removed / changed /
    * unchanged. Presence markers (not payload nullability) decide
    * existence, and payload comparison is null-safe per column, so NULL
    * payloads diff correctly. Returns the key columns + `status`. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keys: Seq[String], payload: Seq[String]): DataFrame = {
    val o = oldSnap.select((keys ++ payload).map(col): _*)
      .withColumnsRenamed(payload.map(p => p -> s"__o_$p").toMap)
      .withColumn("__o_present", lit(true))
    val n = newSnap.select((keys ++ payload).map(col): _*)
      .withColumnsRenamed(payload.map(p => p -> s"__n_$p").toMap)
      .withColumn("__n_present", lit(true))
    val same = payload.map(p => col(s"__o_$p") <=> col(s"__n_$p"))
      .reduceOption(_ && _).getOrElse(lit(true))
    o.join(n, keys, "full_outer")
      .withColumn("status",
        when(col("__o_present").isNull, lit("added"))
          .when(col("__n_present").isNull, lit("removed"))
          .when(!same, lit("changed"))
          .otherwise(lit("unchanged")))
      .select((keys.map(col) :+ col("status")): _*)
  }
}
