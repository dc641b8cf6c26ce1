package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** ROOT TTree ingest story (reference parity: the reference's actual inputs
  * are ROOT files — `phaseII-analysis-FS.yml:1,10-11` declares
  * `tree: myana/mytree` over `.root` sample files; run commands at
  * reference README.md:60-74).
  *
  * Spark has no ROOT datasource. The scalable pattern is a ONE-TIME
  * columnar conversion (ROOT → Parquet), after which every read is a
  * normal pruned/pushed-down Parquet scan ([[graft.core.Tables]]) — that
  * mirrors what large-scale HEP deployments do and keeps the 100 TB path
  * on the reader Catalyst already optimizes, instead of a row-based ROOT
  * deserializer that would defeat column pruning. Since r7 the conversion
  * itself is NATIVE for flat ntuples — the only tree shape the reference
  * reads: [[fromRoot]] decodes the baskets directly
  * ([[RootBinary.decodeFlatTree]]) and writes the sidecar on first read,
  * so no out-of-band step remains for the reference's own inputs. The
  * uproot recipe stays as the documented path for general streamed trees.
  *
  * [[fromRoot]] resolution order: converted sidecar (`<file>.root` →
  * `<file>.root.parquet`, or explicit override) → native flat decode
  * (writing that sidecar) → informed failure with the recipe + census.
  */
object RootIngest {

  /** Default sidecar location for a converted ROOT file. */
  def convertedPath(rootPath: String): String = rootPath + ".parquet"

  /** Largest `.root` file the native decoder will read whole on the driver.
    * Above this, [[fromRoot]] switches to the EXECUTOR-SIDE range decode
    * ([[distributedDecode]]): baskets are self-delimiting and entry-
    * aligned, so the file splits at basket boundaries and each task
    * decodes one contiguous entry range via positioned reads — the driver
    * only ever holds headers. */
  val MaxNativeBytes: Long = 1L << 30

  /** Read the events of `tree` inside `rootPath`.
    *
    * Resolution order — each step a strictly better-informed fallback:
    *  1. a converted Parquet sidecar, when present → normal pruned scan;
    *  2. NATIVE decode, when the file is a flat ntuple (parallel primitive
    *     leaves + size counters — the only shape the reference reads,
    *     `/root/reference/phaseII-analysis.py:16-18`): decode the baskets
    *     ([[RootBinary.decodeFlatTree]]), WRITE the sidecar, and return the
    *     Parquet scan over it — convert-on-first-read, so the decode cost
    *     is paid once and every later read (and every OTHER column-pruned
    *     query) rides the columnar path;
    *  3. otherwise fail with the converter recipe plus the container-layer
    *     census of what the file actually holds.
    *
    * Step 2 reads whole files on the driver only up to `maxDriverBytes`
    * ([[MaxNativeBytes]] by default); larger flat ntuples decode on the
    * EXECUTORS ([[distributedDecode]]) — per-task entry ranges over
    * positioned reads, the driver holding headers only. Either way the
    * result is the sidecar: the decode is a ONE-TIME bootstrap and every
    * later read is the pruned/pushed-down Parquet scan.
    */
  def fromRoot(spark: SparkSession, rootPath: String,
      tree: String = "myana/mytree",
      converted: Option[String] = None,
      maxDriverBytes: Long = MaxNativeBytes): DataFrame = {
    val sidecar = converted.getOrElse(convertedPath(rootPath))
    val p = new Path(sidecar)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) return spark.read.parquet(sidecar)
    val rp = new Path(rootPath)
    val rfs = rp.getFileSystem(conf)
    val decoded =
      if (rfs.exists(rp) && rfs.getFileStatus(rp).getLen > maxDriverBytes)
        distributedDecode(spark, rootPath, tree)
      else nativeDecode(spark, conf, rootPath, tree)
    decoded match {
      case Some(df) =>
        df.write.mode("overwrite").parquet(sidecar)
        spark.read.parquet(sidecar)
      case None => throw new UnsupportedOperationException(
        conversionInstructions(rootPath, tree, sidecar) + census(conf, rootPath))
    }
  }

  private def prim(t: Char): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    t match {
      case 'F' => FloatType
      case 'I' => IntegerType
      case 'D' => DoubleType
      case 'L' => LongType
      case 'S' => ShortType
      case 'O' => BooleanType
      case 'B' => ByteType
    }
  }

  private def flatSchema(specs: Seq[RootBinary.LeafSpec]): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(specs.map { s =>
      val base = prim(s.typ)
      StructField(s.branch,
        if (s.counter.isDefined) ArrayType(base, containsNull = false) else base,
        nullable = false)
    })
  }

  /** EXECUTOR-SIDE flat-ntuple decode for files above the driver cap.
    *
    * The driver walks only HEADERS ([[RootBinary.planFlatTree]]: key
    * chain, TTree record, basket key regions — O(records) small preads)
    * to build the branch → basket map with entry offsets, then splits
    * [0, n) into contiguous entry ranges, one task each. A task decodes,
    * for every branch, exactly the baskets overlapping its range via
    * positioned reads — baskets are self-delimiting records, so the
    * split needs no byte-level coordination — and jagged regrouping is
    * BASKET-LOCAL: a jagged basket's values correspond exactly to its
    * entry range, so the task preads the counter baskets covering that
    * range (cached per task) and never aligns across tasks. Per-task
    * memory is O(range entries + one basket); the driver holds the plan.
    *
    * Consistency checks (scalar length vs nevBuf, jagged value count vs
    * counter sum) run per basket inside the task and fail the job loudly
    * — a distributed decode must never silently fall back after partial
    * work. `entriesPerTask` defaults to n / (2·defaultParallelism). */
  private[graft] def distributedDecode(spark: SparkSession, rootPath: String,
      tree: String, entriesPerTask: Option[Long] = None): Option[DataFrame] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val rp = new Path(rootPath)
    val rfs = rp.getFileSystem(conf)
    if (!rfs.exists(rp)) return None
    val fileLen = rfs.getFileStatus(rp).getLen
    val in = rfs.open(rp)
    val planned = try {
      RootBinary.planFlatTree((off, len) => {
        val b = new Array[Byte](len); in.readFully(off, b); b
      }, fileLen, tree)
    } finally in.close()
    planned.map { case (plans, n) =>
      val schema = flatSchema(plans.map(_.spec))
      val ept = entriesPerTask.getOrElse(
        math.max(1L, n / math.max(1, 2 * spark.sparkContext.defaultParallelism)))
      val ranges = (0L until n by ept).map(s => (s, math.min(s + ept, n)))
      // ship the SESSION's hadoop configuration to the tasks: a fresh
      // `new Configuration()` on executors would drop spark.hadoop.*
      // settings, object-store credentials and defaultFS, so the
      // distributed path would only work on configuration-free
      // filesystems (ADVICE r8)
      val bconf = spark.sparkContext.broadcast(new SerializableHadoopConf(conf))
      val rows = spark.sparkContext
        .parallelize(ranges, math.max(1, ranges.length))
        .flatMap { case (r0, r1) =>
          decodeRange(rootPath, plans, r0, r1, bconf.value.value) }
      spark.createDataFrame(rows, schema)
    }
  }

  /** One task's work: rows for entries [r0, r1) of every branch. `hconf`
    * is the broadcast session hadoop configuration — never a fresh
    * `Configuration()`, which would lose credentials/defaultFS. */
  private[graft] def decodeRange(rootPath: String,
      plans: Seq[RootBinary.BranchPlan], r0: Long, r1: Long,
      hconf: org.apache.hadoop.conf.Configuration): Iterator[org.apache.spark.sql.Row] = {
    import RootBinary.{BasketRange, BranchPlan}
    val p = new Path(rootPath)
    val fs = p.getFileSystem(hconf)
    val in = fs.open(p)
    try {
      // decoded (values, border) per basket seek — counter baskets are
      // shared across jagged branches, decode each at most once per task
      val cache = scala.collection.mutable.Map.empty[Long, (Array[Byte], Int)]
      def basketData(b: BasketRange): (Array[Byte], Int) =
        cache.getOrElseUpdate(b.seek, {
          val rec = new Array[Byte](b.nBytes)
          in.readFully(b.seek, rec)
          val (data, border, nevBuf) = RootBinary.decodeBasketRecord(rec)
          require(nevBuf.toLong == b.e1 - b.e0,
            s"basket at ${b.seek}: nevBuf $nevBuf vs planned ${b.e1 - b.e0}")
          (data, border)
        })
      // scalar values for entries [from, until) of `plan`
      def scalarSlice(plan: BranchPlan, from: Long, until: Long): Array[Any] = {
        val w = RootBinary.primWidth(plan.spec.typ)
        plan.baskets.iterator
          .filter(b => b.e1 > from && b.e0 < until)
          .flatMap { b =>
            val (data, border) = basketData(b)
            require(border.toLong == (b.e1 - b.e0) * w,
              s"scalar ${plan.spec.branch}: border $border for ${b.e1 - b.e0} entries")
            val lo = math.max(from, b.e0)
            val hi = math.min(until, b.e1)
            (lo until hi).iterator.map(e =>
              RootBinary.readPrim(plan.spec.typ, data, ((e - b.e0) * w).toInt))
          }.toArray
      }
      val byName = plans.map(pl => pl.spec.branch -> pl).toMap
      def jaggedSlice(plan: BranchPlan, from: Long, until: Long): Array[Any] = {
        val w = RootBinary.primWidth(plan.spec.typ)
        val cPlan = byName(plan.spec.counter.get)
        plan.baskets.iterator
          .filter(b => b.e1 > from && b.e0 < until)
          .flatMap { b =>
            val (data, border) = basketData(b)
            // counters for THIS basket's whole entry range: offsets within
            // the basket need the counts of its leading entries too
            val counts = scalarSlice(cPlan, b.e0, b.e1).map(_.asInstanceOf[Int])
            require(counts.forall(_ >= 0) &&
              counts.map(_.toLong).sum * w == border.toLong,
              s"jagged ${plan.spec.branch}: counter sum vs $border value bytes")
            val offsets = counts.scanLeft(0L)(_ + _)
            val lo = math.max(from, b.e0)
            val hi = math.min(until, b.e1)
            (lo until hi).iterator.map { e =>
              val i = (e - b.e0).toInt
              val at = offsets(i) * w
              Seq.tabulate(counts(i))(j =>
                RootBinary.readPrim(plan.spec.typ, data, (at + j.toLong * w).toInt))
            }
          }.toArray
      }
      val cols: Seq[Array[Any]] = plans.map { pl =>
        if (pl.spec.counter.isEmpty) scalarSlice(pl, r0, r1)
        else jaggedSlice(pl, r0, r1)
      }
      val m = (r1 - r0).toInt
      cols.foreach(c => require(c.length == m, s"column length ${c.length} vs $m"))
      (0 until m).iterator
        .map(i => org.apache.spark.sql.Row.fromSeq(cols.map(_(i))))
    } finally in.close()
  }

  /** Native flat-ntuple decode of `rootPath` → DataFrame (None when the
    * file is absent, oversized, or outside the flat subset). Leaf types map
    * F/I/D/L/S/O/B → float/int/double/bigint/smallint/boolean/tinyint;
    * counter-linked leaves become array<T> columns and the counter itself
    * stays a column (the reference selects on it; dropping it would lose
    * information the converter keeps). */
  private[graft] def nativeDecode(spark: SparkSession,
      conf: org.apache.hadoop.conf.Configuration,
      rootPath: String, tree: String): Option[DataFrame] = {
    val rp = new Path(rootPath)
    try {
      val rfs = rp.getFileSystem(conf)
      if (!rfs.exists(rp)) return None
      val len = rfs.getFileStatus(rp).getLen
      if (len > MaxNativeBytes) return None
      val in = rfs.open(rp)
      val bytes = try {
        val b = new Array[Byte](len.toInt); in.readFully(0, b); b
      } finally in.close()
      RootBinary.decodeFlatTree(bytes, tree).map { cols =>
        import org.apache.spark.sql.Row
        import org.apache.spark.sql.types._
        def prim(t: Char): DataType = t match {
          case 'F' => FloatType
          case 'I' => IntegerType
          case 'D' => DoubleType
          case 'L' => LongType
          case 'S' => ShortType
          case 'O' => BooleanType
          case 'B' => ByteType
        }
        val schema = StructType(cols.map { c =>
          val base = prim(c.spec.typ)
          StructField(c.spec.branch,
            if (c.spec.counter.isDefined) ArrayType(base, containsNull = false) else base,
            nullable = false)
        })
        val n = cols.headOption.map(_.perEntry.length).getOrElse(0)
        val rows = (0 until n).map(e => Row.fromSeq(cols.map(_.perEntry(e))))
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows, math.max(1, math.min(rows.length, 8))),
          schema)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Native container-layer census of the ROOT file itself, when present
    * and small enough to inspect whole (census is a diagnostic, not a data
    * path — cap the read instead of streaming). */
  private def census(conf: org.apache.hadoop.conf.Configuration, rootPath: String): String = {
    val rp = new Path(rootPath)
    try {
      val rfs = rp.getFileSystem(conf)
      if (!rfs.exists(rp)) s"\n\n(note: $rootPath itself does not exist)"
      else {
        val len = rfs.getFileStatus(rp).getLen
        if (len > (256L << 20)) "" // census only for inspectable sizes
        else {
          val in = rfs.open(rp)
          val bytes = try {
            val b = new Array[Byte](len.toInt); in.readFully(0, b); b
          } finally in.close()
          RootBinary.describe(bytes)
            .map(d => s"\n\nNative container-layer inspection of the file:\n$d")
            .getOrElse(s"\n\n(note: $rootPath is not a ROOT file — bad magic)")
        }
      }
    } catch { case scala.util.control.NonFatal(_) => "" }
  }

  /** The out-of-band recipe (public tooling only: uproot + pyarrow). */
  def conversionInstructions(rootPath: String, tree: String, sidecar: String): String =
    s"""No converted Parquet found for ROOT file: $rootPath
       |(expected at: $sidecar)
       |
       |This engine reads ROOT TTrees through a one-time columnar conversion.
       |Convert with the public uproot/pyarrow stack (pip install uproot pyarrow):
       |
       |    import uproot
       |    with uproot.open("$rootPath") as f:
       |        f["$tree"].arrays(library="ak")  # awkward Array
       |    # or stream in chunks for large files:
       |    import pyarrow.parquet as pq
       |    import uproot
       |    it = uproot.iterate("$rootPath:$tree", step_size="512 MB", library="ak")
       |    import awkward as ak
       |    writer = None
       |    for chunk in it:
       |        tbl = ak.to_arrow_table(chunk)
       |        if writer is None:
       |            writer = pq.ParquetWriter("$sidecar", tbl.schema)
       |        writer.write_table(tbl)
       |    writer.close()
       |
       |Jagged branches (per-event particle collections) become Parquet LIST
       |columns, which this engine consumes natively as array<T> columns
       |(see graft.physics.Events for the decorated schema).
       |Then re-run: RootIngest.fromRoot(spark, "$rootPath")""".stripMargin
}

/** Serializable carrier for the SESSION's hadoop configuration. Spark's
  * own `org.apache.spark.util.SerializableConfiguration` is
  * `private[spark]`, so the executor-side ROOT decode ships this minimal
  * Writable-based twin instead — `Configuration` implements the Hadoop
  * `Writable` contract and `ObjectOutputStream`/`ObjectInputStream`
  * implement `DataOutput`/`DataInput`, so (de)serialization is exactly
  * one `write`/`readFields` pair. */
private[graft] class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
  extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}
