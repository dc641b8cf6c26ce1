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
    * Flat-ntuple samples (the reference's inputs) are file-per-sample at
    * this scale; anything bigger goes through the streaming converter —
    * the decode is a ONE-TIME bootstrap, not the scan path. */
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
    * Step 2 is driver-side and capped at [[MaxNativeBytes]] per file: the
    * basket chain of one file is inherently sequential (self-delimiting
    * records), and the 100 TB answer is the sidecar it writes, not a
    * distributed decoder that would re-read row-cluster blobs per query.
    */
  def fromRoot(spark: SparkSession, rootPath: String,
      tree: String = "myana/mytree",
      converted: Option[String] = None): DataFrame = {
    val sidecar = converted.getOrElse(convertedPath(rootPath))
    val p = new Path(sidecar)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) return spark.read.parquet(sidecar)
    nativeDecode(spark, conf, rootPath, tree) match {
      case Some(df) =>
        df.write.mode("overwrite").parquet(sidecar)
        spark.read.parquet(sidecar)
      case None => throw new UnsupportedOperationException(
        conversionInstructions(rootPath, tree, sidecar) + census(conf, rootPath))
    }
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
