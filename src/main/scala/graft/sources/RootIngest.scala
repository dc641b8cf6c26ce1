package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** ROOT TTree ingest story (reference parity: the reference's actual inputs
  * are ROOT files — `phaseII-analysis-FS.yml:1,10-11` declares
  * `tree: myana/mytree` over `.root` sample files; run commands at
  * reference README.md:60-74).
  *
  * Spark has no ROOT datasource and this engine deliberately does not
  * reimplement the ROOT binary format: the scalable pattern is a ONE-TIME
  * out-of-band columnar conversion (ROOT → Parquet), after which every read
  * is a normal pruned/pushed-down Parquet scan ([[graft.core.Tables]]).
  * That mirrors what large-scale HEP deployments do — convert once near the
  * data, then analyze columnar — and keeps the 100 TB path on the Parquet
  * reader that Catalyst already optimizes, instead of a custom row-based
  * ROOT deserializer that would defeat column pruning.
  *
  * [[fromRoot]] is the entry point: it reads the converted sidecar
  * (`<file>.root` → `<file>.root.parquet`, or an explicit override) when
  * present, and otherwise fails with the exact public conversion recipe.
  */
object RootIngest {

  /** Default sidecar location for a converted ROOT file. */
  def convertedPath(rootPath: String): String = rootPath + ".parquet"

  /** Read the events of `tree` inside `rootPath`, via its converted Parquet
    * sidecar. Fails with conversion instructions if the sidecar is absent —
    * an INFORMED failure: the native container reader ([[RootBinary]], the
    * r4 native-decode spike) opens the actual `.root` file and appends its
    * real object census (is the tree there? how is it compressed?) so the
    * user learns what the file holds, not just that a sidecar is missing.
    * The decision record for why basket decode stays on the converter is
    * in [[RootBinary]]'s scaladoc.
    */
  def fromRoot(spark: SparkSession, rootPath: String,
      tree: String = "myana/mytree",
      converted: Option[String] = None): DataFrame = {
    val sidecar = converted.getOrElse(convertedPath(rootPath))
    val p = new Path(sidecar)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) spark.read.parquet(sidecar)
    else throw new UnsupportedOperationException(
      conversionInstructions(rootPath, tree, sidecar) + census(conf, rootPath))
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
