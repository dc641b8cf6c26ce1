package graft

import graft.sources.{RootBinary, RootIngest}
import java.nio.charset.StandardCharsets

/** Native flat-ntuple basket decode against a spec-built fixture.
  *
  * The fixture writer below is an INDEPENDENT serializer: it lays out the
  * TFile header, TKey records, TBasket key-region fields, and ZL envelopes
  * directly from the published format description (same citations as
  * RootBinarySpec), sharing no code with the reader. What it cannot prove —
  * stated honestly, as the decision record in RootBinary requires — is
  * byte-compatibility with files written by ROOT itself: no real ROOT file
  * can exist in this zero-egress environment. It DOES prove the reader
  * implements the documented layout, end-to-end to typed rows, and that
  * everything outside the flat subset falls back to the converter instead
  * of misreading.
  *
  * Tree shape mirrors the reference's inputs (parallel primitive leaves +
  * a size counter, /root/reference/phaseII-analysis.py:16-18): scalars
  * evt/L met/F flag/O w/D, counter nJet/I, jagged Jet_pt[nJet]/F.
  */
class RootFlatDecodeSpec extends SparkSpec {

  private def be2(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
  private def be4(v: Int) =
    Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def be8(v: Long) = be4((v >>> 32).toInt) ++ be4(v.toInt)
  private def str(s: String) = Array[Byte](s.length.toByte) ++ s.getBytes(StandardCharsets.US_ASCII)

  private def zlEnvelope(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length * 2 + 64)
    val n = d.deflate(buf); d.end()
    def le3(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte)
    "ZL".getBytes(StandardCharsets.US_ASCII) ++ Array[Byte](8) ++
      le3(n) ++ le3(raw.length) ++ buf.take(n)
  }

  /** A plain TKey record (same layout as RootBinarySpec's). */
  private def keyRecord(cls: String, name: String, title: String,
      objLen: Int, data: Array[Byte]): Array[Byte] = {
    val names = str(cls) ++ str(name) ++ str(title)
    val keyLen = 18 + 8 + names.length
    val nBytes = keyLen + data.length
    be4(nBytes) ++ be2(4) ++ be4(objLen) ++ be4(0) ++
      be2(keyLen) ++ be2(1) ++ be4(0) ++ be4(0) ++ names ++ data
  }

  /** A TBasket record: the key region additionally carries fVersion,
    * fBufferSize, fNevBufSize, fNevBuf, fLast and the 1-byte flag; fLast =
    * keyLen + value bytes (no entry-offset section in these baskets — the
    * counter leaf carries the per-entry sizes, as in the flat subset). */
  private def basketRecord(branch: String, tree: String, nevBuf: Int,
      raw: Array[Byte], compress: Boolean): Array[Byte] = {
    val names = str("TBasket") ++ str(branch) ++ str(tree)
    val keyLen = 18 + 8 + names.length + 2 + 4 + 4 + 4 + 4 + 1
    val last = keyLen + raw.length
    val data = if (compress) zlEnvelope(raw) else raw
    val nBytes = keyLen + data.length
    be4(nBytes) ++ be2(4) ++ be4(raw.length) ++ be4(0) ++
      be2(keyLen) ++ be2(1) ++ be4(0) ++ be4(0) ++ names ++
      be2(3) ++ be4(32000) ++ be4(4) ++ be4(nevBuf) ++ be4(last) ++ Array[Byte](0) ++
      data
  }

  private def file(records: Array[Byte]*): Array[Byte] = {
    val begin = 100
    val body = records.flatten.toArray
    val end = begin + body.length
    val header = "root".getBytes(StandardCharsets.US_ASCII) ++
      be4(63200) ++ be4(begin) ++ be4(end) ++ be4(0) ++ be4(0) ++ be4(0) ++
      be4(58) ++ Array[Byte](4) ++ be4(101) ++ be4(0) ++ be4(0)
    header ++ Array.fill[Byte](begin - header.length)(0) ++ body
  }

  private def floats(vs: Float*) = vs.toArray.flatMap(v => be4(java.lang.Float.floatToIntBits(v)))
  private def ints(vs: Int*) = vs.toArray.flatMap(be4)
  private def longs(vs: Long*) = vs.toArray.flatMap(be8)
  private def doubles(vs: Double*) = vs.toArray.flatMap(v => be8(java.lang.Double.doubleToLongBits(v)))

  /** The streamed-TTree stand-in: junk interleaved with the length-prefixed
    * title strings a real streamer emits twice per leaflist branch (branch
    * title + leaf title) — plus one declaration with NO baskets ("fake/F")
    * that the decoder must drop as a scan false positive. */
  private val treeBlob: Array[Byte] =
    Array.fill[Byte](40)(0x7f.toByte) ++
      str("evt") ++ str("evt/L") ++ Array[Byte](2, -1, -1) ++
      str("met") ++ str("met/F") ++
      str("flag") ++ str("flag/O") ++
      str("w") ++ str("w/D") ++
      str("nJet") ++ str("nJet/I") ++
      str("Jet_pt") ++ str("Jet_pt[nJet]/F") ++
      str("fake/F") ++ Array.fill[Byte](25)(3)

  // 5 entries split 3 + 2 across two baskets per branch; Jet_pt counts
  // [2, 0, 1] then [3, 1] — jagged values cross the basket boundary
  private val fixture: Array[Byte] = file(
    keyRecord("TTree", "mytree", "mytree", treeBlob.length, zlEnvelope(treeBlob)),
    basketRecord("evt", "mytree", 3, longs(11L, 12L, 13L), compress = false),
    basketRecord("met", "mytree", 3, floats(10.5f, 20.25f, 0f), compress = true),
    basketRecord("flag", "mytree", 3, Array[Byte](1, 0, 1), compress = false),
    basketRecord("w", "mytree", 3, doubles(0.5, 1.5, 2.5), compress = false),
    basketRecord("nJet", "mytree", 3, ints(2, 0, 1), compress = true),
    basketRecord("Jet_pt", "mytree", 3, floats(1f, 2f, 3.5f), compress = false),
    basketRecord("evt", "mytree", 2, longs(14L, 15L), compress = false),
    basketRecord("met", "mytree", 2, floats(7f, 8f), compress = false),
    basketRecord("flag", "mytree", 2, Array[Byte](0, 0), compress = false),
    basketRecord("w", "mytree", 2, doubles(3.5, 4.5), compress = false),
    basketRecord("nJet", "mytree", 2, ints(3, 1), compress = false),
    basketRecord("Jet_pt", "mytree", 2, floats(4f, 5f, 6f, 7f), compress = true))

  test("leaflist scan: declarations recovered, junk ignored, first wins") {
    val specs = RootBinary.scanLeafSpecs(treeBlob)
    assert(specs.map(s => (s.branch, s.typ, s.counter)) == Seq(
      ("evt", 'L', None), ("met", 'F', None), ("flag", 'O', None),
      ("w", 'D', None), ("nJet", 'I', None), ("Jet_pt", 'F', Some("nJet")),
      ("fake", 'F', None)))
  }

  test("basket header fields parse from the key region") {
    val bk = RootBinary.listKeys(fixture).find(_.className == "TBasket").get
    val bh = RootBinary.readBasketHeader(fixture, bk).get
    assert(bh.nevBuf == 3 && bh.last == bk.keyLen + 3 * 8) // evt: 3 longs
  }

  test("decodeFlatTree: typed values, multi-basket concat, jagged slicing") {
    val cols = RootBinary.decodeFlatTree(fixture, "myana/mytree").get
    val byName = cols.map(c => c.spec.branch -> c.perEntry).toMap
    assert(cols.map(_.spec.branch) == Seq("evt", "met", "flag", "w", "nJet", "Jet_pt"),
      "baskets exist for exactly the real branches; 'fake' dropped")
    assert(byName("evt") == Seq(11L, 12L, 13L, 14L, 15L))
    assert(byName("met") == Seq(10.5f, 20.25f, 0f, 7f, 8f))
    assert(byName("flag") == Seq(true, false, true, false, false))
    assert(byName("w") == Seq(0.5, 1.5, 2.5, 3.5, 4.5))
    assert(byName("nJet") == Seq(2, 0, 1, 3, 1))
    assert(byName("Jet_pt") == Seq(Seq(1f, 2f), Seq(), Seq(3.5f), Seq(4f, 5f, 6f), Seq(7f)))
  }

  test("outside the flat subset → None, never a partial read") {
    // entry-count disagreement: a scalar branch short one basket
    val bad = file(
      keyRecord("TTree", "mytree", "mytree", treeBlob.length, zlEnvelope(treeBlob)),
      basketRecord("evt", "mytree", 3, longs(1L, 2L, 3L), compress = false),
      basketRecord("met", "mytree", 2, floats(1f, 2f), compress = false))
    assert(RootBinary.decodeFlatTree(bad, "mytree").isEmpty)
    // jagged values disagree with the counter sum
    val bad2 = file(
      keyRecord("TTree", "mytree", "mytree", treeBlob.length, zlEnvelope(treeBlob)),
      basketRecord("nJet", "mytree", 2, ints(2, 2), compress = false),
      basketRecord("Jet_pt", "mytree", 2, floats(1f, 2f, 3f), compress = false))
    assert(RootBinary.decodeFlatTree(bad2, "mytree").isEmpty)
    // no such tree
    assert(RootBinary.decodeFlatTree(fixture, "othertree").isEmpty)
  }

  test("planFlatTree: a non-'I' counter is rejected at plan time (r8 advice)") {
    // the distributed decode reads counts via asInstanceOf[Int]; an 'S'
    // counter that passed planning would ClassCastException mid-job where
    // the driver path degrades to the converter — both paths must agree
    // by rejecting at the plan layer
    val blob = Array.fill[Byte](8)(0x7f.toByte) ++
      str("nJet") ++ str("nJet/S") ++
      str("Jet_pt") ++ str("Jet_pt[nJet]/F")
    val fx = file(
      keyRecord("TTree", "mytree", "mytree", blob.length, zlEnvelope(blob)),
      basketRecord("nJet", "mytree", 2, be2(2) ++ be2(1), compress = false),
      basketRecord("Jet_pt", "mytree", 2, floats(1f, 2f, 3f), compress = false))
    def pread(b: Array[Byte])(off: Long, len: Int) = b.slice(off.toInt, off.toInt + len)
    assert(RootBinary.planFlatTree(pread(fx), fx.length.toLong, "myana/mytree").isEmpty,
      "an 'S'-typed counter must be rejected at plan time, not fail mid-decode")
    // the I-countered fixture still plans (the guard rejects only the type)
    assert(RootBinary.planFlatTree(pread(fixture), fixture.length.toLong,
      "myana/mytree").isDefined)
  }

  test("fromRoot: native decode with NO sidecar, convert-on-first-read") {
    val dir = java.nio.file.Files.createTempDirectory("rootflat").toString
    val rootPath = s"$dir/sample.root"
    java.nio.file.Files.write(java.nio.file.Paths.get(rootPath), fixture)
    val df = RootIngest.fromRoot(spark, rootPath) // default tree myana/mytree
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) == Seq(
      ("evt", "bigint"), ("met", "float"), ("flag", "boolean"), ("w", "double"),
      ("nJet", "int"), ("Jet_pt", "array<float>")))
    val rows = df.orderBy("evt").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(11L, 12L, 13L, 14L, 15L))
    assert(rows.map(_.getSeq[Float](5)).toSeq ==
      Seq(Seq(1f, 2f), Seq(), Seq(3.5f), Seq(4f, 5f, 6f), Seq(7f)))
    // the sidecar was written: later reads are plain parquet scans even if
    // the .root disappears
    java.nio.file.Files.delete(java.nio.file.Paths.get(rootPath))
    val again = RootIngest.fromRoot(spark, rootPath)
    assert(again.count() == 5)
    assert(again.schema.fieldNames.toSeq == df.schema.fieldNames.toSeq)
  }

  test("executor-side range decode: oversized files, byte-equal to the driver path") {
    // 100 entries in 7-entry baskets (15 baskets/branch), jagged counts
    // cycling 0..3 so ranges cross basket AND empty-entry boundaries;
    // entriesPerTask = 9 forces ranges that straddle baskets both ways
    val nEntries = 100
    val per = 7
    val counts = (0 until nEntries).map(i => i % 4)
    val jagged = counts.zipWithIndex.map { case (c, i) =>
      (0 until c).map(j => (i * 10 + j).toFloat)
    }
    val groups = (0 until nEntries).grouped(per).toSeq
    val records = Seq(
      keyRecord("TTree", "mytree", "mytree", treeBlob.length, zlEnvelope(treeBlob))) ++
      groups.zipWithIndex.flatMap { case (es, gi) =>
        Seq(
          basketRecord("evt", "mytree", es.length,
            longs(es.map(e => 1000L + e): _*), compress = gi % 2 == 0),
          basketRecord("met", "mytree", es.length,
            floats(es.map(e => e / 2.0f): _*), compress = gi % 3 == 0),
          basketRecord("nJet", "mytree", es.length,
            ints(es.map(counts): _*), compress = gi % 2 == 1),
          basketRecord("Jet_pt", "mytree", es.length,
            floats(es.flatMap(jagged): _*), compress = true))
      }
    val big = file(records: _*)
    val dir = java.nio.file.Files.createTempDirectory("rootbig").toString
    val rootPath = s"$dir/big.root"
    java.nio.file.Files.write(java.nio.file.Paths.get(rootPath), big)
    // plan layer: entry offsets per branch from headers only
    def pread(off: Long, len: Int) =
      java.util.Arrays.copyOfRange(big, off.toInt, off.toInt + len)
    val (plans, n) = RootBinary.planFlatTree(pread, big.length.toLong, "myana/mytree").get
    assert(n == nEntries)
    assert(plans.map(_.spec.branch) == Seq("evt", "met", "nJet", "Jet_pt"))
    assert(plans.forall(_.baskets.size == groups.size))
    assert(plans.head.baskets.map(_.e0) == groups.map(_.head.toLong))
    // executor path == driver whole-file path, row for row
    val dist = RootIngest.distributedDecode(spark, rootPath, "myana/mytree",
      entriesPerTask = Some(9L)).get
    val driver = RootBinary.decodeFlatTree(big, "myana/mytree").get
    val got = dist.orderBy("evt").collect()
    assert(got.length == nEntries)
    val evts = driver.find(_.spec.branch == "evt").get.perEntry
    val jags = driver.find(_.spec.branch == "Jet_pt").get.perEntry
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == evts(i).asInstanceOf[Long])
      assert(r.getFloat(1) == i / 2.0f)
      assert(r.getInt(2) == counts(i))
      assert(r.getSeq[Float](3) == jags(i).asInstanceOf[Seq[Float]])
    }
    // fromRoot routes oversized files to the executor path and still
    // writes the sidecar (convert-on-first-read)
    val viaIngest = RootIngest.fromRoot(spark, rootPath, maxDriverBytes = 64L)
    assert(viaIngest.count() == nEntries)
    assert(new java.io.File(RootIngest.convertedPath(rootPath)).exists())
  }

  test("non-flat ROOT file still fails informed, with the converter recipe") {
    val junkTree = Array.fill[Byte](120)(0x15.toByte) // no leaflist strings
    val dir = java.nio.file.Files.createTempDirectory("rootflat2").toString
    val rootPath = s"$dir/opaque.root"
    java.nio.file.Files.write(java.nio.file.Paths.get(rootPath),
      file(keyRecord("TTree", "mytree", "mytree", junkTree.length, zlEnvelope(junkTree))))
    val ex = intercept[UnsupportedOperationException] {
      RootIngest.fromRoot(spark, rootPath)
    }
    assert(ex.getMessage.contains("uproot"))
    assert(ex.getMessage.contains("mytree;1"))
  }
}
