package graft

import graft.sources.{RootBinary, RootIngest}
import java.nio.charset.StandardCharsets

/** Container-layer ROOT reader against a SPEC-BUILT fixture: every byte
  * below is laid out per the published TFile format description (the table
  * at the top of ROOT's own TFile.cxx — offsets cited inline). The fixture
  * is deliberately at the container level only: header, key chain, gap
  * record, and the three compression envelopes — the layer whose layout is
  * fixed and simple enough for a hand-built fixture to be meaningful
  * evidence (the decision record in RootBinary's scaladoc explains why
  * streamed TTree internals are NOT decoded or fixture-tested). */
class RootBinarySpec extends SparkSpec {

  // --- fixture builder (big-endian writers, per the published layout) -----
  private def be2(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
  private def be4(v: Int) =
    Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def str(s: String) = Array[Byte](s.length.toByte) ++ s.getBytes(StandardCharsets.US_ASCII)

  /** A TKey record: header (small-file widths: version 4 < 1000), class /
    * name / title strings, then the payload bytes as given. */
  private def keyRecord(cls: String, name: String, title: String,
      objLen: Int, data: Array[Byte]): Array[Byte] = {
    val names = str(cls) ++ str(name) ++ str(title)
    val keyLen = 18 + 8 + names.length // fixed head + 32-bit fSeekKey/fSeekPdir
    val nBytes = keyLen + data.length
    be4(nBytes) ++ be2(4) ++ be4(objLen) ++ be4(0 /*datime*/) ++
      be2(keyLen) ++ be2(1 /*cycle*/) ++ be4(0) ++ be4(0) ++ names ++ data
  }

  private def zlEnvelope(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length * 2 + 64)
    val n = d.deflate(buf); d.end()
    val body = buf.take(n)
    def le3(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte)
    "ZL".getBytes(StandardCharsets.US_ASCII) ++ Array[Byte](8) ++
      le3(body.length) ++ le3(raw.length) ++ body
  }

  private val rawHist = Array.tabulate[Byte](24)(i => (i * 3).toByte)
  private val treePayload = Array.tabulate[Byte](300)(i => (i % 251).toByte)

  /** Full fixture: header @0 (pad to fBEGIN=100), raw TH1F key, a 32-byte
    * gap record, a ZL-compressed TTree key; fEND closes the chain. */
  private val fixture: Array[Byte] = {
    val rec1 = keyRecord("TH1F", "h_pt", "pt spectrum", rawHist.length, rawHist)
    val gap = be4(-32) ++ Array.fill[Byte](28)(0)
    val rec3 = keyRecord("TTree", "mytree", "reference tree",
      treePayload.length, zlEnvelope(treePayload))
    val begin = 100
    val end = begin + rec1.length + gap.length + rec3.length
    // TFile.cxx layout: "root"@0, fVersion@4, fBEGIN@8, fEND@12,
    // fSeekFree@16, fNbytesFree@20, nfree@24, fNbytesName@28, fUnits@32,
    // fCompress@33, fSeekInfo@37, fNbytesInfo@41 (32-bit widths: v < 1e6)
    val header = "root".getBytes(StandardCharsets.US_ASCII) ++
      be4(63200) ++ be4(begin) ++ be4(end) ++ be4(0) ++ be4(0) ++ be4(0) ++
      be4(58) ++ Array[Byte](4) ++ be4(101) ++ be4(0) ++ be4(0)
    header ++ Array.fill[Byte](begin - header.length)(0) ++ rec1 ++ gap ++ rec3
  }

  test("TFile header: magic, version, bounds, compression") {
    val h = RootBinary.readHeader(fixture).get
    assert(h.version == 63200 && h.begin == 100)
    assert(h.end == fixture.length)
    assert(h.compress == 101 && h.units == 4)
    assert(RootBinary.readHeader("not a root file".getBytes).isEmpty)
  }

  test("key chain walk: census in order, gap records skipped") {
    val keys = RootBinary.listKeys(fixture)
    assert(keys.map(k => (k.className, k.name, k.title)) == Seq(
      ("TH1F", "h_pt", "pt spectrum"),
      ("TTree", "mytree", "reference tree")))
    assert(!keys(0).compressed && keys(1).compressed)
    assert(keys(1).objLen == 300)
  }

  test("payloads: raw pass-through and ZL (zlib) envelope round-trip") {
    val keys = RootBinary.listKeys(fixture)
    assert(RootBinary.payload(fixture, keys(0)).toSeq == rawHist.toSeq)
    assert(RootBinary.payload(fixture, keys(1)).toSeq == treePayload.toSeq)
  }

  test("L4 and ZS envelopes decode via Spark's own codec jars") {
    def le3(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte)
    val raw = Array.tabulate[Byte](500)(i => (i * 7).toByte)
    // L4: ROOT stores an 8-byte xxhash64 of the block before the LZ4 bytes
    val lz = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor().compress(raw)
    val l4body = new Array[Byte](8) ++ lz
    val l4 = keyRecord("TTree", "t", "",
      raw.length, "L4".getBytes ++ Array[Byte](1) ++ le3(l4body.length) ++ le3(raw.length) ++ l4body)
    val zs = {
      val c = com.github.luben.zstd.Zstd.compress(raw)
      keyRecord("TTree", "t", "",
        raw.length, "ZS".getBytes ++ Array[Byte](1) ++ le3(c.length) ++ le3(raw.length) ++ c)
    }
    for (rec <- Seq(l4, zs)) {
      val k = RootBinary.readKey(rec, 0).toOption.get
      assert(RootBinary.payload(rec, k).toSeq == raw.toSeq)
    }
  }

  test("multi-envelope payloads concatenate in order") {
    val a = Array.tabulate[Byte](100)(_.toByte)
    val b = Array.tabulate[Byte](80)(i => (i + 100).toByte)
    val rec = keyRecord("TTree", "t", "", a.length + b.length,
      zlEnvelope(a) ++ zlEnvelope(b))
    val k = RootBinary.readKey(rec, 0).toOption.get
    assert(RootBinary.payload(rec, k).toSeq == (a ++ b).toSeq)
  }

  test("fromRoot without a sidecar reports the file's real census (informed failure)") {
    val dir = java.nio.file.Files.createTempDirectory("rootbin").toString
    val rootPath = s"$dir/sample.root"
    java.nio.file.Files.write(java.nio.file.Paths.get(rootPath), fixture)
    val ex = intercept[UnsupportedOperationException] {
      RootIngest.fromRoot(spark, rootPath)
    }
    // the conversion recipe AND what the native container reader saw
    assert(ex.getMessage.contains("uproot"))
    assert(ex.getMessage.contains("TTree"))
    assert(ex.getMessage.contains("mytree;1"))
    assert(ex.getMessage.contains("ROOT file v63200"))
  }
}
