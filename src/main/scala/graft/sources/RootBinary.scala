package graft.sources

import java.nio.charset.StandardCharsets

/** Pure-JVM reader for the ROOT file CONTAINER layer — the r4-verdict
  * native-decode spike, resolved as: container native, basket decode stays
  * on the converter.
  *
  * What this decodes (all fixed-layout, stable since ROOT 3, published in
  * the TFile format description that ships at the top of ROOT's own
  * `TFile.cxx` and in the uproot docs):
  *   - the TFile header (magic, version, fBEGIN/fEND, compression level),
  *   - the sequential TKey record chain from fBEGIN to fEND (every object
  *     in a ROOT file is one self-describing TKey record: lengths, cycle,
  *     class name, object name, title),
  *   - ROOT's 9-byte compression envelopes: `ZL` (zlib), `L4` (LZ4 with
  *     leading xxhash64 checksum), `ZS` (zstd) — all three codecs are
  *     already on Spark's classpath, so payload decompression needs no new
  *     dependency. Multi-envelope payloads (ROOT chunks at ~16 MB) concat.
  *
  * What this deliberately does NOT decode — the DECISION RECORD for why
  * `RootIngest` keeps the one-time Parquet conversion as the data path:
  *   1. A TTree's branch/basket metadata is a STREAMED C++ object graph
  *      (TTree → TObjArray[TBranch] → fBasketSeek/fLeaves …) whose byte
  *      layout varies with the class VERSION that wrote the file and is
  *      recovered via the file's own StreamerInfo records; a hardcoded
  *      single-version decoder would silently misread files written by any
  *      other ROOT release — the format is self-describing precisely
  *      because the layouts drift.
  *   2. This environment contains no real ROOT file (zero egress, none in
  *      the reference repo), so a basket decoder could only be validated
  *      against fixtures built from the same spec-reading that built the
  *      decoder — circular evidence, not validation. The container layer
  *      below is simple enough (fixed offsets, two dozen fields) for
  *      spec-built fixtures to be meaningful; a streamed TTree is not.
  *   3. At 100 TB the converter is also the PERFORMANCE answer: ROOT
  *      baskets are row-cluster blobs keyed by entry ranges, so a native
  *      Spark datasource would decompress whole baskets per branch with no
  *      predicate pushdown; converting once to Parquet hands every later
  *      scan to the pruned/pushed-down reader Catalyst already optimizes.
  *
  * What the container layer buys today: [[RootIngest.fromRoot]] can open
  * the actual `.root` input, verify it IS a ROOT file, and report its real
  * object census (tree present? compression? entries of what classes?) in
  * the conversion-needed message — an informed failure instead of a blind
  * one, and a foundation any future basket decoder would sit on anyway.
  *
  * Reference parity: the reference's inputs are `.root` samples declared at
  * `/root/reference/phaseII-analysis-FS.yml:10-11` (`tree: myana/mytree`).
  */
object RootBinary {

  /** TFile header, fixed big-endian layout at offset 0 ("root" + fields).
    * Large files (version > 1000000) widen the seek fields to 64 bit. */
  final case class FileHeader(
      version: Int, begin: Long, end: Long, seekFree: Long, nbytesFree: Int,
      nFree: Int, nbytesName: Int, units: Int, compress: Int, seekInfo: Long)

  /** One TKey record header. `dataOffset`/`dataBytes` locate the (possibly
    * compressed) object payload inside the file; `objLen` is its
    * uncompressed length (== dataBytes when stored raw). */
  final case class KeyRecord(
      seek: Long, nBytes: Int, version: Int, objLen: Int, keyLen: Int,
      cycle: Int, className: String, name: String, title: String,
      dataOffset: Long) {
    def dataBytes: Int = nBytes - keyLen
    def compressed: Boolean = dataBytes != objLen
  }

  private def u1(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u2(b: Array[Byte], i: Int): Int = (u1(b, i) << 8) | u1(b, i + 1)
  private def i4(b: Array[Byte], i: Int): Int =
    (u1(b, i) << 24) | (u1(b, i + 1) << 16) | (u1(b, i + 2) << 8) | u1(b, i + 3)
  private def i8(b: Array[Byte], i: Int): Long =
    (i4(b, i).toLong << 32) | (i4(b, i + 4).toLong & 0xffffffffL)
  /** Pascal-style string: 1-byte length, then bytes. Returns (value, next). */
  private def pstr(b: Array[Byte], i: Int): (String, Int) = {
    val n = u1(b, i)
    (new String(b, i + 1, n, StandardCharsets.US_ASCII), i + 1 + n)
  }

  /** Parse the TFile header; None if the magic is absent (not a ROOT file). */
  def readHeader(bytes: Array[Byte]): Option[FileHeader] = {
    if (bytes.length < 64 || !(bytes(0) == 'r' && bytes(1) == 'o' && bytes(2) == 'o' && bytes(3) == 't'))
      return None
    val version = i4(bytes, 4)
    val big = version > 1000000 // fVersion += 1000000 marks 64-bit seeks
    val begin = i4(bytes, 8).toLong
    // after fBEGIN the field widths depend on the large-file flag
    var o = 12
    def seek(): Long = { val v = if (big) i8(bytes, o) else i4(bytes, o).toLong; o += (if (big) 8 else 4); v }
    def int(): Int = { val v = i4(bytes, o); o += 4; v }
    def byte(): Int = { val v = u1(bytes, o); o += 1; v }
    val end = seek(); val seekFree = seek(); val nbytesFree = int()
    val nFree = int(); val nbytesName = int(); val units = byte()
    val compress = int(); val seekInfo = seek()
    Some(FileHeader(version % 1000000, begin, end, seekFree, nbytesFree,
      nFree, nbytesName, units, compress, seekInfo))
  }

  /** Parse the TKey record that starts at `seek`. Gap (deleted) records
    * have a negative nBytes and carry no key — returned as Left(gapSize). */
  def readKey(bytes: Array[Byte], seek: Long): Either[Int, KeyRecord] = {
    val s = seek.toInt
    val nBytes = i4(bytes, s)
    if (nBytes < 0) return Left(-nBytes) // gap: skip |nBytes|
    val version = u2(bytes, s + 4)
    val objLen = i4(bytes, s + 6)
    // s+10: fDatime (4) — skipped
    val keyLen = u2(bytes, s + 14)
    val cycle = u2(bytes, s + 16)
    val big = version > 1000 // TKey v>1000 ⇒ 64-bit seeks
    var o = s + 18
    o += (if (big) 16 else 8) // fSeekKey + fSeekPdir
    val (cls, o1) = pstr(bytes, o)
    val (name, o2) = pstr(bytes, o1)
    val (title, _) = pstr(bytes, o2)
    Right(KeyRecord(seek, nBytes, version, objLen, keyLen, cycle, cls, name,
      title, seek + keyLen))
  }

  /** Walk the sequential record chain fBEGIN → fEND: every stored object
    * in census order, gaps skipped. This needs NO directory decoding —
    * the chain is self-delimiting via each record's nBytes. */
  def listKeys(bytes: Array[Byte]): Seq[KeyRecord] = {
    readHeader(bytes) match {
      case None => Seq.empty
      case Some(h) =>
        val out = Seq.newBuilder[KeyRecord]
        var at = h.begin
        val end = math.min(h.end, bytes.length.toLong)
        while (at < end && at + 18 < bytes.length) {
          readKey(bytes, at) match {
            case Right(k) if k.nBytes > 0 => out += k; at += k.nBytes
            case Right(_) => at = end // zero-length record: corrupt, stop
            case Left(gap) => at += gap
          }
        }
        out.result()
    }
  }

  /** Decompress a ROOT payload: a sequence of 9-byte-header envelopes
    * (`algo[2] method[1] csize[3] usize[3]`, sizes little-endian), each
    * followed by its compressed block; blocks concatenate to objLen bytes.
    * Raw payloads (dataBytes == objLen) pass through. */
  def payload(bytes: Array[Byte], k: KeyRecord): Array[Byte] = {
    val raw = java.util.Arrays.copyOfRange(bytes, k.dataOffset.toInt,
      (k.dataOffset + k.dataBytes).toInt)
    if (!k.compressed) return raw
    val out = new java.io.ByteArrayOutputStream(k.objLen)
    var o = 0
    while (o + 9 <= raw.length) {
      val algo = new String(raw, o, 2, StandardCharsets.US_ASCII)
      def le3(i: Int): Int = (raw(i) & 0xff) | ((raw(i + 1) & 0xff) << 8) | ((raw(i + 2) & 0xff) << 16)
      val csize = le3(o + 3); val usize = le3(o + 6)
      val body = java.util.Arrays.copyOfRange(raw, o + 9, o + 9 + csize)
      val block = algo match {
        case "ZL" =>
          val inf = new java.util.zip.Inflater()
          inf.setInput(body)
          val dst = new Array[Byte](usize)
          var n = 0
          while (n < usize && !inf.finished()) n += inf.inflate(dst, n, usize - n)
          inf.end(); dst
        case "L4" =>
          // ROOT prefixes the LZ4 block with an 8-byte xxhash64 checksum
          val dst = new Array[Byte](usize)
          net.jpountz.lz4.LZ4Factory.fastestInstance().fastDecompressor()
            .decompress(body, 8, dst, 0, usize)
          dst
        case "ZS" =>
          com.github.luben.zstd.Zstd.decompress(body, usize)
        case other =>
          throw new UnsupportedOperationException(
            s"ROOT compression '$other' not supported (ZL/L4/ZS are)")
      }
      out.write(block, 0, block.length)
      o += 9 + csize
    }
    require(out.size == k.objLen,
      s"decompressed ${out.size} bytes, key declares objLen=${k.objLen}")
    out.toByteArray
  }

  /** Human-readable census of a ROOT file's stored objects — what
    * `fromRoot` reports when conversion is still needed. */
  def describe(bytes: Array[Byte]): Option[String] = readHeader(bytes).map { h =>
    val keys = listKeys(bytes)
    val lines = keys.map(k =>
      f"  ${k.className}%-16s ${k.name};${k.cycle}  objLen=${k.objLen}" +
        (if (k.compressed) f" (stored ${k.dataBytes})" else ""))
    s"ROOT file v${h.version}, compress=${h.compress}, ${keys.size} records:\n" +
      lines.mkString("\n")
  }
}
