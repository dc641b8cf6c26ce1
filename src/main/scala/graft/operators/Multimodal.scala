package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata, plus a decode → feature-extract stage.
  *
  * Decode is REAL for every format the standard JDK ships a codec for —
  * PNG/JPEG/BMP/GIF pixels via `javax.imageio`, WAV PCM via
  * `javax.sound.sampled`, animated-GIF frame extraction ([[JdkMediaDecoder]]
  * — public platform APIs, no external dependency). Payloads outside the
  * JDK's codec set (e.g. AVI video streams) fall back to the deterministic
  * byte-histogram / byte-slice tier so every operator stays total; a
  * production codec for those slots into the same per-record branch.
  * Iteration is `mapPartitions` (the documented last-resort tier: genuine
  * per-partition imperative logic over opaque bytes that Column
  * expressions cannot express). Each partition processes its records as
  * one batch — the same shape a vectorized/Arrow UDF would have — so codec
  * initialization can amortize per partition, and the operator scales
  * embarrassingly with input splits at 100 TB.
  */
object Multimodal {

  /** One media object: opaque payload + producer metadata. */
  final case class MediaRecord(
      media_id: Long,
      content: Array[Byte],
      mime_hint: String,
      width: Int,
      height: Int)

  final case class MediaFeatures(
      media_id: Long,
      format: String,
      n_bytes: Long,
      features: Array[Float])

  /** Fallback "decoder" for genuinely OPAQUE payloads (unknown container,
    * codec the JDK lacks, truncated file): deterministic 16-bin byte
    * histogram, normalized — so the feature column is total even when the
    * pixel path isn't. Real decode lives in [[JdkMediaDecoder]]. */
  object FakeMediaDecoder {
    val FeatureDim = 16
    def decode(bytes: Array[Byte]): Array[Float] = {
      val h = new Array[Float](FeatureDim)
      bytes.foreach(b => h((b & 0xff) >> 4) += 1f)
      if (bytes.nonEmpty) {
        var i = 0
        while (i < FeatureDim) { h(i) /= bytes.length; i += 1 }
      }
      h
    }
  }

  /** REAL media decode on the standard JDK (`javax.imageio` for
    * PNG/JPEG/BMP/GIF pixels, `javax.sound.sampled` for WAV PCM) — public
    * platform APIs present in every Java 17 runtime, no external codec
    * dependency. Executor-side usage pattern: each [[extractFeatures]]
    * partition calls these per record; `ImageIO.read` / `AudioSystem`
    * construct fresh reader instances per call, so the object is
    * thread-safe across Spark's task threads, and headless mode is forced
    * once per JVM below (executors have no display).
    *
    * JPEG nuance: pixel values after inverse-DCT may differ by ±1 LSB
    * across JDK builds, so decoded-JPEG FEATURES are near-deterministic,
    * not bit-exact — fine for filtering/embedding tiers; anything needing
    * bit-exactness (dedup fingerprints) must hash the CONTAINER bytes,
    * which is what q56 does. */
  object JdkMediaDecoder {
    System.setProperty("java.awt.headless", "true")

    /** Decoded raster: width, height, row-major ARGB pixels. */
    final case class DecodedImage(width: Int, height: Int, argb: Array[Int])

    def decodeImage(bytes: Array[Byte]): Option[DecodedImage] =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else Some(DecodedImage(img.getWidth, img.getHeight,
          img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)))
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Image features, FeatureDim = 16: [meanR, meanG, meanB, stdLuma,
      * 12-bin luminance histogram (normalized)] — all in [0, 1]. Rec. 601
      * luma weights; deterministic given the decoded raster. */
    def imageFeatures(img: DecodedImage): Array[Float] = {
      val n = img.argb.length.max(1)
      var sr = 0.0; var sg = 0.0; var sb = 0.0; var sl = 0.0; var sl2 = 0.0
      val hist = new Array[Float](12)
      var i = 0
      while (i < img.argb.length) {
        val p = img.argb(i)
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
        val l = 0.299 * r + 0.587 * g + 0.114 * b
        sr += r; sg += g; sb += b; sl += l; sl2 += l * l
        hist(math.min((l / 256.0 * 12).toInt, 11)) += 1f
        i += 1
      }
      val mean = sl / n
      val variance = math.max(sl2 / n - mean * mean, 0.0)
      val out = new Array[Float](FakeMediaDecoder.FeatureDim)
      out(0) = (sr / n / 255.0).toFloat
      out(1) = (sg / n / 255.0).toFloat
      out(2) = (sb / n / 255.0).toFloat
      out(3) = (math.sqrt(variance) / 255.0).toFloat
      i = 0
      while (i < 12) { out(4 + i) = hist(i) / n; i += 1 }
      out
    }

    /** Decoded audio: sample rate, channels, interleaved samples in
      * [-1, 1] (16/8-bit PCM widened to float). */
    final case class DecodedAudio(sampleRate: Float, channels: Int, samples: Array[Float])

    def decodeAudio(bytes: Array[Byte]): Option[DecodedAudio] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val f = in.getFormat
          val raw = in.readAllBytes()
          val bits = f.getSampleSizeInBits
          if (f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED) None
          else {
            val out = new Array[Float](raw.length / (bits / 8))
            var i = 0
            while (i < out.length) {
              val v =
                if (bits == 16) {
                  val lo = raw(2 * i) & 0xff; val hi = raw(2 * i + 1)
                  val s = if (f.isBigEndian) ((raw(2 * i) << 8) | (raw(2 * i + 1) & 0xff)).toShort
                          else ((hi << 8) | lo).toShort
                  s / 32768f
                } else (((raw(i) & 0xff) - 128) / 128f)
              out(i) = v
              i += 1
            }
            Some(DecodedAudio(f.getSampleRate, f.getChannels, out))
          }
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Audio features: [rms, peak, zero-crossing rate, duration seconds]. */
    def audioFeatures(a: DecodedAudio): Array[Float] = {
      val n = a.samples.length.max(1)
      var s2 = 0.0; var peak = 0f; var zc = 0
      var i = 0
      while (i < a.samples.length) {
        val v = a.samples(i)
        s2 += v * v
        if (math.abs(v) > peak) peak = math.abs(v)
        if (i > 0 && (v >= 0) != (a.samples(i - 1) >= 0)) zc += 1
        i += 1
      }
      Array(math.sqrt(s2 / n).toFloat, peak,
        zc.toFloat / n, n.toFloat / a.channels / a.sampleRate)
    }
  }

  /** Container-format sniffing from magic bytes — pure Column expression
    * (no decode needed for routing/filtering at scale). */
  def sniffFormat(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(hex(substring(bin, 1, 4)) === "89504E47", "png")
      .when(hex(substring(bin, 1, 3)) === "FFD8FF", "jpeg")
      .when(hex(substring(bin, 1, 3)) === "474946", "gif")
      .when(hex(substring(bin, 1, 4)) === "52494646", "riff") // wav/avi container
      .otherwise("unknown")

  /** REAL header parsing — pixel dimensions straight from container bytes,
    * no codec library needed (this is how a 100 TB ingest filters
    * by-resolution BEFORE paying for any decode):
    *  - PNG:  IHDR width/height, big-endian u32 at offsets 16/20;
    *  - GIF:  logical-screen width/height, little-endian u16 at 6/8;
    *  - BMP:  BITMAPINFOHEADER width/height, little-endian i32 at 18/22;
    *  - JPEG: marker scan to the first SOFn frame header (height/width
    *    big-endian u16 at +5/+7 inside the segment).
    * Returns None for unknown/truncated containers. */
  def parseDimensions(b: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int): Int = b(i) & 0xff
    def be32(i: Int): Long = (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (b.length >= 24 && be32(0) == 0x89504E47L && be32(4) == 0x0D0A1A0AL &&
        new String(b, 12, 4, "US-ASCII") == "IHDR")
      Some(("png", be32(16).toInt, be32(20).toInt))
    else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
      Some(("gif", le16(6), le16(8)))
    else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      Some(("bmp", le32(18), le32(22)))
    else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG: walk FF-marker segments to the first start-of-frame
      var i = 2
      while (i + 3 < b.length) {
        if (u8(i) != 0xff) return None // desynced — not a valid marker stream
        val m = u8(i + 1)
        // 0xFF after 0xFF is a fill byte, not a standalone marker: any run
        // of fill bytes precedes the real marker, so consume ONE byte and
        // re-sync on the next 0xFF (advancing 2 would swallow the first
        // byte of the true marker and desync the walk on padded files)
        if (m == 0xff) i += 1
        else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2 // standalone
        else {
          val len = be16(i + 2)
          if (len < 2) return None
          val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            return if (i + 8 < b.length) Some(("jpeg", be16(i + 7), be16(i + 5))) else None
          }
          i += 2 + len
        }
      }
      None
    } else None
  }

  /** Parsed audio container metadata — everything a pre-decode audio
    * filter needs (sample rate/channel/duration predicates), straight from
    * header bytes. `frames`/`durationUs` derive from the DECLARED data
    * size, so they are valid even on header-only prefixes of huge files. */
  final case class AudioMeta(codec: String, channels: Int, sampleRate: Long,
      bitsPerSample: Int, frames: Long, durationUs: Long)

  /** REAL WAV (RIFF/WAVE) header parsing — the audio twin of
    * [[parseDimensions]]: walks the chunk list (chunks are (fourcc, LE-u32
    * size, payload) padded to even offsets, in ANY order) to the `fmt ` and
    * `data` chunks. No codec; a 100 TB audio ingest filters by sample
    * rate/channels/duration before paying for any PCM decode. Returns None
    * for non-WAV, truncated, or desynced containers. */
  def parseAudioMeta(b: Array[Byte]): Option[AudioMeta] = {
    def u8(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)) & 0xffffffffL
    def fourcc(i: Int): String = new String(b, i, 4, "US-ASCII")
    if (b.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "WAVE") return None
    var i = 12L
    var fmt: Option[(Int, Int, Long, Int)] = None
    var dataSize: Option[Long] = None
    while (i + 8 <= b.length && (fmt.isEmpty || dataSize.isEmpty)) {
      val id = fourcc(i.toInt)
      val size = le32(i.toInt + 4)
      if (id == "fmt ") {
        if (i + 8 + 16 > b.length || size < 16) return None // truncated fmt
        fmt = Some((le16(i.toInt + 8), le16(i.toInt + 10),
          le32(i.toInt + 12), le16(i.toInt + 22)))
      } else if (id == "data") dataSize = Some(size)
      i += 8 + size + (size & 1) // RIFF pads chunks to even boundaries
    }
    for {
      (af, ch, sr, bits) <- fmt
      ds <- dataSize
      if ch > 0 && sr > 0 && bits >= 8
    } yield {
      val frames = ds / (ch.toLong * (bits / 8))
      AudioMeta(
        if (af == 1) "pcm" else if (af == 3) "ieee_float" else s"fmt_$af",
        ch, sr, bits, frames, frames * 1000000L / sr)
    }
  }

  /** Parsed video container metadata from an AVI main header. */
  final case class VideoMeta(width: Int, height: Int, totalFrames: Long,
      microSecPerFrame: Long, durationUs: Long)

  /** REAL AVI (RIFF/'AVI ') header parsing: descends LIST chunks to the
    * `avih` main header (µs/frame at +0, total frames at +16, width/height
    * at +32/+36 within the payload). Same pre-decode filtering story as
    * [[parseAudioMeta]] — resolution/duration predicates from header bytes
    * alone. */
  def parseVideoMeta(b: Array[Byte]): Option[VideoMeta] = {
    def u8(i: Int): Int = b(i) & 0xff
    def le32(i: Int): Long =
      (u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)) & 0xffffffffL
    def fourcc(i: Int): String = new String(b, i, 4, "US-ASCII")
    if (b.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    def walk(from: Long, limit: Long): Option[VideoMeta] = {
      var i = from
      while (i + 8 <= limit) {
        val id = fourcc(i.toInt)
        val size = le32(i.toInt + 4)
        if (id == "avih") {
          if (i + 8 + 40 > b.length || size < 40) return None
          val p = i.toInt + 8
          val usf = le32(p)
          val frames = le32(p + 16)
          // both fields are unvalidated u32s: a fuzzer-grade header with
          // 0xFFFFFFFF in each would overflow Long into a NEGATIVE
          // duration and silently mislead duration predicates — treat an
          // overflowing product as a corrupt container
          if (usf != 0 && frames > Long.MaxValue / usf) return None
          return Some(VideoMeta(le32(p + 32).toInt, le32(p + 36).toInt,
            frames, usf, frames * usf))
        } else if (id == "LIST") {
          // payload = list type fourcc + subchunks
          val sub = walk(i + 12, math.min(limit, i + 8 + size))
          if (sub.isDefined) return sub
        }
        i += 8 + size + (size & 1)
      }
      None
    }
    walk(12, b.length.toLong)
  }

  /** Column-expression twin of [[parseAudioMeta]] for CANONICAL layouts
    * (`fmt ` as the first chunk at offset 12 — what encoders emit) — audio
    * predicates that stay inside whole-stage codegen; falls back null for
    * non-canonical chunk orders, which route through the imperative tier. */
  def audioMetaColumn(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def le16(off: Int) = {
      val h = hex(substring(bin, off, 2))
      conv(concat(substring(h, 3, 2), substring(h, 1, 2)), 16, 10).cast("long")
    }
    def le32(off: Int) = {
      val h = hex(substring(bin, off, 4))
      conv(concat(substring(h, 7, 2), substring(h, 5, 2), substring(h, 3, 2), substring(h, 1, 2)),
        16, 10).cast("long")
    }
    when(length(bin) >= 36 &&
        hex(substring(bin, 1, 4)) === "52494646" && // RIFF
        hex(substring(bin, 9, 4)) === "57415645" && // WAVE
        hex(substring(bin, 13, 4)) === "666D7420",  // 'fmt '
      struct(
        le16(23).as("channels"),
        le32(25).as("sample_rate"),
        le16(35).as("bits_per_sample")))
      .otherwise(lit(null).cast(
        "struct<channels:bigint,sample_rate:bigint,bits_per_sample:bigint>"))
  }

  /** Column-expression twin of [[parseDimensions]] for the FIXED-OFFSET
    * formats (PNG/GIF) — dimension filtering that stays inside whole-stage
    * codegen with zero imperative code: big-endian u32 via hex→conv;
    * little-endian u16 by swapping the hex byte pairs. Returns a
    * (format, width, height) struct Column (nulls for other formats —
    * JPEG needs the imperative marker scan above). */
  def dimsColumn(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def be32(off: Int) = conv(hex(substring(bin, off, 4)), 16, 10).cast("long")
    def le16(off: Int) = {
      val h = hex(substring(bin, off, 2))
      conv(concat(substring(h, 3, 2), substring(h, 1, 2)), 16, 10).cast("long")
    }
    val fmt = sniffFormat(bin)
    when(fmt === "png" && length(bin) >= 24 && hex(substring(bin, 13, 4)) === "49484452",
        struct(lit("png").as("format"), be32(17).as("width"), be32(21).as("height")))
      .when(fmt === "gif" && length(bin) >= 10,
        struct(lit("gif").as("format"), le16(7).as("width"), le16(9).as("height")))
      .otherwise(lit(null).cast("struct<format:string,width:bigint,height:bigint>"))
  }

  /** Dimension extraction over a media dataset — [[parseDimensions]] in the
    * partition-preserving mapPartitions tier (same batch shape as
    * [[extractFeatures]]); parsed dims are authoritative, falling back to
    * producer metadata when the container is unknown. */
  def withDimensions(spark: SparkSession, media: Dataset[MediaRecord]): DataFrame = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val parsed = parseDimensions(r.content)
        (r.media_id,
          parsed.map(_._1).getOrElse("unknown"),
          parsed.map(_._2).getOrElse(r.width),
          parsed.map(_._3).getOrElse(r.height),
          parsed.isDefined)
      }
    }.toDF("media_id", "format", "width", "height", "parsed")
  }

  /** Decode + feature-extract over a media dataset. Partition-preserving;
    * the decoder is invoked once per record inside a per-partition batch.
    * REAL pixel decode via [[JdkMediaDecoder]] (standard-JDK ImageIO) for
    * PNG/JPEG/BMP/GIF; payloads the JDK cannot decode fall back to the
    * deterministic byte-histogram so the feature column stays total (both
    * paths emit FeatureDim floats — downstream ANN/centroid ops see one
    * schema). */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val fmtName = r.content match {
          case b if b.length >= 4 && b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' => "png"
          case b if b.length >= 3 && b(0) == 0xff.toByte && b(1) == 0xd8.toByte && b(2) == 0xff.toByte => "jpeg"
          case b if b.length >= 3 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' => "gif"
          case b if b.length >= 4 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' => "riff"
          case _ => "unknown"
        }
        val feats = JdkMediaDecoder.decodeImage(r.content)
          .map(JdkMediaDecoder.imageFeatures)
          .getOrElse(FakeMediaDecoder.decode(r.content))
        MediaFeatures(r.media_id, fmtName, r.content.length.toLong, feats)
      }
    }
  }

  /** 64-bit average-hash (aHash) from a decoded raster: the luma plane is
    * box-average-pooled onto an 8×8 grid and each cell thresholded
    * STRICTLY ABOVE the grid mean (flat images hash to 0, never all-ones).
    * Deterministic given the raster; the JPEG ±1-LSB caveat on the decode
    * (scaladoc above) is exactly what a PERCEPTUAL hash tolerates — a
    * borderline cell flips one bit, which the hamming-threshold join
    * absorbs, unlike the byte-exact q56 fingerprints. */
  private[graft] def aHash(img: JdkMediaDecoder.DecodedImage): Long = {
    val sums = new Array[Double](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < img.height) {
      val cy = y * 8 / img.height
      var x = 0
      while (x < img.width) {
        val p = img.argb(y * img.width + x)
        val l = 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)
        val c = cy * 8 + x * 8 / img.width
        sums(c) += l; counts(c) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    var mean = 0.0
    val cell = new Array[Double](64)
    while (i < 64) {
      cell(i) = if (counts(i) > 0) sums(i) / counts(i) else 0.0
      mean += cell(i) / 64.0
      i += 1
    }
    var bits = 0L
    i = 0
    while (i < 64) { if (cell(i) > mean) bits |= (1L << i); i += 1 }
    bits
  }

  /** Perceptual fingerprints for an image corpus: (media_id, phash) with
    * NULL for undecodable payloads (never a fake fingerprint — opaque
    * bytes go through [[extractFeatures]]' fallback tier instead). One
    * BIGINT per image, computed at the codec boundary; everything
    * downstream is relational. */
  def perceptualHash(spark: SparkSession, media: Dataset[MediaRecord]): DataFrame = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map(r => (r.media_id, JdkMediaDecoder.decodeImage(r.content).map(aHash)))
    }.toDF("media_id", "phash")
  }

  /** Image-level near-dup pairs from perceptual hashes — the multimodal
    * face of q47's SimHash tier, at corpus scale on ONE long per image.
    * Pigeonhole banding: hamming(a, b) ≤ maxBits guarantees at least one
    * of maxBits+1 DISJOINT bit-fields is equal, so candidates come from a
    * (band, field) equi-join — cost ∝ bucket sizes, never n² — and exact
    * `bit_count(xor)` verification keeps the output lossless. Identical
    * rasters across lossless containers (PNG/BMP) pair at hamming 0;
    * recompression/noise land within a few bits. */
  def nearDupImages(hashes: DataFrame, maxBits: Int): DataFrame = {
    require(maxBits >= 0 && maxBits < 32, s"maxBits $maxBits out of range")
    val bands = maxBits + 1
    val bandStructs = (0 until bands).map { b =>
      val lo = b * 64 / bands
      val width = (b + 1) * 64 / bands - lo
      struct(lit(b).as("band"),
        shiftrightunsigned(col("phash"), lo)
          .bitwiseAND(lit(if (width == 64) -1L else (1L << width) - 1)).as("sig"))
    }
    val buckets = hashes.filter(col("phash").isNotNull)
      .select(col("media_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("media_id"), col("bb.band").as("band"), col("bb.sig").as("sig"))
    val cand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("a_id"), col("b.media_id").as("b_id"))
      .distinct()
    cand
      .join(hashes.select(col("media_id").as("a_id"), col("phash").as("a_h")), "a_id")
      .join(hashes.select(col("media_id").as("b_id"), col("phash").as("b_h")), "b_id")
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_h").bitwiseXOR(col("b_h"))).as("hamming"))
      .filter(col("hamming") <= maxBits)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Audio decode + feature-extract: REAL WAV PCM decode via the JDK's
    * `javax.sound.sampled` — rms/peak/zero-crossing-rate/duration as typed
    * columns, NULL row values for payloads that are not decodable audio
    * (total over any input, like every filter tier here). Same
    * partition-preserving batch shape as [[extractFeatures]]. */
  def extractAudioFeatures(spark: SparkSession, media: Dataset[MediaRecord]): DataFrame = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        JdkMediaDecoder.decodeAudio(r.content) match {
          case Some(a) =>
            val f = JdkMediaDecoder.audioFeatures(a)
            (r.media_id, Some(a.sampleRate), Some(a.channels),
              Some(f(0)), Some(f(1)), Some(f(2)), Some(f(3)))
          case None =>
            (r.media_id, None: Option[Float], None: Option[Int],
              None: Option[Float], None: Option[Float], None: Option[Float], None: Option[Float])
        }
      }
    }.toDF("media_id", "sample_rate", "channels", "rms", "peak", "zcr", "duration_sec")
  }

  /** Resize. Two tiers, chosen per record:
    *  - REAL image path: payloads ImageIO can decode are pixel-resized
    *    (nearest-neighbor draw onto a `newW × newH` canvas) and re-encoded
    *    as PNG — an actual decode → transform → encode stage on standard
    *    JDK codecs;
    *  - raster fallback: undecodable payloads are treated as a row-major
    *    single-channel gray8 `width × height` raster and nearest-neighbor
    *    sampled directly (short payloads zero-pad, a decoder's black
    *    fill), so the operator stays total over opaque bytes.
    * Partition-preserving mapPartitions; metadata (width/height) is kept
    * consistent with the new raster either way. */
  def resize(spark: SparkSession, media: Dataset[MediaRecord], newW: Int, newH: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    require(newW > 0 && newH > 0)
    media.mapPartitions { it =>
      it.map { r =>
        JdkMediaDecoder.decodeImage(r.content) match {
          case Some(_) =>
            val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
            val dst = new java.awt.image.BufferedImage(newW, newH,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            try {
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
              g.drawImage(src, 0, 0, newW, newH, null)
            } finally g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            MediaRecord(r.media_id, bos.toByteArray, "image/png", newW, newH)
          case None =>
            val out = new Array[Byte](newW * newH)
            if (r.width > 0 && r.height > 0) {
              var y = 0
              while (y < newH) {
                val sy = y * r.height / newH
                var x = 0
                while (x < newW) {
                  val sx = x * r.width / newW
                  val si = sy * r.width + sx
                  out(y * newW + x) = if (si < r.content.length) r.content(si) else 0
                  x += 1
                }
                y += 1
              }
            }
            MediaRecord(r.media_id, out, r.mime_hint, newW, newH)
        }
      }
    }
  }

  /** Frame sampling. REAL tier for the multi-frame format the standard
    * JDK decodes — animated GIF: N evenly spaced frames are pixel-decoded
    * via an ImageIO reader and re-encoded as PNG. Everything else (AVI
    * etc. — codecs the JDK lacks) falls back to N evenly spaced fixed-width
    * byte slices, keeping the operator total and the plumbing identical
    * (a production video codec slots into the same per-record branch). */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRecord], n: Int, frameBytes: Int): DataFrame = {
    import spark.implicits._
    media.flatMap { r =>
      val L = r.content.length
      if (L == 0 || n <= 0) Iterator.empty
      else gifFrames(r.content, n) match {
        case Some(frames) =>
          frames.iterator.zipWithIndex.map { case (f, i) => (r.media_id, i, f) }
        case None =>
          (0 until n).iterator.map { i =>
            val off = math.min((L.toLong * i / n).toInt, math.max(L - 1, 0))
            val end = math.min(off + frameBytes, L)
            (r.media_id, i, r.content.slice(off, end))
          }
      }
    }.toDF("media_id", "frame_idx", "frame")
  }

  /** N evenly spaced real frames of an animated GIF as PNG bytes; None
    * unless the payload is a GIF with at least 2 frames (single images go
    * through [[extractFeatures]]/[[resize]], not frame sampling). */
  private def gifFrames(bytes: Array[Byte], n: Int): Option[Seq[Array[Byte]]] = {
    if (bytes.length < 3 || bytes(0) != 'G' || bytes(1) != 'I' || bytes(2) != 'F') return None
    try {
      val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
      if (!readers.hasNext) return None
      val reader = readers.next()
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(in)
        val total = reader.getNumImages(true)
        if (total < 2) None
        else Some((0 until n).map { i =>
          val idx = math.min((total.toLong * i / n).toInt, total - 1)
          val img = reader.read(idx)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          bos.toByteArray
        })
      } finally { reader.dispose(); in.close() }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  val defs: Seq[QueryDef] = Seq(
    // ---- q56: binary metadata extraction (oracle-checked) -----------------
    // documents.text cast to binary stands in for an opaque payload column:
    // byte length, md5/sha256 checksums, first-byte probe — the metadata
    // tier of the multimodal pipeline, exercised through the gate.
    QueryDef(
      "q56_multimodal_meta",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id",
            length($"text".cast("binary")).as("n_bytes"),
            md5($"text".cast("binary")).as("checksum"),
            sha2($"text".cast("binary"), 256).as("sha256"),
            ascii(substring($"text", 1, 1)).as("first_byte"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  octet_length(encode(text)) AS n_bytes,
             |  md5(text) AS checksum,
             |  sha256(text) AS sha256,
             |  ascii(substr(text, 1, 1)) AS first_byte
             |FROM documents ORDER BY doc_id""".stripMargin)),
  )
}
