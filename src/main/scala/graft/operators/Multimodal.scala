package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata, plus a decode → feature-extract stage.
  *
  * The Spark-side plumbing (schema, partition-preserving batched iteration,
  * feature schema) is real and tested; the codec itself is STUBBED with a
  * deterministic byte-histogram "decoder" because no image/audio libraries
  * exist in this container — swap [[FakeMediaDecoder.decode]] for an actual
  * codec call in production. Iteration is `mapPartitions` (the documented
  * last-resort tier: genuine per-partition imperative logic over opaque
  * bytes that Column expressions cannot express). Each partition processes
  * its records as one batch — the same shape a vectorized/Arrow UDF would
  * have — so codec initialization can amortize per partition, and the
  * operator scales embarrassingly with input splits at 100 TB.
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

  /** STUB decoder — deterministic 16-bin byte histogram, normalized.
    * Production: decode image → resize → channel stats / embedding. */
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

  /** Container-format sniffing from magic bytes — pure Column expression
    * (no decode needed for routing/filtering at scale). */
  def sniffFormat(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(hex(substring(bin, 1, 4)) === "89504E47", "png")
      .when(hex(substring(bin, 1, 3)) === "FFD8FF", "jpeg")
      .when(hex(substring(bin, 1, 3)) === "474946", "gif")
      .when(hex(substring(bin, 1, 4)) === "52494646", "riff") // wav/avi container
      .otherwise("unknown")

  /** Decode + feature-extract over a media dataset. Partition-preserving;
    * the decoder is invoked once per record inside a per-partition batch. */
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
        MediaFeatures(r.media_id, fmtName, r.content.length.toLong,
          FakeMediaDecoder.decode(r.content))
      }
    }
  }

  /** Nearest-neighbor resize, treating the payload as a row-major
    * single-channel (gray8) `width × height` raster — REAL pixel math on
    * the plumbing's canonical byte layout (a production codec would decode
    * to exactly this shape first; only the upstream decode is stubbed).
    * Short payloads are zero-padded, matching a decoder's black fill.
    * Partition-preserving mapPartitions; metadata (width/height) is kept
    * consistent with the new raster. */
  def resize(spark: SparkSession, media: Dataset[MediaRecord], newW: Int, newH: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    require(newW > 0 && newH > 0)
    media.mapPartitions { it =>
      it.map { r =>
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

  /** Frame sampling stub: N evenly spaced fixed-width slices of the payload
    * (a video decoder would seek keyframes; the slicing/plumbing is real). */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRecord], n: Int, frameBytes: Int): DataFrame = {
    import spark.implicits._
    media.flatMap { r =>
      val L = r.content.length
      if (L == 0 || n <= 0) Iterator.empty
      else (0 until n).iterator.map { i =>
        val off = math.min((L.toLong * i / n).toInt, math.max(L - 1, 0))
        val end = math.min(off + frameBytes, L)
        (r.media_id, i, r.content.slice(off, end))
      }
    }.toDF("media_id", "frame_idx", "frame")
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
