package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.{FakeMediaDecoder, MediaRecord}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10) ++ Array.fill[Byte](100)(7)
  private val jpg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte) ++ Array.fill[Byte](50)(33)
  private val unk = Array.fill[Byte](64)(1)

  private lazy val media = spark.createDataset(Seq(
    MediaRecord(1L, png, "image/png", 640, 480),
    MediaRecord(2L, jpg, "image/jpeg", 800, 600),
    MediaRecord(3L, unk, "application/octet-stream", 0, 0)))

  test("format sniffing via magic bytes (Column expression)") {
    val got = media.toDF()
      .select($"media_id", Multimodal.sniffFormat($"content").as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "png", 2L -> "jpeg", 3L -> "unknown"))
  }

  test("feature extraction: schema, determinism, normalized histogram") {
    val f1 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq, "decoder must be deterministic")
    assert(f1.forall(_.features.length == FakeMediaDecoder.FeatureDim))
    f1.foreach { f =>
      assert(math.abs(f.features.map(_.toDouble).sum - 1.0) < 1e-5, s"histogram of ${f.media_id} must normalize")
    }
    assert(f1.map(f => f.media_id -> f.format).toMap ==
      Map(1L -> "png", 2L -> "jpeg", 3L -> "unknown"))
    assert(f1.find(_.media_id == 1L).get.n_bytes == png.length)
  }

  test("frame sampling stub: n evenly spaced slices with real bytes") {
    val frames = Multimodal.sampleFrames(spark, media, n = 4, frameBytes = 8)
    val perId = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perId == Map(1L -> 4, 2L -> 4, 3L -> 4))
    val first = frames.filter($"media_id" === 1 && $"frame_idx" === 0)
      .select($"frame").head().getAs[Array[Byte]](0)
    assert(first.take(4).toSeq == png.take(4).toSeq, "frame 0 starts at payload start")
  }

  test("nearest-neighbor resize: exact pixel mapping on a gray8 raster") {
    // 4×4 gradient raster 0..15; 2×2 nearest-neighbor keeps rows 0,2 / cols 0,2
    val raster = Array.tabulate[Byte](16)(_.toByte)
    val one = spark.createDataset(Seq(MediaRecord(9L, raster, "image/gray8", 4, 4)))
    val out = Multimodal.resize(spark, one, 2, 2).collect().head
    assert(out.width == 2 && out.height == 2)
    assert(out.content.toSeq == Seq[Byte](0, 2, 8, 10))
    // upscale back: every output pixel must come from the 2×2 source
    val up = Multimodal.resize(spark, Multimodal.resize(spark, one, 2, 2), 4, 4).collect().head
    assert(up.content.toSet.subsetOf(Set[Byte](0, 2, 8, 10)))
    // zero-area metadata (unknown dims) yields black output, no crash
    val z = Multimodal.resize(spark, media, 2, 2).filter(_.media_id == 3L).collect().head
    assert(z.content.toSeq == Seq[Byte](0, 0, 0, 0))
  }

  test("partitioning is preserved through the decode stage") {
    val repart = media.repartition(3)
    val out = Multimodal.extractFeatures(spark, repart)
    assert(out.rdd.getNumPartitions == 3)
  }
}
