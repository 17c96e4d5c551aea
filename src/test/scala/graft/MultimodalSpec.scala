package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaCodec, MediaFile}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf0)

  test("syntheticMedia: binary payload + typed metadata schema") {
    val media = Multimodal.syntheticMedia(docs)
    val f = media.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(f("bytes") == "binary")
    assert(f("kind") == "string")
    assert(f("duration_ms") == "bigint")
    // kinds are assigned deterministically by id
    val kinds = media.select("kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
    // images carry dimensions, audio/video carry duration
    assert(media.filter(col("kind") === "image" && col("width") =!= 64)
      .count() == 0)
    assert(media.filter(col("kind") =!= "image" && col("duration_ms") <= 0)
      .count() == 0)
  }

  test("extractFeatures: distributed batched decode, deterministic") {
    val ds = Multimodal.mediaDataset(spark, docs)
    val feats = Multimodal.extractFeatures(ds, batchSize = 16, featureDim = 8)
    val rows = feats.collect()
    assert(rows.length == docs.count())
    assert(rows.forall(_.feature.length == 8))
    assert(rows.forall(r => r.n_bytes > 0))
    // determinism: same input → same features on re-execution
    val again = Multimodal.extractFeatures(ds, batchSize = 16, featureDim = 8)
      .collect().map(r => r.media_id -> r.feature.toVector).toMap
    assert(rows.forall(r => again(r.media_id) == r.feature.toVector))
  }

  test("decode stub: resize and frame-sample arithmetic") {
    val m = MediaFile(1L, "image", Array.fill[Byte](100)(42), "x", 10, 10, 0)
    val d = MediaCodec.decodeStub(m)
    assert(d.width == 10 && d.height == 10)
    assert(d.samples.forall(_ == 42 / 255.0f))
    val r = MediaCodec.resize(d, 4, 4)
    assert(r.samples.length == 16)
    val frames = MediaCodec.sampleFrames(d.copy(kind = "video"), 4)
    assert(frames.length == 4)
  }

  test("decode stub: empty payload decodes to zero features, no crash") {
    val m = MediaFile(7L, "image", Array.empty[Byte], "x", 0, 0, 0)
    val d = MediaCodec.decodeStub(m)
    assert(d.samples.isEmpty)
    val feats = Multimodal.extractFeatures(Seq(m).toDS(), featureDim = 8)
      .collect().head
    assert(feats.n_bytes == 0L)
    assert(feats.mean_sample == 0f)
    assert(feats.feature.toSeq == Seq.fill(8)(0f))
  }

  test("byteStatsByKind aggregates binary lengths") {
    val stats = Multimodal.byteStatsByKind(Multimodal.syntheticMedia(docs))
      .collect().map(r => r.getAs[String]("kind") ->
        r.getAs[Long]("total_bytes")).toMap
    assert(stats.size == 3)
    assert(stats.values.forall(_ > 0))
  }
}
