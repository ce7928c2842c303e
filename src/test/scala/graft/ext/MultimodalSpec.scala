package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SURVEY §7.5(c): multimodal column plumbing — schema, metadata ranges,
  * decode batch shape, resize, frame sampling.
  */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "an image-kind document with enough text to be a payload"),
    (1L, "an audio-kind document"),
    (2L, "a video-kind document body"),
    (5L, "another video one")
  ).toDF("doc_id", "text")

  private lazy val media = Multimodal.deriveMediaTable(docs, "doc_id", "text")

  test("deriveMediaTable: schema, kind cycle, metadata in realistic ranges") {
    assert(media.schema("payload").dataType.typeName === "binary")
    val rows = media.select("media_id", "kind", "meta.width", "meta.height",
      "meta.sample_rate", "meta.n_frames", "meta.format").collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(0L).getString(1) === "image" && byId(0L).getString(6) === "png")
    assert(byId(1L).getString(1) === "audio")
    assert(byId(2L).getString(1) === "video" && byId(5L).getString(1) === "video")
    rows.foreach { r =>
      assert(r.getInt(2) >= 1 && r.getInt(2) <= 1920)
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 1080)
      assert(Set(8000, 16000, 44100).contains(r.getInt(4)))
      assert(r.getInt(5) >= 1 && r.getInt(5) <= 240)
    }
  }

  test("deriveMediaTable: payload is the exact UTF-8 bytes, deterministic") {
    val r = media.filter($"media_id" === 1L).select("payload").head()
    assert(new String(r.getAs[Array[Byte]](0), "UTF-8") === "an audio-kind document")
  }

  test("decodeOne: deterministic fake decoder honors byte content") {
    val rec = Multimodal.MediaRecord(7L, "image", Array[Byte](0, -1, 64),
      Multimodal.MediaMeta(1, 1, 8000, 1, "png"))
    val d = Multimodal.decodeOne(rec)
    assert(d.features.length === 16)
    assert(d.features(0) === 0.0)
    assert(d.features(1) === 1.0)          // 0xff
    assert(d.features(3) === 0.0)          // padding past payload
    assert(math.abs(d.brightness - (0 + 255 + 64) / 3.0) < 1e-12)
    val d2 = Multimodal.decodeOne(rec) // deterministic
    assert(d2.features.toSeq === d.features.toSeq && d2.brightness === d.brightness)
  }

  test("decode: typed mapPartitions stage preserves ids and kinds") {
    val decoded = Multimodal.decode(media).collect()
    assert(decoded.map(_.media_id).sorted === Array(0L, 1L, 2L, 5L))
    assert(decoded.forall(_.features.length == 16))
  }

  test("resizeFeatures: stride-4 keeps features 0,4,8,12") {
    val decoded = Multimodal.decode(media)
    val full = decoded.collect().map(d => d.media_id -> d.features).toMap
    val small = Multimodal.resizeFeatures(decoded, 4)
      .select("media_id", "features_small").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    small.foreach { case (id, fs) =>
      assert(fs === Seq(0, 4, 8, 12).map(full(id)))
    }
  }

  test("sampleFrames: only videos, every Nth index, bounded by n_frames") {
    val nf = media.filter($"kind" === "video")
      .select($"media_id", $"meta.n_frames").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val frames = Multimodal.sampleFrames(media, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(frames.map(_._1).toSet === nf.keySet)
    nf.foreach { case (id, n) =>
      val fs = frames.filter(_._1 == id).map(_._2).sorted
      assert(fs === (0 until n by 5).toArray)
    }
    assert(frames.map(_._3).distinct.length === frames.length) // unique fps
  }
}
