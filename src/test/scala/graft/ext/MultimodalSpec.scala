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

  test("REAL PNG round-trip: a known 2x2 PNG decodes to its exact " +
    "pixel features and mean-gray brightness") {
    // pngPixel(0, x, y) = (7x + 13y) % 256 → pixels row-major: 0, 7, 13, 20
    val png = Multimodal.encodePng(0L, 2, 2)
    assert(png.take(4).map(_ & 0xff).toSeq === Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt))
    val d = Multimodal.decodeOne(Multimodal.MediaRecord(0L, "image", png,
      Multimodal.MediaMeta(2, 2, 0, 1, "png")))
    assert(d.width === 2 && d.height === 2)
    assert(d.features.take(4).toSeq ===
      Seq(0.0, 7 / 255.0, 13 / 255.0, 20 / 255.0))
    assert(d.features.drop(4).forall(_ == 0.0)) // padded past 4 pixels
    assert(d.brightness === (0 + 7 + 13 + 20) / 4.0)
  }

  test("derivePngMediaTable + decode: real codec path, distributed — " +
    "every decoded raster value matches the pixel formula") {
    val pdocs = Seq.tabulate(12)(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    val tbl = Multimodal.derivePngMediaTable(pdocs, "doc_id")
    val out = Multimodal.decode(tbl).collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq === Seq(0L, 3L, 6L, 9L))
    out.foreach { d =>
      val (w, h) = ((d.media_id % 7 + 2).toInt, (d.media_id % 5 + 2).toInt)
      assert(d.width === w && d.height === h)
      (0 until math.min(16, w * h)).foreach { i =>
        assert(d.features(i) ===
          Multimodal.pngPixel(d.media_id, i % w, i / w) / 255.0)
      }
      val mean = (for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.pngPixel(d.media_id, x, y)).sum.toDouble / (w * h)
      assert(d.brightness === mean)
    }
  }

  test("REAL WAV round-trip: a known 4-sample WAV decodes to its exact " +
    "sample features and mean level") {
    // wavSample(1, i) = (31 + 7i) % 256 → 31, 38, 45, 52
    val wav = Multimodal.encodeWav(1L, 8000, 4)
    assert(new String(wav.take(4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    val d = Multimodal.decodeOne(Multimodal.MediaRecord(1L, "audio", wav,
      Multimodal.MediaMeta(0, 0, 8000, 4, "wav")))
    assert(d.features.take(4).toSeq ===
      Seq(31 / 255.0, 38 / 255.0, 45 / 255.0, 52 / 255.0))
    assert(d.features.drop(4).forall(_ == 0.0))
    assert(d.brightness === (31 + 38 + 45 + 52) / 4.0)
  }

  test("deriveWavMediaTable + decode: real audio codec path, distributed " +
    "— every decoded frame matches the sample formula") {
    val pdocs = Seq.tabulate(12)(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    val out = Multimodal.decode(
      Multimodal.deriveWavMediaTable(pdocs, "doc_id")).collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq === Seq(1L, 4L, 7L, 10L))
    out.foreach { d =>
      val n = (d.media_id % 50 + 20).toInt
      (0 until 16).foreach { i =>
        val exp = if (i < n) Multimodal.wavSample(d.media_id, i) / 255.0 else 0.0
        assert(d.features(i) === exp)
      }
      val mean = (0 until n).map(Multimodal.wavSample(d.media_id, _))
        .sum.toDouble / n
      assert(d.brightness === mean)
    }
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

  test("mp4Meta: walks real ISO-BMFF boxes — brand, timescale, duration, " +
    "tracks round-trip encodeMp4; v1 mvhd and malformed payloads handled") {
    for (id <- Seq(2L, 5L, 8L, 11L, 119L)) {
      val got = Multimodal.mp4Meta(Multimodal.encodeMp4(id))
      assert(got === Some(("isom", 600L, Multimodal.mp4Duration(id),
        Multimodal.mp4Tracks(id))))
    }
    // version-1 mvhd (64-bit creation/modification/duration): hand-built
    def be32(v: Int) = java.nio.ByteBuffer.allocate(4).putInt(v).array()
    def be64(v: Long) = java.nio.ByteBuffer.allocate(8).putLong(v).array()
    def box(t: String, b: Array[Byte]) =
      be32(8 + b.length) ++ t.getBytes("US-ASCII") ++ b
    val mvhd1 = box("mvhd", be32(0x01000000) ++ be64(0L) ++ be64(0L) ++
      be32(90000) ++ be64(4503599627370496L) ++ be32(0x10000) ++
      new Array[Byte](12) ++ new Array[Byte](36) ++ new Array[Byte](24) ++
      be32(2))
    val v1 = box("ftyp", "mp42".getBytes("US-ASCII") ++ be32(0)) ++
      box("moov", mvhd1 ++ box("trak", Array.emptyByteArray))
    assert(Multimodal.mp4Meta(v1) ===
      Some(("mp42", 90000L, 4503599627370496L, 1)))
    // malformed: not BMFF, truncated box, child size overrunning moov —
    // all verdicts (None or best-effort), never exceptions
    assert(Multimodal.mp4Meta(Array[Byte](1, 2, 3)) === None)
    assert(Multimodal.mp4Meta("ABCDEFGHIJKL".getBytes("US-ASCII")) === None)
    val truncated = Multimodal.encodeMp4(2L).take(40)
    assert(Multimodal.mp4Meta(truncated).isEmpty ||
      Multimodal.mp4Meta(truncated).nonEmpty) // total: no throw
    val badChild = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0)) ++
      box("moov", be32(9999) ++ "trak".getBytes("US-ASCII"))
    assert(Multimodal.mp4Meta(badChild) === None) // no mvhd parsed
  }

  test("mp4MetaTable: distributed parse matches the per-id formulas") {
    val vids = Multimodal.deriveMp4MediaTable(docs, "doc_id")
    val out = Multimodal.mp4MetaTable(vids).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).sortBy(_._1)
    val ids = docs.filter($"doc_id" % 3 === 2).select($"doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(out.map(_._1).toSeq === ids.toSeq)
    out.foreach { case (id, brand, ts, dur, n) =>
      assert(brand === "isom" && ts === 600L &&
        dur === Multimodal.mp4Duration(id) && n === Multimodal.mp4Tracks(id))
    }
  }
}
