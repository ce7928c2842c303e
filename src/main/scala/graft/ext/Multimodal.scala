package graft.ext

import graft.util.Par
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column handling for training-data pipelines (SURVEY §7.5(c)):
  * media payloads ride through the engine as opaque `binary` columns with a
  * typed metadata struct; decode / feature-extract / resize / frame-sample
  * are operators over that representation.
  *
  * The IMAGE and AUDIO decode paths are REAL: PNG payloads (synthesized
  * as genuine PNG files by [[Multimodal.derivePngMediaTable]]) round-trip
  * through the JDK image codec (`javax.imageio` → `BufferedImage` →
  * raster gray samples), and WAV payloads
  * ([[Multimodal.deriveWavMediaTable]]) through the JDK audio codec
  * (`javax.sound.sampled.AudioSystem` → 8-bit PCM frames) in
  * [[Multimodal.decodeOne]]. Video CONTAINER METADATA is real too:
  * [[Multimodal.mp4Meta]] walks genuine ISO-BMFF boxes
  * (ftyp/moov/mvhd/trak — duration, timescale, track count) emitted by
  * [[Multimodal.encodeMp4]]. Only video FRAME decode remains a
  * documented stub in [[Multimodal.decodeOne]] (no JDK video codec
  * exists — public-knowledge constraint): a deterministic byte-derived
  * fake behind the same interface. Everything Spark-side is real and
  * load-bearing either way: the schema, the repartition before the
  * CPU-heavy stage, the iterator-per-partition batch shape of [[decode]]
  * (one decoder instance per partition, streaming through rows — the
  * Scala analogue of a vectorized Python `mapInPandas` decode), and the
  * declarative frame-sampling plan.
  *
  * Scale notes: payloads never enter a shuffle key; the decode stage is
  * spread across cores before the amplifying work; frame sampling explodes
  * a `sequence` bounded by metadata, not by payload size.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, sample_rate: Int,
      n_frames: Int, format: String)
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte],
      meta: MediaMeta)
  case class DecodedMedia(media_id: Long, kind: String,
      features: Array[Double], brightness: Double, width: Int, height: Int)

  /** Hex-slice → bounded int, the md5-keyed metadata derivation also used
    * by the DuckDB oracle: `1 + CAST('0x'||substr(md5, off, 8) AS BIGINT) % bound`.
    */
  private def slice(h: org.apache.spark.sql.Column, off: Int, bound: Int) =
    (conv(substring(h, off, 8), 16, 10).cast("long") % bound + 1).cast("int")

  /** Multimodal ingestion: wrap a documents table into a media table —
    * payload is the UTF-8 text bytes (the deterministic stand-in for real
    * media bytes), kind cycles image/audio/video by id, and the metadata
    * struct is derived from the payload digest so it is stable, realistic
    * in range, and oracle-reproducible.
    */
  def deriveMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = md5(col(textCol))
    docs.select(
      col(idCol).as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        slice(h, 1, 1920).as("width"),
        slice(h, 9, 1080).as("height"),
        element_at(array(lit(8000), lit(16000), lit(44100)),
          (conv(substring(h, 17, 8), 16, 10).cast("long") % 3 + 1).cast("int"))
          .as("sample_rate"),
        slice(h, 25, 240).as("n_frames"),
        element_at(array(lit("png"), lit("wav"), lit("mp4")),
          (col(idCol) % 3 + 1).cast("int")).as("format")
      ).as("meta"))
  }

  /** PNG file signature (RFC 2083 §3.1). */
  private val PngMagic = Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte)

  private def isPng(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == PngMagic(0) && bytes(1) == PngMagic(1) &&
      bytes(2) == PngMagic(2) && bytes(3) == PngMagic(3)

  /** The deterministic gray value of pixel (x,y) in the synthetic PNGs
    * emitted by [[derivePngMediaTable]] — shared by the encoder, the
    * decode spec, and the DuckDB oracle.
    */
  def pngPixel(id: Long, x: Int, y: Int): Int =
    (((id * 31 + x * 7 + y * 13) % 256 + 256) % 256).toInt

  /** Encode a REAL grayscale PNG whose pixels follow [[pngPixel]] —
    * JDK-only (`javax.imageio`), lossless, so a decode round-trip
    * recovers the exact gray values the oracle computes arithmetically.
    */
  def encodePng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pngPixel(id, x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** RIFF/WAVE file signature ("RIFF" at 0, "WAVE" at 8). */
  private def isWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  /** The deterministic 8-bit sample value of frame `i` in the synthetic
    * WAVs emitted by [[deriveWavMediaTable]] — shared by the encoder, the
    * decode spec, and the DuckDB oracle (the audio analogue of
    * [[pngPixel]]).
    */
  def wavSample(id: Long, i: Int): Int =
    (((id * 31 + i * 7) % 256 + 256) % 256).toInt

  /** Encode a REAL RIFF/WAVE file (8-bit unsigned PCM mono) whose samples
    * follow [[wavSample]] — JDK-only (`javax.sound.sampled`), lossless
    * for 8-bit PCM, so a decode round-trip recovers the exact sample
    * values the oracle computes arithmetically.
    */
  def encodeWav(id: Long, sampleRate: Int, nSamples: Int): Array[Byte] = {
    val data = Array.tabulate(nSamples)(i => wavSample(id, i).toByte)
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
      sampleRate.toFloat, 8, 1, 1, sampleRate.toFloat, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode one media record. PNG payloads (detected by the file
    * signature) go through the REAL JDK image codec — `javax.imageio` →
    * `BufferedImage` → raster gray samples: features are the first 16
    * pixels row-major scaled to [0,1], brightness the exact mean gray
    * (integer pixel sum, one division). WAV payloads (RIFF signature) go
    * through the REAL JDK audio codec — `javax.sound.sampled.AudioSystem`
    * → 8-bit PCM frames: the same feature contract over sample values.
    * mp4 payloads keep the documented STUB (no JDK video codec): the
    * contract computed over raw payload bytes.
    */
  def decodeOne(rec: MediaRecord): DecodedMedia = {
    val bytes = rec.payload
    if (isWav(bytes)) {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val data = ais.readAllBytes()
      val features = Array.tabulate(16)(i =>
        if (i < data.length) (data(i) & 0xff) / 255.0 else 0.0)
      val level =
        if (data.isEmpty) 0.0
        else data.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / data.length
      DecodedMedia(rec.media_id, rec.kind, features, level, 0, 0)
    } else if (isPng(bytes)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      val px = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { px(y * w + x) = raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      val features = Array.tabulate(16)(i =>
        if (i < px.length) px(i) / 255.0 else 0.0)
      // Long pixel sum: exact for any image < 2^53 total gray mass, so
      // the single division matches the oracle's bit-for-bit
      DecodedMedia(rec.media_id, rec.kind, features,
        px.foldLeft(0L)(_ + _).toDouble / px.length, w, h)
    } else {
      val features = Array.tabulate(16)(i =>
        if (i < bytes.length) (bytes(i) & 0xff) / 255.0 else 0.0)
      val brightness =
        if (bytes.isEmpty) 0.0
        else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
      DecodedMedia(rec.media_id, rec.kind, features, brightness, 0, 0)
    }
  }

  /** REAL-image media table: one row per image-kind document, payload a
    * genuine PNG file (encoded per partition with `javax.imageio`) whose
    * pixels follow the deterministic [[pngPixel]] formula — so the
    * decode path exercises a real codec while the DuckDB oracle can
    * reproduce the decoded values arithmetically. Dimensions are small
    * (id-derived, ≤ 8×6) and metadata-typed like [[deriveMediaTable]].
    *
    * Scale shape: encode is a map-only typed pass, spread before the
    * CPU-heavy stage; payload bytes never enter a shuffle key.
    */
  def derivePngMediaTable(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val dims = docs.filter(col(idCol) % 3 === 0)
      .select(col(idCol).cast("long").as("media_id"),
        (col(idCol) % 7 + 2).cast("int").as("width"),
        (col(idCol) % 5 + 2).cast("int").as("height"))
    Par.spread(dims).as[(Long, Int, Int)].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // in-memory, no temp files
      it.map { case (id, w, h) =>
        (id, "image", encodePng(id, w, h), MediaMeta(w, h, 0, 1, "png"))
      }
    }.toDF("media_id", "kind", "payload", "meta")
  }

  /** REAL-audio media table: one row per audio-kind document, payload a
    * genuine RIFF/WAVE file (8-bit unsigned PCM mono, encoded per
    * partition with `javax.sound.sampled`) whose samples follow the
    * deterministic [[wavSample]] formula — the audio sibling of
    * [[derivePngMediaTable]]. Sample counts are small (id-derived,
    * 20–69) and metadata-typed.
    */
  def deriveWavMediaTable(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val dims = docs.filter(col(idCol) % 3 === 1)
      .select(col(idCol).cast("long").as("media_id"),
        (col(idCol) % 50 + 20).cast("int").as("n_samples"))
    Par.spread(dims).as[(Long, Int)].mapPartitions { it =>
      it.map { case (id, n) =>
        (id, "audio", encodeWav(id, 8000, n), MediaMeta(0, 0, 8000, n, "wav"))
      }
    }.toDF("media_id", "kind", "payload", "meta")
  }

  // ---- ISO-BMFF (mp4) container metadata -----------------------------

  /** Big-endian ISO-BMFF box: 32-bit size + fourcc + body. */
  private def bmffBox(fourcc: String, body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
    bb.putInt(8 + body.length)
    bb.put(fourcc.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.put(body)
    bb.array()
  }

  private def be32s(vs: Int*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
    vs.foreach(bb.putInt)
    bb.array()
  }

  /** The deterministic container metadata of the synthetic mp4s emitted
    * by [[deriveMp4MediaTable]] — shared by the encoder, the parse spec,
    * and the DuckDB oracle (the video analogue of [[pngPixel]]).
    */
  def mp4Timescale: Int = 600
  def mp4Duration(id: Long): Long = id % 240 + 60
  def mp4Tracks(id: Long): Int = ((id / 3) % 3 + 1).toInt

  /** Encode a REAL (tiny, valid) ISO-BMFF file — ISO/IEC 14496-12 boxes
    * written byte-for-byte: `ftyp` (major brand isom, compatible
    * isom/iso2), `moov` holding a version-0 `mvhd` (timescale
    * [[mp4Timescale]], duration [[mp4Duration]]) and [[mp4Tracks]] `trak`
    * boxes each with a `tkhd`, then `free` and `mdat` trailers so the
    * top-level walk is non-trivial. Frame DATA is deliberately absent:
    * no JDK video codec exists to decode it (public-knowledge
    * constraint), and the metadata boxes are the part a curation pass
    * reads anyway.
    */
  def encodeMp4(id: Long): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val ftyp = bmffBox("ftyp",
      "isom".getBytes(ascii) ++ be32s(0x200) ++
        "isom".getBytes(ascii) ++ "iso2".getBytes(ascii))
    val matrix = be32s(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    val nTracks = mp4Tracks(id)
    // mvhd v0: version/flags, creation, modification, timescale, duration,
    // rate 1.0, volume 1.0 + 10 reserved bytes, matrix, 6×4 pre_defined,
    // next_track_ID
    val mvhd = bmffBox("mvhd",
      be32s(0, 0, 0, mp4Timescale, mp4Duration(id).toInt, 0x10000) ++
        Array[Byte](0x01, 0x00) ++ new Array[Byte](10) ++ matrix ++
        new Array[Byte](24) ++ be32s(nTracks + 1))
    // tkhd v0 (flags: enabled|in_movie = 3): creation, modification,
    // track_ID, reserved, duration, 8 reserved, layer/alt-group/volume/
    // reserved shorts, matrix, width, height
    val traks = (1 to nTracks).map { k =>
      bmffBox("trak", bmffBox("tkhd",
        be32s(3, 0, 0, k, 0, mp4Duration(id).toInt) ++ new Array[Byte](16) ++
          matrix ++ be32s(0, 0)))
    }.reduce(_ ++ _)
    val free = bmffBox("free", new Array[Byte](4))
    val mdat = bmffBox("mdat",
      Array.tabulate(8)(i => (((id + i) % 251) & 0xff).toByte))
    ftyp ++ bmffBox("moov", mvhd ++ traks) ++ free ++ mdat
  }

  /** ISO-BMFF file signature: a leading `ftyp` box. */
  private def isBmff(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && bytes(4) == 'f' && bytes(5) == 't' &&
      bytes(6) == 'y' && bytes(7) == 'p'

  /** Pure-JDK ISO-BMFF box walk (ISO/IEC 14496-12 §4.2): top-level boxes
    * are (32-bit size, fourcc), `size == 1` → 64-bit largesize follows,
    * `size == 0` → box extends to EOF. `ftyp` yields the major brand;
    * `moov`'s children yield `mvhd` — version 0 reads 32-bit
    * timescale/duration at body offsets 8/12, version 1 reads them
    * 64-bit-aware at offsets 16/20 — and one `trak` per track. Returns
    * `(brand, timescale, duration, n_tracks)`, or None when the walk
    * finds no parseable ftyp+mvhd (truncated/malformed payloads are a
    * verdict, not an exception — at 100 TB some rows are always dirty).
    */
  def mp4Meta(bytes: Array[Byte]): Option[(String, Long, Long, Int)] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    def be32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    def be64(o: Int): Long = (be32(o) << 32) | be32(o + 4)
    if (!isBmff(bytes)) return None
    var brand: String = null
    var ts = -1L
    var dur = -1L
    var tracks = 0
    var o = 0L
    var ok = true
    while (ok && o + 8 <= bytes.length) {
      var size = be32(o.toInt)
      val typ = new String(bytes, o.toInt + 4, 4, ascii)
      var hdr = 8L
      if (size == 1L && o + 16 <= bytes.length) {
        size = be64(o.toInt + 8); hdr = 16L
      } else if (size == 0L) size = bytes.length - o
      if (size < hdr || o + size > bytes.length) ok = false
      else {
        if (typ == "ftyp" && size >= hdr + 4)
          brand = new String(bytes, (o + hdr).toInt, 4, ascii)
        if (typ == "moov") {
          var c = o + hdr
          val end = o + size
          while (c + 8 <= end) {
            var cs = be32(c.toInt)
            val ct = new String(bytes, c.toInt + 4, 4, ascii)
            var ch = 8L
            if (cs == 1L && c + 16 <= end) { cs = be64(c.toInt + 8); ch = 16L }
            else if (cs == 0L) cs = end - c
            if (cs < ch || c + cs > end) c = end // malformed child: stop
            else {
              if (ct == "mvhd" && cs >= ch + 4) {
                val ver = bytes((c + ch).toInt) & 0xff
                val b = (c + ch + 4).toInt // after version/flags
                if (ver == 1 && cs >= ch + 4 + 28) {
                  ts = be32(b + 16); dur = be64(b + 20)
                } else if (ver == 0 && cs >= ch + 4 + 16) {
                  ts = be32(b + 8); dur = be32(b + 12)
                }
              }
              if (ct == "trak") tracks += 1
              c += cs
            }
          }
        }
        o += size
      }
    }
    if (brand != null && ts >= 0) Some((brand, ts, dur, tracks)) else None
  }

  /** REAL-container video media table: one row per video-kind document,
    * payload a genuine ISO-BMFF byte stream ([[encodeMp4]]) whose
    * metadata follows the deterministic [[mp4Duration]]/[[mp4Tracks]]
    * formulas — the video sibling of [[derivePngMediaTable]] /
    * [[deriveWavMediaTable]]. Same scale shape: map-only typed encode,
    * spread before the CPU work, payload bytes never in a shuffle key.
    */
  def deriveMp4MediaTable(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ids = docs.filter(col(idCol) % 3 === 2)
      .select(col(idCol).cast("long").as("media_id"))
    Par.spread(ids).as[Long].mapPartitions { it =>
      it.map { id =>
        (id, "video", encodeMp4(id),
          MediaMeta(0, 0, 0, (id % 12 + 1).toInt, "mp4"))
      }
    }.toDF("media_id", "kind", "payload", "meta")
  }

  /** Container-metadata parse stage over a video media table: the box
    * walk ([[mp4Meta]]) per row, iterator-per-partition like [[decode]].
    * Unparseable payloads are dropped (the walk is the verdict); output
    * (`media_id`, `brand`, `timescale`, `duration`, `n_tracks`).
    */
  def mp4MetaTable(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    Par.spread(media.select(col("media_id"), col("payload")))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        mp4Meta(payload).map { case (brand, ts, dur, n) =>
          (id, brand, ts, dur, n)
        }
      })
      .toDF("media_id", "brand", "timescale", "duration", "n_tracks")
  }

  /** Decode stage: typed, batch-shaped (iterator per partition — decoder
    * state is instantiated once per partition, rows stream through),
    * spread across cores before the CPU-heavy work. PNG rows hit the real
    * `javax.imageio` codec; other formats the documented stub (see
    * [[decodeOne]]).
    */
  def decode(media: DataFrame): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    Par.spread(media).as[MediaRecord].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition codec state
      it.map(decodeOne)
    }
  }

  /** Resize: deterministic down-sample of the feature vector by `stride`
    * (every stride-th feature) — the stand-in for a real pixel resize,
    * expressed declaratively so it stays in codegen.
    */
  def resizeFeatures(decoded: Dataset[DecodedMedia], stride: Int): DataFrame =
    decoded.toDF().select(col("media_id"), col("kind"),
      filter(transform(col("features"), (v, i) =>
        when(i % stride === 0, v)), v => v.isNotNull).as("features_small"),
      col("brightness"))

  /** Frame sampling for video rows: every `everyN`-th frame index from the
    * metadata frame count, each with a deterministic frame fingerprint
    * (md5 over payload digest + frame number). The explode is bounded by
    * `meta.n_frames` — metadata, not payload bytes — so plan size is
    * independent of media size.
    */
  def sampleFrames(media: DataFrame, everyN: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), md5(col("payload")).as("_ph"),
        col("meta.n_frames").as("n_frames"))
      .select(col("media_id"), col("_ph"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_no"))
      .filter(col("frame_no") % everyN === 0)
      .select(col("media_id"), col("frame_no"),
        md5(concat_ws(":", col("_ph"), col("frame_no"))).as("frame_fp"))
}
