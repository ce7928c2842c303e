package graft.ext

import graft.util.Par
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column handling for training-data pipelines (SURVEY §7.5(c)):
  * media payloads ride through the engine as opaque `binary` columns with a
  * typed metadata struct; decode / feature-extract / resize / frame-sample
  * are operators over that representation.
  *
  * The decode step itself is a STUB — this container has no image/audio
  * codecs, so [[Multimodal.decodeOne]] produces a deterministic fake
  * (byte-derived "pixels") behind the same interface a real decoder would
  * use. Everything Spark-side is real and load-bearing: the schema, the
  * repartition before the CPU-heavy stage, the iterator-per-partition batch
  * shape of [[decode]] (one decoder instance per partition, streaming
  * through rows — the Scala analogue of a vectorized Python `mapInPandas`
  * decode), and the declarative frame-sampling plan.
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
      features: Array[Double], brightness: Double)

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

  /** STUB decoder — deterministic fake standing in for a real codec
    * (javax.imageio / ffmpeg binding). Consumes the payload bytes exactly
    * like a real decoder would; emits a fixed-width feature vector (first
    * 16 bytes scaled to [0,1]) and a global brightness (mean byte value).
    */
  def decodeOne(rec: MediaRecord): DecodedMedia = {
    val bytes = rec.payload
    val features = Array.tabulate(16)(i =>
      if (i < bytes.length) (bytes(i) & 0xff) / 255.0 else 0.0)
    val brightness =
      if (bytes.isEmpty) 0.0
      else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
    DecodedMedia(rec.media_id, rec.kind, features, brightness)
  }

  /** Decode stage: typed, batch-shaped (iterator per partition — decoder
    * state would be instantiated once per partition, rows stream through),
    * spread across cores before the CPU-heavy work.
    */
  def decode(media: DataFrame): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    Par.spread(media).as[MediaRecord].mapPartitions { it =>
      // real impl: val decoder = Codec.open(...) once per partition
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
