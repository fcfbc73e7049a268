package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A multimodal asset: opaque binary payload + typed metadata. The engine
  * treats media exactly like a 100 TB training pipeline would: payloads are
  * `binary` columns riding the columnar format (parquet keeps them
  * compressed and column-pruned away unless projected), metadata is a typed
  * struct usable in predicates WITHOUT touching the payload bytes. */
final case class MediaAsset(
    asset_id: Long, format: String, payload: Array[Byte],
    width: Int, height: Int, channels: Int, sample_rate: Int)

/** Decoded features of one asset (the stub decoder's output shape). */
final case class MediaFeatures(
    asset_id: Long, format: String, n_bytes: Long,
    mean_byte: Double, byte_hist: Array[Long])

/** Output row of the fused resize+decode pass: resized dimensions plus the
  * feature stats of the RESIZED payload. */
final case class ResizedFeatures(
    asset_id: Long, format: String, width: Int, height: Int,
    n_bytes: Long, mean_byte: Double)

/** STUB DECODER — deterministic fake. A real deployment would link an image/
  * audio codec (javacpp-ffmpeg, twelvemonkeys, …) and decode `payload` into
  * pixels/samples here; those libraries are not available in this
  * environment, so the "decode" is a deterministic byte-level computation
  * with the same interface, batch shape and cost profile. Everything AROUND
  * this stub — schema, partitioning, per-partition batch iteration — is the
  * real Spark plumbing a production decoder would use unchanged. */
object FakeDecoder {
  val HistBuckets = 16

  /** STUB RESIZE — keeps every `stride`-th payload byte and divides the
    * spatial metadata by `stride` (ceiling). A real codec would decode,
    * box-filter, re-encode; the interface (binary in → binary out, metadata
    * transformed alongside) is what the pipeline plumbing exercises. */
  def resize(a: MediaAsset, stride: Int): MediaAsset = {
    val n = (a.payload.length + stride - 1) / stride
    val out = new Array[Byte](math.max(n, 0))
    var i = 0
    while (i < n) { out(i) = a.payload(i * stride); i += 1 }
    a.copy(payload = out,
      width = (a.width + stride - 1) / stride,
      height = (a.height + stride - 1) / stride)
  }

  def decode(a: MediaAsset): MediaFeatures = {
    val hist = new Array[Long](HistBuckets)
    var sum = 0L
    var i = 0
    while (i < a.payload.length) {
      val b = a.payload(i) & 0xff
      hist(b * HistBuckets / 256) += 1
      sum += b
      i += 1
    }
    val mean = if (a.payload.length == 0) 0.0 else sum.toDouble / a.payload.length
    MediaFeatures(a.asset_id, a.format, a.payload.length.toLong, mean, hist)
  }
}

/** Multimodal column operators. */
object MultimodalOps {

  /** Derive a deterministic media-asset table from `documents`: the text
    * bytes play the role of an encoded payload; format and metadata are
    * derived from the id. (The driver testdata has no binary table — this
    * keeps inputs driver-provided while exercising real binary columns.) */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(lit(Array("audio", "image", "video")),
        (col("doc_id") % 3).cast("int") + 1).as("format"),
      col("text").cast("binary").as("payload"),
      ((col("doc_id") % 640) + 1).cast("int").as("width"),
      ((col("doc_id") % 480) + 1).cast("int").as("height"),
      lit(3).cast("int").as("channels"),
      lit(16000).cast("int").as("sample_rate"))

  /** Decode/feature-extract via the stub decoder: typed per-partition
    * iteration (`mapPartitions`) — the shape a real codec needs (native
    * context reused across a partition's assets, no shuffle, payload bytes
    * never leave the task). Repartition by `format` first so one task runs
    * one codec. */
  def decodeFeatures(assets: DataFrame): Dataset[MediaFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      // range-partition on (format, id): tasks stay (mostly) single-format
      // for codec reuse while parallelism scales with the corpus, not with
      // the number of formats
      .repartitionByRange(spark.sparkContext.defaultParallelism,
        col("format"), col("asset_id"))
      .as[MediaAsset]
      .mapPartitions(_.map(FakeDecoder.decode))
  }

  /** Resize + feature-extract fused in ONE typed per-partition pass (the
    * codec context is opened once per task and reused for both ops — the
    * shape a real decoder/scaler pipeline needs). The resized payload stays
    * inside the task; only dimensions and stats of the RESIZED bytes come
    * out. */
  def resizeFeatures(assets: DataFrame, stride: Int = 2): Dataset[ResizedFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .repartitionByRange(spark.sparkContext.defaultParallelism,
        col("format"), col("asset_id"))
      .as[MediaAsset]
      .mapPartitions(_.map { a =>
        val r = FakeDecoder.resize(a, stride)
        val f = FakeDecoder.decode(r)
        ResizedFeatures(a.asset_id, a.format, r.width, r.height,
          f.n_bytes, f.mean_byte)
      })
  }

  /** Metadata + frame-sampling over the binary payload with pure Catalyst
    * expressions (no decode): size, a rolling-hash checksum of the decoded
    * char stream (binary → string round-trip), and up to `maxFrames` bytes
    * sampled every `stride` positions — the "thumbnail strip" access
    * pattern, reading only the projected columns. */
  def sampleFrames(assets: DataFrame, stride: Int = 64, maxFrames: Int = 8): DataFrame = {
    val decoded = decode(col("payload"), "UTF-8")
    val nFrames = (floor((length(decoded) - 1) / stride) + 1).cast("long")
    val frames = transform(
      sequence(lit(0L), least(nFrames, lit(maxFrames.toLong)) - 1),
      i => ascii(decoded.substr(i.cast("int") * stride + 1, lit(1))).cast("string"))
    assets.select(
      col("asset_id"), col("format"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      TextOps.fingerprint(TextOps.tokens(decoded)).as("checksum"),
      concat_ws(",", frames).as("frame_codes"))
  }
}
