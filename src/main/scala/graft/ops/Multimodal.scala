package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline.
  *
  * Images/audio/video are opaque `binary` payloads with typed metadata; the
  * Spark-side plumbing (schema, batched per-partition processing, feature
  * output shape) is real and tested, while the actual codec step is a
  * clearly-marked deterministic STUB — the decode libraries are not in this
  * container, so [[Multimodal.stubDecode]] derives features purely from the
  * bytes (byte histogram moments standing in for decoded-signal features).
  * Swapping in a real decoder changes only the function body: the batching,
  * partitioning, and schema contracts stay.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      media_type: String, // image | audio | video
      payload: Array[Byte],
      width: Int, height: Int, duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      byte_mean: Double,
      byte_entropy: Double,
      feature: Array[Float]) // fixed 16-dim feature vector

  /** Derive a deterministic media table from the documents table (payload =
    * UTF-8 bytes of the text; type round-robins) — the fixture generator. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      (pmod(col("doc_id"), lit(640)) + 16).cast("int").as("width"),
      (pmod(col("doc_id"), lit(480)) + 16).cast("int").as("height"),
      (pmod(col("doc_id"), lit(90000)) + 1000).as("duration_ms"))

  /** STUB decode: deterministic features from raw bytes. A real
    * implementation would decode the codec here (per-partition, so codec
    * state initializes once per task — the batching contract). */
  def stubDecode(payload: Array[Byte]): (Double, Double, Array[Float]) = {
    val hist = new Array[Long](256)
    var i = 0
    while (i < payload.length) { hist(payload(i) & 0xff) += 1; i += 1 }
    val n = math.max(payload.length, 1).toDouble
    var mean = 0.0
    var ent = 0.0
    var b = 0
    while (b < 256) {
      mean += b * hist(b) / n
      if (hist(b) > 0) { val p = hist(b) / n; ent -= p * math.log(p) / math.log(2) }
      b += 1
    }
    val feat = new Array[Float](16)
    b = 0
    while (b < 256) { feat(b % 16) += (hist(b) / n).toFloat; b += 1 }
    (mean, ent, feat)
  }

  /** Batched feature extraction: typed `mapPartitions` so any real decoder
    * initializes once per partition (the Scala analog of `mapInPandas`
    * batch processing). Output is a flat, columnar-friendly schema. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens HERE (codec handles, model weights, …)
        it.map { case (id, mt, payload) =>
          val (mean, ent, feat) = stubDecode(payload)
          MediaFeatures(id, mt, payload.length.toLong, mean, ent, feat)
        }
      }
  }

  /** Deterministic frame sampling as FLAT rows (one row per sampled frame)
    * — the scan-shaped form a downstream decode stage consumes, fully
    * codegen'd (explode + native fingerprint expression; no lambda HOFs).
    * `frame_key` is a content-derived shard/cache key. */
  def frameSampleRows(media: DataFrame, everyMs: Long = 10000L): DataFrame =
    media.filter(col("media_type") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0L), (col("duration_ms") / everyMs).cast("long")))
          .as("frame_idx"))
      .select(col("media_id"),
        col("frame_idx").cast("int").as("frame_idx"),
        (col("frame_idx") * everyMs).as("frame_ts_ms"),
        graft.functions.TextHash.fingerprint64(
          concat_ws(":", col("media_id"), col("frame_idx"))).as("frame_key"))

  /** Deterministic frame sampling plan for video rows: every `everyMs` ms —
    * pure column exprs, exercises the array-of-struct output shape a real
    * frame sampler would produce. */
  def frameSamplePlan(media: DataFrame, everyMs: Long = 10000L): DataFrame =
    media.filter(col("media_type") === "video")
      .select(col("media_id"), col("duration_ms"),
        transform(sequence(lit(0L), (col("duration_ms") / everyMs).cast("long")),
          i => struct((i * everyMs).as("frame_ts_ms"),
            pmod(xxhash64(col("media_id"), i), lit(1000000)).as("frame_key")))
          .as("frames"))
}
