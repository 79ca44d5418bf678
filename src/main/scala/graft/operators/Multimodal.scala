package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus a decode/feature-extract
  * stage.
  *
  * The Spark-side design is real and tested: schema, partition-level
  * batch processing (`mapPartitions` — the Scala analogue of
  * `mapInPandas` batch UDFs), and deterministic outputs. The actual
  * codec work is a clearly-marked STUB (`decodeStub`): this container
  * has no image/audio libraries, so the stub derives deterministic
  * fake features from the bytes. Swapping in a real decoder changes
  * only the function body — the distributed plumbing (schema, batch
  * shape, partitioning) is unchanged.
  *
  * 100 TB posture: media bytes never shuffle — all feature extraction
  * is a narrow map over scan partitions; only the (tiny) extracted
  * features flow into joins/aggregations downstream.
  */
object Multimodal {

  case class MediaRecord(
      media_id: Long,
      media_type: String,
      payload: Array[Byte])

  case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      checksum: Long,
      width: Int,     // STUB: parsed header fields in a real decoder
      height: Int,
      n_frames: Int)

  /** Synthesize a media table from `documents`: the text bytes stand
    * in for an encoded payload; type cycles deterministically.
    */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    val docs = Tables.load(spark, sfDir, "documents")
    docs.select(
      col("doc_id").as("media_id"),
      element_at(
        array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord](Encoders.product[MediaRecord])
  }

  /** STUB DECODER. A real implementation would parse the container
    * format (PNG/WAV/MP4) per record; here features are deterministic
    * functions of the payload bytes so tests and oracles stay exact.
    * Runs per-partition so a real decoder can amortize library init
    * across the batch (same rationale as Arrow-batched UDFs).
    */
  def decodeStub(media: Dataset[MediaRecord]): Dataset[MediaFeatures] =
    media.mapPartitions { it =>
      // real decoder init would happen once per partition here
      it.map { m =>
        var cksum = 0L
        var i = 0
        while (i < m.payload.length) { // FNV-1a, deterministic
          cksum = (cksum ^ (m.payload(i) & 0xFFL)) * 0x100000001B3L
          i += 1
        }
        MediaFeatures(
          media_id = m.media_id,
          media_type = m.media_type,
          n_bytes = m.payload.length.toLong,
          checksum = cksum,
          width = 16 + (m.payload.length % 64),   // ??? real: header parse
          height = 16 + (m.payload.length % 48),  // ??? real: header parse
          n_frames = 1 + (m.payload.length % 24)) // ??? real: demux count
      }
    }(Encoders.product[MediaFeatures])

  /** Metadata/feature query: SQL-oracle-checkable subset (byte length
    * and derived dims are pure functions of octet_length, portable to
    * DuckDB; the FNV checksum is validated in MultimodalSpec instead).
    */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val feats = decodeStub(mediaTable(spark, sfDir)).toDF()
    feats.select(
      col("media_id"), col("media_type"),
      col("n_bytes"), col("width"), col("height"), col("n_frames"))
  }

  /** Frame-sampling shape: explode a deterministic sample of "frame
    * indices" per video — the batch shape a real frame-sampler
    * produces (one row per sampled frame, payload untouched upstream).
    */
  def frameSample(spark: SparkSession, sfDir: String, stride: Int = 8): DataFrame =
    mediaMeta(spark, sfDir)
      .filter(col("media_type") === "video/mp4")
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0),
          col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Feature-embedding extraction shape: payload bytes -> fixed-width
    * feature vector, the stage that feeds extracted media features
    * into the ANN/dedup operators downstream. The "model" is a STUB
    * (md5-derived 4-dim projection in [0,1) — a real encoder replaces
    * the hash with inference); the plumbing is the point: narrow
    * per-row transform on the scan, payload never shuffles, features
    * are 32 bytes/row. md5-derived values keep the whole stage under
    * the exact DuckDB oracle (q52), same device as q23/q31.
    */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    val m = mediaTable(spark, sfDir).toDF()
    val h = md5(col("payload"))
    val feats = (0 until 4).map { j =>
      (conv(substring(h, 1 + 8 * j, 8), 16, 10).cast("long").cast("double") /
        lit(4294967296.0)).as(s"f$j") // / 2^32 -> [0, 1)
    }
    m.select(col("media_id") +: col("media_type") +: feats: _*)
  }
}
