package graft.llm

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Binary / multimodal column plumbing.
  *
  * Real training-data pipelines carry image/audio/video as opaque binary
  * columns with typed metadata and run decode / feature-extraction in
  * batches per partition. The decode libraries aren't in this container, so
  * the *decoder* is a clearly-marked deterministic stub — but everything
  * Spark-side is real: binary column materialization, typed
  * `Dataset.mapPartitions` batch processing (one decoder init per
  * partition, the same shape a JNI/FFI decoder needs), and a schema'd
  * feature output.
  *
  * The stub computes arithmetic-only features (byte length, sha256, first
  * byte, fake dimensions) so the whole path — including the partition-level
  * decode — is still oracle-checkable in DuckDB.
  *
  * Scale posture: mapPartitions keeps decode batched and executor-local
  * (no shuffle, no driver traffic); feature extraction parallelizes with
  * the scan. At 100 TB the binary payloads ride parquet binary columns and
  * the only cost is IO.
  */
object Multimodal {

  /** Typed media record: payload + metadata, the multimodal row shape. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)

  /** Extracted features (decoder output schema). */
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      content_sha: String,
      first_byte: Int,
      fake_width: Int,
      fake_height: Int)

  /** STUB decoder: stands in for an image/audio decode (libs absent in this
    * container). Deterministic arithmetic over the payload bytes so the
    * pipeline stays verifiable end-to-end; a real deployment swaps only
    * this function for e.g. a JNI JPEG decode. */
  def stubDecode(row: MediaRow, sha: MessageDigest): MediaFeatures = {
    val bytes = row.payload
    val hex = sha.digest(bytes).map("%02x".format(_)).mkString
    val first = if (bytes.isEmpty) 0 else bytes(0) & 0xff
    MediaFeatures(
      doc_id = row.doc_id,
      media_type = row.media_type,
      n_bytes = bytes.length,
      content_sha = hex,
      first_byte = first,
      fake_width = bytes.length % 640,
      fake_height = first * 3
    )
  }

  /** documents.text → binary payload table (the testdata carries no real
    * media, so payloads are the utf-8 bytes — the plumbing is identical). */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("media_type")
    )

  /** Per-frame record from the stub frame-sampler. */
  case class MediaFrame(
      doc_id: Long, frame_idx: Int, frame_len: Int,
      frame_sha: String, first_byte: Int)

  val FrameBytes = 64

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Frame sampling: split each payload into fixed-size byte frames and
    // extract per-frame features — the video/audio frame-sample shape
    // (batched per partition, one digest per partition, frames exploded to
    // rows). Deterministic features keep it oracle-checkable.
    "multimodal_frames" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      mediaTable(s, d).as[MediaRow].mapPartitions { it =>
        val sha = MessageDigest.getInstance("SHA-256")
        it.flatMap { row =>
          row.payload.grouped(FrameBytes).zipWithIndex.map { case (frame, idx) =>
            MediaFrame(
              doc_id = row.doc_id,
              frame_idx = idx,
              frame_len = frame.length,
              frame_sha = sha.digest(frame).map("%02x".format(_)).mkString,
              first_byte = if (frame.isEmpty) 0 else frame(0) & 0xff)
          }
        }
      }.toDF()
    }),

    // Batched per-partition "decode" + feature extraction over binary
    // payloads via typed mapPartitions (one digest instance per partition).
    "multimodal_features" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      mediaTable(s, d).as[MediaRow].mapPartitions { it =>
        val sha = MessageDigest.getInstance("SHA-256")
        it.map(stubDecode(_, sha))
      }.toDF()
    })
  )

  def oracles: Map[String, String] = Map(
    "multimodal_frames" -> s"""
WITH idx AS (
  -- list-form generate_series supports correlated bounds (the table
  -- function form does not in DuckDB v1.0)
  SELECT doc_id, text,
    unnest(generate_series(1, CAST(ceil(length(text) / $FrameBytes.0) AS INT))) AS i
  FROM documents
),
frames AS (
  SELECT doc_id,
    CAST(i - 1 AS INT) AS frame_idx,
    substr(text, (i - 1) * $FrameBytes + 1, $FrameBytes) AS frame
  FROM idx
)
SELECT doc_id, frame_idx,
  CAST(length(frame) AS INT) AS frame_len,
  sha256(frame) AS frame_sha,
  CAST(ascii(substr(frame, 1, 1)) AS INT) AS first_byte
FROM frames""",

    "multimodal_features" -> """
SELECT doc_id,
  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
       WHEN doc_id % 3 = 1 THEN 'audio/wav'
       ELSE 'video/mp4' END AS media_type,
  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
  sha256(text) AS content_sha,
  CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte,
  CAST(octet_length(encode(text)) % 640 AS INT) AS fake_width,
  CAST(ascii(substr(text, 1, 1)) * 3 AS INT) AS fake_height
FROM documents"""
  )
}
