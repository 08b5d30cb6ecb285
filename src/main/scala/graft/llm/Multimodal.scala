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

  /** Content-defined chunking parameters: an 8-byte local-window polynomial
    * (Gear/Rabin-style) marks a boundary wherever its value mod 64 is 0 —
    * boundaries depend only on local content, so an insertion early in a
    * payload shifts at most one chunk (the property that makes CDC dedup
    * resilient where fixed-size framing is not). Average chunk ≈ 64 bytes
    * at these constants. */
  val CdcWindow = 8
  val CdcMod = 1000003L
  val CdcMask = 64L
  private[llm] val CdcPow: Array[Long] =
    Iterator.iterate(1L)(_ * 31).take(CdcWindow).toArray // 31^0 .. 31^7

  /** Boundary positions (1-based, >= CdcWindow) for a payload string. */
  private[llm] def cdcBoundaries(text: String): Array[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = CdcWindow
    while (i <= text.length) {
      var h = 0L
      var k = 0
      while (k < CdcWindow) {
        h += text.charAt(i - 1 - k).toLong * CdcPow(k)
        k += 1
      }
      if (h % CdcMod % CdcMask == 0) out += i
      i += 1
    }
    out.toArray
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Content-defined chunking of each payload: per-chunk rows with the
    // chunk fingerprint — the substrate of binary-level dedup (identical
    // chunks dedupe across payloads even when offsets shift). The boundary
    // scan runs as a primitive per-row kernel; fingerprints are sha256 of
    // the chunk content.
    "multimodal_chunks" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      Tables.documents(s, d).select("doc_id", "text").as[(Long, String)]
        .mapPartitions { it =>
          it.flatMap { case (id, text) =>
            val bs = cdcBoundaries(text)
            val splits = (0 +: bs.toSeq :+ text.length).distinct.sorted
            splits.sliding(2).zipWithIndex.collect {
              case (Seq(a, b), idx) if b > a =>
                (id, idx, a + 1, b - a, text.substring(a, b))
            }
          }
        }
        .toDF("doc_id", "chunk_idx", "start", "len", "chunk")
        .select(col("doc_id"), col("chunk_idx"), col("start"), col("len"),
          sha2(col("chunk"), 256).as("chunk_sha"))
    }),

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
    "multimodal_chunks" -> {
      // h(i) = Σ_{k=0..7} code(char at i-k) · 31^k — mirrors cdcBoundaries
      val winSum = (0 until CdcWindow)
        .map(k => s"cs[i-$k] * ${CdcPow(k)}L").mkString(" + ")
        .replace("L", "") // DuckDB has no long-literal suffix
      s"""
WITH base AS (
  SELECT doc_id, text,
    list_transform(string_split(text, ''), c -> CAST(unicode(c) AS BIGINT)) AS cs
  FROM documents
),
bounds AS (
  SELECT doc_id, text, len(cs) AS n,
    list_filter(generate_series($CdcWindow, len(cs)), i -> ($winSum) % $CdcMod % $CdcMask = 0) AS bs
  FROM base
),
splits AS (
  -- list_distinct does not preserve order in DuckDB — re-sort the splits
  SELECT doc_id, text, list_sort(list_distinct([0] || bs || [n])) AS sp FROM bounds
),
chunks AS (
  SELECT doc_id, text,
    unnest(list_transform(generate_series(1, len(sp) - 1),
      k -> {'idx': k - 1, 'a': sp[k], 'b': sp[k+1]})) AS u
  FROM splits
)
SELECT doc_id,
  CAST(u.idx AS INT) AS chunk_idx,
  CAST(u.a + 1 AS INT) AS start,
  CAST(u.b - u.a AS INT) AS len,
  sha256(substr(text, CAST(u.a + 1 AS INT), CAST(u.b - u.a AS INT))) AS chunk_sha
FROM chunks
WHERE u.b > u.a"""
    },

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
