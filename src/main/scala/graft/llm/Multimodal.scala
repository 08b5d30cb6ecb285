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
  * batches per partition. Everything Spark-side is real: binary column
  * materialization, typed `Dataset.mapPartitions` batch processing (one
  * decoder init per partition, the same shape a JNI/FFI decoder needs),
  * and a schema'd feature output. Since round 10 the decode step itself
  * is REAL for the library-free formats — `multimodal_decode` renders
  * genuine binary-PPM images and RIFF/WAVE PCM audio and parses them
  * back with actual format parsers ([[decodePpm]]/[[decodeWav]]) that
  * accept any conformant file. Only compressed codecs (JPEG/FLAC/H.264,
  * which do need native libs absent from this container) remain behind
  * the clearly-marked [[stubDecode]], kept for that deployment shape.
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
    * media, so payloads are the utf-8 bytes — the plumbing is identical).
    *
    * ORACLE CONTRACT (ADVICE r10): the decode/resize/downsample oracles
    * model this payload as per-character code points (`unicode(ch)`),
    * which equals the UTF-8 byte stream only while the corpus is pure
    * ASCII — a multi-byte character would change engine-side byte counts
    * and sums but not the oracle's. The driver corpus satisfies this and
    * MultimodalSpec pins it (byte length == char length over every doc),
    * so any future non-ASCII testdata fails the spec loudly instead of
    * silently hash-mismatching. The ENGINE itself is byte-correct for any
    * input; only the oracle equivalence is ASCII-scoped. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("media_type")
    )

  // ---- REAL decoders (round 10) --------------------------------------
  //
  // The "no media libs in the container" limitation only applies to
  // compressed codecs. Uncompressed self-describing formats — binary PPM
  // (P6) images and RIFF/WAVE PCM audio — need nothing but byte parsing,
  // so the decode step of the multimodal path can be REAL: the parsers
  // below accept any spec-conformant P6/WAV payload (header tokenizer,
  // chunk walker, little-endian PCM), not just the ones this pipeline
  // synthesizes. The payload ENCODERS render document bytes into genuine
  // files of those formats (a valid header + pixel/sample data), so the
  // whole encode → binary column → per-partition decode → features path
  // exercises exactly what a JPEG/FLAC deployment does, minus only the
  // entropy coding. Only `stubDecode` above remains a stand-in, kept for
  // the compressed-codec shape.

  val PpmWidth = 8
  val WavRate = 8000

  /** Render bytes as a binary P6 PPM: 8-wide RGB rows, zero-padded. */
  private[llm] def encodePpm(data: Array[Byte]): Array[Byte] = {
    val w = PpmWidth
    val h = math.max(1, (data.length + w * 3 - 1) / (w * 3))
    val header = s"P6\n$w $h\n255\n".getBytes(StandardCharsets.US_ASCII)
    val pix = new Array[Byte](w * h * 3)
    System.arraycopy(data, 0, pix, 0, data.length)
    header ++ pix
  }

  /** Render bytes as 16-bit mono PCM WAV at [[WavRate]] Hz: each input
    * byte becomes one centered sample ((b − 128)·256). */
  private[llm] def encodeWav(data: Array[Byte]): Array[Byte] = {
    val n = data.length
    val out = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + n * 2)
      .put("WAVE".getBytes(StandardCharsets.US_ASCII))
      .put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(WavRate).putInt(WavRate * 2) // byte rate = rate · block align
      .putShort(2).putShort(16) // block align, bits per sample
      .put("data".getBytes(StandardCharsets.US_ASCII)).putInt(n * 2)
    data.foreach(b => out.putShort((((b & 0xff) - 128) * 256).toShort))
    out.array()
  }

  /** REAL binary-PPM (P6) parser: whitespace-tokenized ASCII header
    * (magic, width, height, maxval), one separator byte, then raw RGB
    * triples. Returns (width, height, raster). */
  private[llm] def decodePpmRaster(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    var i = 0
    def token(): String = {
      while (i < bytes.length && Character.isWhitespace(bytes(i).toChar)) i += 1
      val s = i
      while (i < bytes.length && !Character.isWhitespace(bytes(i).toChar)) i += 1
      new String(bytes, s, i - s, StandardCharsets.US_ASCII)
    }
    require(token() == "P6", "not a binary PPM payload")
    val w = token().toInt
    val h = token().toInt
    require(token().toInt == 255, "unsupported PPM maxval")
    i += 1 // exactly one whitespace byte separates header and raster
    (w, h, java.util.Arrays.copyOfRange(bytes, i, i + w * h * 3))
  }

  /** Per-channel sums over a raster: (Σr, Σg, Σb). */
  private def channelSums(w: Int, h: Int, raster: Array[Byte]): (Long, Long, Long) = {
    var (sr, sg, sb) = (0L, 0L, 0L)
    var p = 0
    while (p < w * h) {
      sr += raster(3 * p) & 0xff; sg += raster(3 * p + 1) & 0xff
      sb += raster(3 * p + 2) & 0xff
      p += 1
    }
    (sr, sg, sb)
  }

  /** Decode + feature in one call: (width, height, Σr, Σg, Σb). */
  private[llm] def decodePpm(bytes: Array[Byte]): (Int, Int, Long, Long, Long) = {
    val (w, h, raster) = decodePpmRaster(bytes)
    val (sr, sg, sb) = channelSums(w, h, raster)
    (w, h, sr, sg, sb)
  }

  /** REAL RIFF/WAVE parser: verifies the container magic, walks the
    * word-aligned chunk list, reads fmt (channels, rate, bits) and decodes
    * the little-endian 16-bit PCM data chunk. Returns
    * (sampleRate, channels, bitsPerSample, samples). */
  private[llm] def decodeWavSamples(bytes: Array[Byte]): (Int, Int, Int, Array[Int]) = {
    def le32(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def tag(o: Int): String = new String(bytes, o, 4, StandardCharsets.US_ASCII)
    require(tag(0) == "RIFF" && tag(8) == "WAVE", "not a RIFF/WAVE payload")
    var o = 12
    var rate = 0; var ch = 0; var bits = 0
    val samples = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (o + 8 <= bytes.length) {
      val id = tag(o); val len = le32(o + 4)
      // A hostile/corrupt 32-bit chunk length (negative, or huge enough to
      // overflow o + 8 + len) must not drive the walker backwards or into
      // an infinite loop: reject negative lengths outright and advance via
      // overflow-proof long arithmetic clamped to the buffer end, so the
      // offset strictly increases on every iteration.
      require(len >= 0, s"corrupt RIFF chunk: negative length $len at offset $o")
      // fmt fields live at body offsets 2..15 (o+10 .. o+23): a truncated
      // fmt chunk (declared len < 16, or a header that runs past the buffer)
      // must fail through the walker's diagnostics, not a raw
      // ArrayIndexOutOfBoundsException from an unguarded le16/le32 read
      // (ADVICE r11)
      if (id == "fmt ") {
        require(len >= 16 && o + 24 <= bytes.length, s"truncated fmt chunk at offset $o (len $len)")
        ch = le16(o + 10); rate = le32(o + 12); bits = le16(o + 22)
      }
      else if (id == "data") {
        var p = o + 8
        val end = math.min(math.min(o.toLong + 8L + len, bytes.length.toLong), Int.MaxValue.toLong).toInt
        while (p + 1 < end) { samples += le16(p).toShort.toInt; p += 2 }
      }
      val next = o.toLong + 8L + len.toLong + (len & 1) // RIFF chunks are word-aligned
      o = if (next > bytes.length.toLong) bytes.length else next.toInt
    }
    (rate, ch, bits, samples.toArray)
  }

  /** Decode + feature in one call:
    * (sampleRate, channels, bitsPerSample, nSamples, Σ|amplitude|). */
  private[llm] def decodeWav(bytes: Array[Byte]): (Int, Int, Int, Int, Long) = {
    val (rate, ch, bits, samples) = decodeWavSamples(bytes)
    (rate, ch, bits, samples.length, samples.foldLeft(0L)((a, s) => a + math.abs(s)))
  }

  /** 2×2 box-filter downsample of an RGB raster (floor-averaged, zero
    * padding beyond the source — consistent with the raster's own
    * zero-padded tail). A REAL image resize kernel: works on any
    * interleaved-RGB buffer. Returns the resized (w, h, raster). */
  private[llm] def boxDownsample(w: Int, h: Int, raster: Array[Byte]): (Int, Int, Array[Byte]) = {
    val ow = (w + 1) / 2
    val oh = (h + 1) / 2
    val out = new Array[Byte](ow * oh * 3)
    def at(x: Int, y: Int, k: Int): Int =
      if (x >= w || y >= h) 0
      else {
        val j = (y * w + x) * 3 + k
        if (j < raster.length) raster(j) & 0xff else 0
      }
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        var k = 0
        while (k < 3) {
          val s = at(2 * x, 2 * y, k) + at(2 * x + 1, 2 * y, k) +
            at(2 * x, 2 * y + 1, k) + at(2 * x + 1, 2 * y + 1, k)
          out((y * ow + x) * 3 + k) = (s / 4).toByte
          k += 1
        }
        x += 1
      }
      y += 1
    }
    (ow, oh, out)
  }

  case class ResizedImage(
      doc_id: Long, in_w: Int, in_h: Int, out_w: Int, out_h: Int,
      rsum_r: Long, rsum_g: Long, rsum_b: Long)

  case class DecimatedAudio(
      doc_id: Long, n_in: Int, n_out: Int, sum_abs_out: Long)

  /** Typed row for the real-decode output (None → NULL for the columns of
    * the other modality). */
  case class DecodedMedia(
      doc_id: Long, media_type: String,
      width: Option[Int], height: Option[Int],
      sum_r: Option[Long], sum_g: Option[Long], sum_b: Option[Long],
      sample_rate: Option[Int], n_samples: Option[Int], sum_abs_amp: Option[Long])

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

  /** 56-bit difference hash (dHash) of a decoded raster — the standard
    * perceptual image fingerprint (aHash/dHash family): sample 8 rows by
    * nearest-neighbor (y_r = r·h/8), grayscale each of the 8 columns with
    * integer luma weights (299·R + 587·G + 114·B)/1000 (truncating — all
    * arithmetic exact int64), and set bit r·8+x when the gray value
    * DECREASES down the row gradient gray(y_r, x) > gray(y_{r+1}, x):
    * 7 gradients × 8 columns = 56 bits, deliberately ≤ 62 so the
    * signature is a non-negative long (the [[simhashes]] sign-safety
    * convention). Visually-near images differ in few bits; the Hamming
    * ball is searchable by pigeonhole banding exactly like SimHash. */
  private[llm] def dHash56(w: Int, h: Int, raster: Array[Byte]): Long = {
    def gray(y: Int, x: Int): Long = {
      val j = (y * w + x) * 3
      def px(k: Int): Long =
        if (j + k < raster.length) (raster(j + k) & 0xffL) else 0L
      (299L * px(0) + 587L * px(1) + 114L * px(2)) / 1000L
    }
    var sig = 0L
    var r = 0
    while (r < 7) {
      val y0 = (r * h) / 8
      val y1 = ((r + 1) * h) / 8
      var x = 0
      while (x < 8) {
        if (gray(y0, x) > gray(y1, x)) sig |= 1L << (r * 8 + x)
        x += 1
      }
      r += 1
    }
    sig
  }

  case class DHashed(doc_id: Long, dhash: Long)

  /** Per-doc dHash frame shared by `image_dhash` and
    * `image_dhash_neardup`: encode → REAL PPM decode → 56-bit signature,
    * one primitive kernel per row, no shuffle. */
  private def dhashFrame(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    Tables.documents(s, d).filter(col("doc_id") % 2 === 0)
      .select("doc_id", "text").as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val (w, h, raster) =
            decodePpmRaster(encodePpm(text.getBytes(StandardCharsets.UTF_8)))
          DHashed(id, dHash56(w, h, raster))
        }
      }.toDF()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Perceptual image fingerprints: every image doc's 56-bit dHash —
    // the per-doc layer (the oracle hash-checks all 56 bits of every
    // signature, so any kernel drift fails loudly here, not in the
    // sparse pair set downstream).
    "image_dhash" -> ((s, d) => dhashFrame(s, d)),

    // Perceptual near-duplicate IMAGE pairs at Hamming ≤ 3 — the
    // multimodal sibling of dedup_simhash, with the same two-tier scale
    // shape: collapse to DISTINCT signatures first (pair work is then
    // invariant to row-level duplication), 4-band 14-bit pigeonhole
    // blocking over the 56-bit signature (≤3 flipped bits touch ≤3 of 4
    // bands, so one band matches exactly — full recall at the radius,
    // never all-pairs), exact bit_count verify on the banded candidates.
    // Output is SIGNATURE-level: near pairs with each side's collapsed
    // doc count, plus the exact-duplicate groups (n_docs > 1) as
    // hamming-0 self-rows — bounded by distinct content, not corpus size.
    "image_dhash_neardup" -> ((s, d) => {
      val sigs = dhashFrame(s, d)
      val reps = sigs.groupBy("dhash")
        .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n_docs"))
      val banded = reps.select(
        col("rep_id"), col("dhash"), col("n_docs"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("band"),
            shiftright(col("dhash"), 14 * b).bitwiseAND(lit(16383L)).as("bh"))
        }: _*)).as("bb"))
        .select(col("rep_id"), col("dhash"), col("n_docs"),
          col("bb.band").as("band"), col("bb.bh").as("bh"))
      val l = banded.select(col("band"), col("bh"), col("rep_id").as("ra"),
        col("dhash").as("hash_a"), col("n_docs").as("n_docs_a"))
      val r = banded.select(col("band"), col("bh"), col("rep_id").as("rb"),
        col("dhash").as("hash_b"), col("n_docs").as("n_docs_b"))
      val pairs = l.join(r, Seq("band", "bh")).filter(col("ra") < col("rb"))
        .select(col("hash_a"), col("hash_b"),
          bit_count(col("hash_a").bitwiseXOR(col("hash_b"))).cast("int").as("hamming"),
          col("n_docs_a"), col("n_docs_b"))
        .distinct()
        .filter(col("hamming") <= 3)
      val groups = reps.filter(col("n_docs") > 1)
        .select(col("dhash").as("hash_a"), col("dhash").as("hash_b"),
          lit(0).cast("int").as("hamming"),
          col("n_docs").as("n_docs_a"), col("n_docs").as("n_docs_b"))
      pairs.unionByName(groups)
    }),

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

    // REAL encode → decode round trip over genuine media payloads: even
    // docs render to binary PPM images, odd docs to 16-bit PCM WAV, and
    // the per-partition decode step runs the actual format parsers
    // (decodePpm / decodeWav — they accept any conformant file, not just
    // these). Features are integer-exact (header fields + channel sums),
    // so the whole path stays oracle-checkable: the oracle re-derives the
    // same numbers from the document bytes arithmetically. This is the
    // full multimodal shape — typed binary rows, batched executor-local
    // decode, schema'd per-modality features with NULLed other-modality
    // columns — with only compressed codecs still stubbed.
    "multimodal_decode" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      Tables.documents(s, d).select("doc_id", "text").as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (id, text) =>
            val tb = text.getBytes(StandardCharsets.UTF_8)
            if (id % 2 == 0) {
              val (w, h, sr, sg, sb) = decodePpm(encodePpm(tb))
              DecodedMedia(id, "image/ppm", Some(w), Some(h),
                Some(sr), Some(sg), Some(sb), None, None, None)
            } else {
              val (rate, ch, bits, n, sum) = decodeWav(encodeWav(tb))
              require(ch == 1 && bits == 16, "unexpected PCM layout")
              DecodedMedia(id, "audio/wav", None, None, None, None, None,
                Some(rate), Some(n), Some(sum))
            }
          }
        }.toDF()
    }),

    // REAL image resize: decode the PPM raster, 2×2 box-filter downsample
    // (floor-averaged — an actual resize kernel over the interleaved-RGB
    // buffer), features from the RESIZED image. The oracle replays the
    // same integer block arithmetic per output pixel.
    "multimodal_resize" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      Tables.documents(s, d).filter(col("doc_id") % 2 === 0)
        .select("doc_id", "text").as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (id, text) =>
            val (w, h, raster) = decodePpmRaster(encodePpm(text.getBytes(StandardCharsets.UTF_8)))
            val (ow, oh, out) = boxDownsample(w, h, raster)
            val (r, g, b) = channelSums(ow, oh, out)
            ResizedImage(id, w, h, ow, oh, r, g, b)
          }
        }.toDF()
    }),

    // REAL audio decimation: decode the PCM samples, keep every other one
    // (the simplest sample-rate halving), features from the decimated
    // signal.
    "multimodal_downsample" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      Tables.documents(s, d).filter(col("doc_id") % 2 === 1)
        .select("doc_id", "text").as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (id, text) =>
            val (_, _, _, samples) =
              decodeWavSamples(encodeWav(text.getBytes(StandardCharsets.UTF_8)))
            val dec = samples.indices.collect { case i if i % 2 == 0 => samples(i) }
            DecimatedAudio(id, samples.length, dec.length,
              dec.foldLeft(0L)((a, v) => a + math.abs(v)))
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

  /** The dHash bit fold as DuckDB SQL, generated from the same (row,
    * column, channel) offsets the JVM kernel loops over — c = 1-based
    * code points, n = len(c), h = raster height (the raster's zero
    * padding and the rows beyond the data both land in the ELSE 0). */
  private def dhashSigSql: String = {
    def gray(rowExpr: String): String = {
      val j = s"((($rowExpr) * 8 + (i % 8)) * 3)"
      def term(k: Int, wgt: Int) =
        s"$wgt * (CASE WHEN $j + ${k + 1} <= n THEN c[$j + ${k + 1}] ELSE 0 END)"
      s"((${term(0, 299)} + ${term(1, 587)} + ${term(2, 114)}) // 1000)"
    }
    val g0 = gray("((i // 8) * h) // 8")
    val g1 = gray("(((i // 8) + 1) * h) // 8")
    s"""CAST(list_sum(list_transform(generate_series(0, 55),
    i -> CASE WHEN $g0 > $g1 THEN (CAST(1 AS BIGINT) << i)
              ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"""
  }

  private def dhashBaseSql: String = s"""
WITH cs AS (
  SELECT doc_id,
    list_transform(string_split(text, ''), ch -> CAST(unicode(ch) AS BIGINT)) AS c
  FROM documents WHERE doc_id % 2 = 0
), base AS (
  SELECT doc_id, c, CAST(len(c) AS BIGINT) AS n,
    greatest(1, CAST(ceil(len(c) / ${PpmWidth * 3}.0) AS BIGINT)) AS h
  FROM cs
)"""

  def oracles: Map[String, String] = Map(
    "image_dhash" -> s"""$dhashBaseSql
SELECT doc_id, $dhashSigSql AS dhash FROM base""",

    // Mirrors the engine tier for tier: distinct-signature collapse,
    // 4×14-bit band equi-join, bit_count verify, dup groups appended.
    "image_dhash_neardup" -> s"""$dhashBaseSql
, sigs AS (
  SELECT doc_id, $dhashSigSql AS dhash FROM base
), reps AS (
  SELECT dhash, min(doc_id) AS rep_id, CAST(count(*) AS BIGINT) AS n_docs
  FROM sigs GROUP BY 1
), banded AS (
  SELECT rep_id, dhash, n_docs, b.band, (dhash >> (14 * b.band)) & 16383 AS bh
  FROM reps, (SELECT unnest([0, 1, 2, 3]) AS band) b
), pairs AS (
  SELECT DISTINCT l.dhash AS hash_a, r.dhash AS hash_b,
    CAST(bit_count(xor(l.dhash, r.dhash)) AS INT) AS hamming,
    l.n_docs AS n_docs_a, r.n_docs AS n_docs_b
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.bh = r.bh AND l.rep_id < r.rep_id
  WHERE bit_count(xor(l.dhash, r.dhash)) <= 3
)
SELECT * FROM pairs
UNION ALL
SELECT dhash AS hash_a, dhash AS hash_b, CAST(0 AS INT) AS hamming,
  n_docs AS n_docs_a, n_docs AS n_docs_b
FROM reps WHERE n_docs > 1""",

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

    // Mirrors the encode → decode round trip arithmetically: the PPM
    // raster is the document bytes zero-padded to 8×h×3 (padding adds 0 to
    // every channel sum), the WAV samples are (byte − 128)·256, so each
    // feature is a closed-form integer over the character codes.
    "multimodal_decode" -> s"""
WITH cs AS (
  SELECT doc_id,
    list_transform(string_split(text, ''), ch -> CAST(unicode(ch) AS BIGINT)) AS c
  FROM documents
)
SELECT doc_id,
  CASE WHEN doc_id % 2 = 0 THEN 'image/ppm' ELSE 'audio/wav' END AS media_type,
  CASE WHEN doc_id % 2 = 0 THEN $PpmWidth END AS width,
  CASE WHEN doc_id % 2 = 0
    THEN CAST(greatest(1, CAST(ceil(len(c) / ${PpmWidth * 3}.0) AS INT)) AS INT) END AS height,
  CASE WHEN doc_id % 2 = 0 THEN CAST(COALESCE(list_sum(list_transform(
    list_filter(generate_series(1, len(c)), i -> (i - 1) % 3 = 0), i -> c[i])), 0) AS BIGINT)
    END AS sum_r,
  CASE WHEN doc_id % 2 = 0 THEN CAST(COALESCE(list_sum(list_transform(
    list_filter(generate_series(1, len(c)), i -> (i - 1) % 3 = 1), i -> c[i])), 0) AS BIGINT)
    END AS sum_g,
  CASE WHEN doc_id % 2 = 0 THEN CAST(COALESCE(list_sum(list_transform(
    list_filter(generate_series(1, len(c)), i -> (i - 1) % 3 = 2), i -> c[i])), 0) AS BIGINT)
    END AS sum_b,
  CASE WHEN doc_id % 2 = 1 THEN $WavRate END AS sample_rate,
  CASE WHEN doc_id % 2 = 1 THEN CAST(len(c) AS INT) END AS n_samples,
  CASE WHEN doc_id % 2 = 1 THEN CAST(COALESCE(list_sum(list_transform(
    c, x -> 256 * abs(x - 128))), 0) AS BIGINT) END AS sum_abs_amp
FROM cs""",

    // Replays the 2×2 box filter per output pixel: out(m, k) =
    // (P(2x,2y)+P(2x+1,2y)+P(2x,2y+1)+P(2x+1,2y+1)) // 4 with P = 0
    // beyond the document bytes (the raster's zero padding and the
    // out-of-raster rows both land there). The P-terms are generated from
    // the same (dx, dy, k) offsets the JVM kernel loops over.
    "multimodal_resize" -> {
      def pTerm(dx: Int, dy: Int, k: Int): String = {
        val j = s"(((m // 4) * 2 + $dy) * ${PpmWidth} + (m % 4) * 2 + $dx) * 3 + $k + 1"
        s"(CASE WHEN $j <= n THEN c[$j] ELSE 0 END)"
      }
      def chanSql(k: Int): String =
        s"""CAST(COALESCE(list_sum(list_transform(
    generate_series(0, 4 * ((h + 1) // 2) - 1),
    m -> (${pTerm(0, 0, k)} + ${pTerm(1, 0, k)} + ${pTerm(0, 1, k)} + ${pTerm(1, 1, k)}) // 4)), 0) AS BIGINT)"""
      s"""
WITH cs AS (
  SELECT doc_id,
    list_transform(string_split(text, ''), ch -> CAST(unicode(ch) AS BIGINT)) AS c
  FROM documents WHERE doc_id % 2 = 0
),
base AS (
  SELECT doc_id, c, len(c) AS n,
    greatest(1, CAST(ceil(len(c) / ${PpmWidth * 3}.0) AS INT)) AS h
  FROM cs
)
SELECT doc_id,
  $PpmWidth AS in_w, CAST(h AS INT) AS in_h,
  ${PpmWidth / 2} AS out_w, CAST((h + 1) // 2 AS INT) AS out_h,
  ${chanSql(0)} AS rsum_r,
  ${chanSql(1)} AS rsum_g,
  ${chanSql(2)} AS rsum_b
FROM base"""
    },

    // Decimation keeps the 0-based even samples = 1-based odd character
    // positions; each contributes 256·|code − 128|.
    "multimodal_downsample" -> s"""
WITH cs AS (
  SELECT doc_id,
    list_transform(string_split(text, ''), ch -> CAST(unicode(ch) AS BIGINT)) AS c
  FROM documents WHERE doc_id % 2 = 1
)
SELECT doc_id,
  CAST(len(c) AS INT) AS n_in,
  CAST((len(c) + 1) // 2 AS INT) AS n_out,
  CAST(COALESCE(list_sum(list_transform(
    list_filter(generate_series(1, len(c)), i -> i % 2 = 1),
    i -> 256 * abs(c[i] - 128))), 0) AS BIGINT) AS sum_abs_out
FROM cs""",

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
