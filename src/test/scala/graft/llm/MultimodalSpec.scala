package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The mapPartitions decode path must agree with the equivalent column
  * expressions (same sha, same byte counts) — i.e. the typed batch plumbing
  * introduces no drift vs the declarative plan. */
class MultimodalSpec extends SparkSpec {

  test("image dhash banding finds exactly the brute-force Hamming<=3 signature pairs") {
    val sigs = Multimodal.queries("image_dhash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(sigs.nonEmpty)
    // signatures are 56-bit by construction (sign-safe long)
    assert(sigs.forall { case (_, h) => h >= 0L && h < (1L << 56) })
    val out = Multimodal.queries("image_dhash_neardup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .toSet
    val reps = sigs.groupBy(_._2).toSeq
      .map { case (h, g) => (h, g.map(_._1).min, g.size.toLong) }
    val brute = (for {
      Seq((ha, ra, na), (hb, rb, nb)) <- reps.combinations(2)
      hamming = java.lang.Long.bitCount(ha ^ hb)
      if hamming <= 3
    } yield {
      if (ra < rb) (ha, hb, hamming, na, nb) else (hb, ha, hamming, nb, na)
    }).toSet ++
      reps.collect { case (h, _, n) if n > 1 => (h, h, 0, n, n) }.toSet
    // banding must equal brute force exactly: full recall is the 4-band
    // pigeonhole guarantee, precision is the bit_count post-filter
    assert(out === brute)
  }

  test("dhash kernel sets exactly the decreasing row gradients on a crafted raster") {
    // 8x16 raster: rows 0..7 bright (200), rows 8..15 dark (10) — the only
    // decreasing sampled gradient is row 3 -> row 4 (y=6 -> y=8), all 8
    // columns, i.e. bits 24..31 and nothing else
    val w = 8; val h = 16
    val raster = Array.tabulate(w * h * 3) { j =>
      val y = j / (w * 3)
      (if (y < 8) 200 else 10).toByte
    }
    assert(Multimodal.dHash56(w, h, raster) === 0xFF000000L)
  }

  test("stub decode features match column-expression ground truth") {
    val feats = Multimodal.queries("multimodal_features")(spark, sf)
    val truth = Tables.documents(spark, sf).select(
      col("doc_id"),
      sha2(col("text"), 256).as("sha_expr"),
      length(col("text")).as("len_expr"))
    val joined = feats.join(truth, "doc_id")
    assert(joined.count() === Tables.documents(spark, sf).count())
    assert(joined.filter(col("content_sha") =!= col("sha_expr")).count() === 0)
    assert(joined.filter(col("n_bytes") =!= col("len_expr")).count() === 0)
    assert(joined.filter(col("fake_width") =!= col("n_bytes") % 640).count() === 0)
  }

  test("corpus is pure ASCII — the code-point oracle equals the byte stream") {
    // The multimodal oracles model payloads as per-character code points;
    // that equals the engine's UTF-8 bytes only for ASCII text. Pin the
    // assumption: any non-ASCII doc makes byte length != char length.
    val nonAscii = Tables.documents(spark, sf)
      .filter(length(encode(col("text"), "UTF-8")) =!= length(col("text")))
      .count()
    assert(nonAscii === 0,
      s"$nonAscii non-ASCII documents: the unicode(ch) oracle no longer models the UTF-8 payload")
  }

  test("WAV chunk walker rejects hostile lengths instead of looping") {
    // A corrupt 32-bit chunk length must not drive the walker backwards
    // (infinite loop) or past the buffer. Negative length → loud require;
    // overlong length → clamped decode that terminates.
    def wavWithChunkLen(len: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(24)
        .put("WAVE".getBytes("US-ASCII"))
        .put("data".getBytes("US-ASCII")).putInt(len)
        .putShort(7.toShort).putShort(9.toShort)
      bb.array()
    }
    val neg = intercept[IllegalArgumentException] {
      Multimodal.decodeWavSamples(wavWithChunkLen(-8))
    }
    assert(neg.getMessage.contains("negative length"))
    // huge positive length: o + 8 + len overflows Int; must still terminate
    // and decode only the bytes actually present
    val (_, _, _, samples) = Multimodal.decodeWavSamples(wavWithChunkLen(Int.MaxValue - 2))
    assert(samples.toSeq === Seq(7, 9))
    // truncated-but-positive length just past the buffer: clamped, terminates
    val (_, _, _, s2) = Multimodal.decodeWavSamples(wavWithChunkLen(100))
    assert(s2.toSeq === Seq(7, 9))
  }

  test("media_type partitions cover all three modalities") {
    val types = Multimodal.mediaTable(spark, sf)
      .select("media_type").distinct().collect().map(_.getString(0)).toSet
    assert(types === Set("image/png", "audio/wav", "video/mp4"))
  }

  test("content-defined chunking is shift-resistant (fixed framing is not)") {
    // insert a prefix into a payload: CDC boundaries re-align after at most
    // one chunk, so most chunk fingerprints survive; fixed-size framing
    // shifts every frame
    def chunkSet(text: String): Set[String] = {
      val bs = Multimodal.cdcBoundaries(text)
      val splits = (0 +: bs.toSeq :+ text.length).distinct.sorted
      splits.sliding(2).collect { case Seq(a, b) if b > a => text.substring(a, b) }.toSet
    }
    val base = (1 to 60).map(i => s"token$i word$i item$i").mkString(" ")
    val shifted = "inserted prefix material " + base
    val a = chunkSet(base)
    val b = chunkSet(shifted)
    val sharedCdc = a.intersect(b).size.toDouble / a.size
    assert(sharedCdc >= 0.5, s"CDC should retain most chunks, got $sharedCdc")
    // fixed 64-char frames: nothing survives an unaligned insert
    val fa = base.grouped(64).toSet
    val fb = shifted.grouped(64).toSet
    assert(fa.intersect(fb).size <= 1)
  }

  test("PPM parser decodes a handcrafted P6 file (any header whitespace)") {
    val pixels = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    for (header <- Seq("P6\n2 2\n255\n", "P6 2 2 255 ")) {
      val bytes = header.getBytes("US-ASCII") ++ pixels
      val (w, h, r, g, b) = Multimodal.decodePpm(bytes)
      assert((w, h) === ((2, 2)))
      assert((r, g, b) === ((220L, 260L, 300L)))
    }
  }

  test("WAV parser walks unknown chunks, honors word alignment, sums |PCM|") {
    // RIFF with an odd-length JUNK chunk before fmt (word-aligned skip),
    // then 16-bit mono PCM with both extremes and a negative sample
    val samples = Array[Short](Short.MinValue, 1000, -1, 0)
    val data = java.nio.ByteBuffer.allocate(12 + (8 + 3 + 1) + (8 + 16) + 8 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    data.put("RIFF".getBytes("US-ASCII")).putInt(0).put("WAVE".getBytes("US-ASCII"))
    data.put("JUNK".getBytes("US-ASCII")).putInt(3).put(Array[Byte](1, 2, 3, 0))
    data.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(44100).putInt(88200).putShort(2).putShort(16)
    data.put("data".getBytes("US-ASCII")).putInt(samples.length * 2)
    samples.foreach(data.putShort)
    val (rate, ch, bits, n, sum) = Multimodal.decodeWav(data.array())
    assert((rate, ch, bits) === ((44100, 1, 16)))
    assert(n === samples.length)
    assert(sum === samples.map(s => math.abs(s.toInt).toLong).sum)
  }

  test("box downsample averages 2x2 blocks and zero-pads odd edges") {
    // 2x2 image -> 1x1: each channel is the floor-average of 4 pixels
    val raster2x2 = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 101, 110, 120)
    val (w1, h1, out1) = Multimodal.boxDownsample(2, 2, raster2x2)
    assert((w1, h1) === ((1, 1)))
    assert(out1.map(_ & 0xff).toSeq === Seq((10 + 40 + 70 + 101) / 4, (20 + 50 + 80 + 110) / 4,
      (30 + 60 + 90 + 120) / 4))
    // 2x3 (odd height): the last output row averages one real row + zeros
    val raster2x3 = raster2x2 ++ Array[Byte](100, 100, 100, 100, 100, 100)
    val (w2, h2, out2) = Multimodal.boxDownsample(2, 3, raster2x3)
    assert((w2, h2) === ((1, 2)))
    assert(out2.slice(3, 6).map(_ & 0xff).toSeq === Seq(200 / 4, 200 / 4, 200 / 4))
    // values above 127 survive the signed-byte round trip
    assert(out1.forall(b => (b & 0xff) >= 0))
  }

  test("property: PPM/WAV codecs round-trip arbitrary byte payloads") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))
    val payloads = (0 until 90).iterator
      .flatMap(i => gen.apply(Gen.Parameters.default, Seed(7L + i)))
      .take(30).toSeq
    payloads.foreach { bs =>
      val data = bs.toArray
      val (w, h, raster) = Multimodal.decodePpmRaster(Multimodal.encodePpm(data))
      assert(w === Multimodal.PpmWidth)
      assert(raster.length === w * h * 3)
      assert(raster.length >= data.length)
      // payload bytes come back verbatim, padding is zero
      assert(raster.take(data.length).toSeq === data.toSeq)
      assert(raster.drop(data.length).forall(_ === 0))
      val (rate, ch, bits, samples) =
        Multimodal.decodeWavSamples(Multimodal.encodeWav(data))
      assert((rate, ch, bits) === ((Multimodal.WavRate, 1, 16)))
      assert(samples.toSeq === data.toSeq.map(b => ((b & 0xff) - 128) * 256))
    }
  }

  test("property: box downsample preserves total mass up to floor loss") {
    for (w <- 1 to 6; h <- 1 to 9) {
      val raster = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
      val (ow, oh, out) = Multimodal.boxDownsample(w, h, raster)
      assert(ow === (w + 1) / 2 && oh === (h + 1) / 2)
      // every input pixel lands in exactly one 2x2 block and each output
      // value is the floor-average, so 4*sum(out) <= sum(in) with at most
      // 3 lost per output pixel-channel
      val inSum = raster.map(b => (b & 0xff).toLong).sum
      val outSum4 = out.map(b => (b & 0xff).toLong).sum * 4
      assert(outSum4 <= inSum)
      assert(inSum - outSum4 <= 3L * ow * oh * 3)
      // constant image stays constant where no padding is involved
      if (w % 2 == 0 && h % 2 == 0) {
        val const = Array.fill(w * h * 3)(77.toByte)
        val (_, _, c) = Multimodal.boxDownsample(w, h, const)
        assert(c.forall(_ === 77.toByte))
      }
    }
  }

  test("encode/decode round trip matches the closed-form feature arithmetic") {
    val text = "a quick sample document with some bytes in it 0123456789"
    val tb = text.getBytes("UTF-8")
    val (w, h, r, g, b) = Multimodal.decodePpm(Multimodal.encodePpm(tb))
    assert(w === Multimodal.PpmWidth)
    assert(h === math.max(1, (tb.length + 23) / 24))
    def chanSum(off: Int) = tb.indices.collect { case i if i % 3 == off => (tb(i) & 0xff).toLong }.sum
    assert((r, g, b) === ((chanSum(0), chanSum(1), chanSum(2))))
    val (rate, ch, bits, n, sum) = Multimodal.decodeWav(Multimodal.encodeWav(tb))
    assert((rate, ch, bits, n) === ((Multimodal.WavRate, 1, 16, tb.length)))
    assert(sum === tb.map(x => 256L * math.abs((x & 0xff) - 128)).sum)
  }
}
