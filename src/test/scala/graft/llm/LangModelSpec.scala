package graft.llm

import graft.SparkSpec

class LangModelSpec extends SparkSpec {

  test("bigram LM: per-context probabilities are a valid ranked MLE head") {
    val rows = LangModel.bigramTopK(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("w1")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      // ranks are 1..k dense, counts non-increasing, probs in (0,1]
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      val cs = sorted.map(_.getAs[Long]("c12"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
      sorted.foreach { r =>
        val p = r.getAs[Double]("cond_prob")
        assert(p > 0.0 && p <= 1.0)
        assert(p == r.getAs[Long]("c12").toDouble / r.getAs[Long]("c1").toDouble)
      }
    }
  }

  test("BPE: merges on a hand-computed corpus match the classic algorithm") {
    val s0 = spark; import s0.implicits._
    // corpus: "low" x5, "lower" x2, "newest" x6, "widest" x3 (the standard
    // BPE walkthrough example, space-free). Expected first merges:
    //   e+s (9: newest 6 + widest 3), then es+t (9), then l+o (7)
    val docs = Seq.fill(5)("low").zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      Seq.fill(2)("lower").zipWithIndex.map { case (t, i) => (100L + i, t) } ++
      Seq.fill(6)("newest").zipWithIndex.map { case (t, i) => (200L + i, t) } ++
      Seq.fill(3)("widest").zipWithIndex.map { case (t, i) => (300L + i, t) }
    val df = docs.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val merges = LangModel.bpeMerges(spark, dir, iters = 3).collect()
      .sortBy(_.getAs[Int]("iteration"))
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym"),
        r.getAs[Long]("pair_count")))
    // note: word-TYPE counting (each distinct word counted once per corpus
    // occurrence via freq) — identical to Sennrich's reference algorithm
    assert(merges(0) == (("e", "s", 9L)), s"got ${merges.toSeq}")
    assert(merges(1) == (("es", "t", 9L)), s"got ${merges.toSeq}")
    assert(merges(2) == (("l", "o", 7L)), s"got ${merges.toSeq}")
  }

  test("BPE encode: classic corpus encodes to the hand-derived symbol counts") {
    val s0 = spark; import s0.implicits._
    // same walkthrough corpus; doc_ids chosen so the % 20 stride keeps one
    // doc per word: 0→low, 100→lower, 200→newest, 300→widest.
    // 6 merges: e+s, es+t, l+o, lo+w, e+w, ew+est (ties break
    // lexicographically) → low=[low], lower=[low,e,r], newest=[n,ewest],
    // widest=[w,i,d,est].
    val docs = Seq.fill(5)("low").zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      Seq.fill(2)("lower").zipWithIndex.map { case (t, i) => (100L + i, t) } ++
      Seq.fill(6)("newest").zipWithIndex.map { case (t, i) => (200L + i, t) } ++
      Seq.fill(3)("widest").zipWithIndex.map { case (t, i) => (300L + i, t) }
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_enc_").toString
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = LangModel.bpeEncode(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_chars"),
          r.getAs[Long]("n_syms"), r.getAs[Long]("n_single_sym"),
          r.getAs[Double]("chars_per_sym"))).toMap
    assert(rows.keySet === Set(0L, 100L, 200L, 300L))
    assert(rows(0L)   === ((1L, 3L, 1L, 1L, 3.0)))       // low → [low]
    assert(rows(100L) === ((1L, 5L, 3L, 0L, 5.0 / 3.0))) // lower → [low, e, r]
    assert(rows(200L) === ((1L, 6L, 2L, 0L, 3.0)))       // newest → [n, ewest]
    assert(rows(300L) === ((1L, 6L, 4L, 0L, 1.5)))       // widest → [w, i, d, est]
  }

  test("BPE encode: compression invariants hold on the real corpus") {
    val rows = LangModel.bpeEncode(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nt, nc, ns) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("n_syms"))
      assert(ns >= nt && ns <= nc, r.toString) // 1..len(word) symbols per token
      assert(r.getAs[Long]("n_single_sym") <= nt)
      assert(r.getAs[Double]("chars_per_sym") >= 1.0)
    }
  }

  test("batched BPE with topC=1 reduces bit-exactly to the sequential trainer") {
    // the equivalence that justifies the batched scale path — and, since
    // round 12, the REGISTERED bpe_merges path itself (it routes through
    // the batched superstep with topC=1, zero per-merge driver collects):
    // a 1-candidate batch IS classic BPE (no conflict filter can ever
    // fire), so it must agree merge-for-merge with the per-merge-collect
    // sequential reference on the real corpus
    val seq = LangModel.bpeMergesSeq(spark, sf, iters = 6).collect()
      .sortBy(_.getAs[Int]("iteration"))
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym"),
        r.getAs[Long]("pair_count"))).toSeq
    val bat = LangModel.bpeMerges(spark, sf, iters = 6).collect()
      .sortBy(_.getAs[Int]("iteration"))
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym"),
        r.getAs[Long]("pair_count"))).toSeq
    assert(bat === seq)
  }

  test("BPE decode: encode∘decode is the identity over the corpus vocabulary") {
    val rows = LangModel.bpeDecodeRoundtrip(spark, sf).collect()
    assert(rows.nonEmpty)
    // the lossless contract: not one roundtrip failure in any length bucket
    rows.foreach { r =>
      assert(r.getAs[Long]("n_roundtrip_fail") === 0L, r.toString)
      assert(r.getAs[Long]("n_words") >= 1L)
      // merges only shrink symbol counts: 1 <= syms(word) <= len(word)
      assert(r.getAs[Long]("n_syms") >= r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("n_syms") <=
        r.getAs[Int]("word_len").toLong * r.getAs[Long]("n_words"))
    }
  }

  test("batched BPE: every superstep's kept merges are mutually conflict-free") {
    val rows = LangModel.bpeMergesBatched(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Int]("superstep")).foreach { case (t, rs) =>
      assert(rs.length >= 1, s"superstep $t kept nothing")
      val sets = rs.map { r =>
        val (l, m) = (r.getAs[String]("left_sym"), r.getAs[String]("right_sym"))
        Set(l, m, l + m)
      }
      for (i <- sets.indices; j <- sets.indices if i < j)
        assert(sets(i).intersect(sets(j)).isEmpty,
          s"superstep $t: interacting merges ${sets(i)} / ${sets(j)}")
    }
  }

  test("batched BPE trains a tokenizer-scale merge count in bounded supersteps") {
    // the K=50k argument in miniature: many merges per aggregation pass,
    // lineage checkpointed — 20 supersteps must land ≥3× the sequential
    // loop's 20 merges in the same number of pair aggregations (the
    // conservative conflict filter keeps ~4-5 of the top-64 on this tiny
    // vocabulary; real vocabularies keep far more — symbols collide less)
    val rows = LangModel.bpeMergesBatched(
      spark, sf, supersteps = 20, topC = 64, checkpoint = true).collect()
    val perStep = rows.groupBy(_.getAs[Int]("superstep")).view.mapValues(_.length).toMap
    assert(rows.length >= 60,
      s"expected amortization: ${rows.length} merges over 20 supersteps ($perStep)")
    // merges stay well-formed deep into training
    rows.foreach { r =>
      assert(r.getAs[String]("merged") ===
        r.getAs[String]("left_sym") + r.getAs[String]("right_sym"))
      assert(r.getAs[Long]("pair_count") >= 1L)
    }
  }

  test("BPE: consecutive pair occurrences merge greedily left-to-right") {
    val s0 = spark; import s0.implicits._
    // "aaaa" x3: pairs (a,a) count 9 (3 per word-occurrence x 3)... after
    // merge the word becomes "aa aa" (greedy non-overlapping), so round 2's
    // best pair is (aa, aa)
    val df = Seq.fill(3)("aaaa").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe2_").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val merges = LangModel.bpeMerges(spark, dir, iters = 2).collect()
      .sortBy(_.getAs[Int]("iteration"))
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym"),
        r.getAs[String]("merged").length.toLong))
    assert(merges(0)._1 == "a" && merges(0)._2 == "a")
    assert(merges(1) == (("aa", "aa", 4L)), s"got ${merges.toSeq}")
  }
}
