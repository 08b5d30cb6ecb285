package graft.llm

import graft.{SparkSpec, Tables}

/** Semantics pins for the per-document profiling queries whose oracle
  * proves value parity but not the intended MEANING: the rarity profile is
  * re-derived here by an independent JVM brute force over the raw text. */
class TextAnalysisSpec extends SparkSpec {

  test("doc_rarity_score matches a JVM brute force over the raw text") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // same tokenizer as Text.tokens: lower → split non-alnum runs → drop ""
    def toks(t: String): Seq[String] =
      t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val docToks = docs.map { case (id, t) => id -> toks(t) }
    val dfOf = docToks.toSeq
      .flatMap { case (id, ts) => ts.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (tok, xs) => tok -> xs.size.toLong }

    val got = TextAnalysis.queries("doc_rarity_score")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // docs with zero tokens produce no row (explode of an empty array)
    val expectedIds = docToks.collect { case (id, ts) if ts.nonEmpty => id }.toSet
    assert(got.keySet === expectedIds)
    assert(got.size === got.keySet.size)

    for ((id, ts) <- docToks if ts.nonEmpty) {
      val row  = got(id)
      val dfs  = ts.map(dfOf)
      assert(row.getAs[Long]("n_tokens") === ts.size.toLong, s"doc $id n_tokens")
      assert(row.getAs[Long]("n_hapax") === dfs.count(_ == 1L).toLong, s"doc $id n_hapax")
      assert(row.getAs[Long]("n_rare") === dfs.count(_ <= 3L).toLong, s"doc $id n_rare")
      assert(row.getAs[Long]("min_df") === dfs.min, s"doc $id min_df")
      val ratio = dfs.count(_ <= 3L).toDouble / ts.size.toDouble
      assert(row.getAs[Double]("rare_ratio") === ratio, s"doc $id rare_ratio")
      // exact mean-inverse-df up to the 1e-6 fixed-point quantization
      val avgInv = dfs.map(d => 1.0 / d.toDouble).sum / ts.size.toDouble
      assert(math.abs(row.getAs[Double]("avg_inv_df") - avgInv) <= 1e-6,
        s"doc $id avg_inv_df")
    }
    // the signal discriminates on this corpus: not every doc has the same
    // rarity (otherwise the filter thresholds nothing)
    val ratios = got.values.map(_.getAs[Double]("avg_inv_df")).toSet
    assert(ratios.size > 1)
  }

  test("vocab_growth_curve matches a JVM brute force and grows sublinearly") {
    def toks(t: String): Seq[String] =
      t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> toks(r.getString(1)))
    val mx = docs.map(_._1).max
    val rows = TextAnalysis.queries("vocab_growth_curve")(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(rows.keySet === Set(1, 2, 4, 8))
    for (k <- Seq(1, 2, 4, 8)) {
      val cut = math.floor(mx.toDouble * k / 8.0).toLong
      val prefix = docs.filter(_._1 <= cut)
      val nTok = prefix.map(_._2.size.toLong).sum
      val vocab = prefix.flatMap(_._2).distinct.size.toLong
      val (pd, nt, v, ttr) = rows(k)
      assert(pd === cut && nt === nTok && v === vocab, s"k=$k")
      assert(ttr === vocab.toDouble / nTok.toDouble, s"k=$k ttr")
    }
    // Heaps' law: vocabulary growth is SUBLINEAR — 8× the tokens must not
    // bring 8× the types (at sf0.001 the tiny synthetic vocabulary
    // saturates in the first eighth, so >= not >)
    val (v1, v8) = (rows(1)._3, rows(8)._3)
    val (n1, n8) = (rows(1)._2, rows(8)._2)
    assert(v8 >= v1 && v8.toDouble / v1.toDouble < n8.toDouble / n1.toDouble)
  }

  test("ngram_novelty matches a JVM brute force; totals balance") {
    def toks(t: String): Seq[String] =
      t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    def grams3(ts: Seq[String]): Seq[String] =
      if (ts.size < 3) Seq.empty else ts.sliding(3).map(_.mkString(" ")).toSeq.distinct
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> grams3(toks(r.getString(1))))
    val mx = docs.map(_._1).max
    def bucket(id: Long): Int =
      (1 to 7).find(k => id <= math.floor(mx.toDouble * k / 8.0).toLong).getOrElse(8)
    val firstDoc = docs.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
    val expNew = firstDoc.values.groupBy(bucket).map { case (b, v) => b -> v.size.toLong }
    val expOcc = docs.flatMap { case (id, gs) => gs.map(_ => bucket(id)) }
      .groupBy(identity).map { case (b, v) => b -> v.size.toLong }
    val rows = TextAnalysis.queries("ngram_novelty")(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows.keySet === expOcc.keySet)
    for ((b, (nw, occ, rate)) <- rows) {
      assert(nw === expNew.getOrElse(b, 0L), s"eighth $b new")
      assert(occ === expOcc(b), s"eighth $b occ")
      assert(rate === nw.toDouble / occ.toDouble)
    }
    // every gram is new exactly once: Σ new == distinct gram count
    assert(rows.values.map(_._1).sum === firstDoc.size.toLong)
    // novelty must DECAY: later eighths repeat more (the curve's point)
    assert(rows(rows.keys.max)._3 < rows(rows.keys.min)._3)
  }

  test("score_decile_lift: weighted lift averages to 1; counts balance") {
    val rows = TextAnalysis.queries("score_decile_lift")(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("decile")).sorted.toSeq === (1 to 10))
    val nAll = rows.map(_.getAs[Long]("n_docs")).sum
    val repAll = rows.map(_.getAs[Long]("n_rep")).sum
    val docs = Tables.documents(spark, sf).count()
    assert(nAll === docs)
    // deciles are balanced within 1 (the exact-ntile contract)
    val sizes = rows.map(_.getAs[Long]("n_docs"))
    assert(sizes.max - sizes.min <= 1)
    // per-decile rate recomputes, and lift normalizes by the corpus rate
    val overall = repAll.toDouble / nAll.toDouble
    assert(overall > 0.0, "label is vacuous: no repeated trigrams at this sf")
    rows.foreach { r =>
      val rate = r.getAs[Long]("n_rep").toDouble / r.getAs[Long]("n_docs").toDouble
      assert(r.getAs[Double]("rep_rate") === rate)
      assert(math.abs(r.getAs[Double]("lift") - rate / overall) < 1e-12)
    }
    // Σ n_rep·1 = overall → the n_docs-weighted mean lift is exactly 1
    val wmean = rows.map(r => r.getAs[Double]("lift") * r.getAs[Long]("n_docs")).sum / nAll
    assert(math.abs(wmean - 1.0) < 1e-9)
    // the label recomputes independently: a doc is "rep" iff some trigram
    // repeats — brute force over the raw text
    def toks(t: String): Seq[String] =
      t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val expRep = Tables.documents(spark, sf).select("text").collect()
      .map(r => toks(r.getString(0)))
      .count(ts => ts.size >= 3 && {
        val gs = ts.sliding(3).map(_.mkString(" ")).toSeq
        gs.distinct.size < gs.size
      })
    assert(repAll === expRep.toLong)
  }

  test("doc_surprisal_bits matches a JVM bit-length replay") {
    def toks(t: String): Seq[String] =
      t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val docToks = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> toks(r.getString(1))).toMap
    val ctf = docToks.values.flatten.groupBy(identity)
      .map { case (t, g) => t -> g.size.toLong }
    val nTotal = ctf.values.sum
    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val bits = ctf.map { case (t, c) => t -> (bitlen(nTotal) - bitlen(c)) }

    val scored = docToks.collect { case (id, ts) if ts.nonEmpty =>
      id -> (ts.size.toLong, ts.map(bits).sum, ts.map(bits).max)
    }
    val cb = scored.values.map(_._2).sum
    val cn = scored.values.map(_._1).sum

    val got = TextAnalysis.queries("doc_surprisal_bits")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got.keySet === scored.keySet)
    for ((id, (n, tb, mb)) <- scored) {
      val row = got(id)
      assert(row.getAs[Long]("n_tokens") === n, s"doc $id n_tokens")
      assert(row.getAs[Long]("total_bits") === tb, s"doc $id total_bits")
      assert(row.getAs[Long]("max_bits") === mb, s"doc $id max_bits")
      assert(row.getAs[Double]("bits_per_token") === tb.toDouble / n.toDouble)
      assert(row.getAs[Boolean]("high_surprisal") === (tb * cn * 16 > cb * n * 17))
    }
    // both flag classes must exist or the threshold test is vacuous
    assert(got.values.exists(_.getAs[Boolean]("high_surprisal")))
    assert(got.values.exists(!_.getAs[Boolean]("high_surprisal")))
  }

  test("langid_confusion recounts the lang_id projection exactly") {
    val cells = TextAnalysis.queries("langid_confusion")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2),
        r.getLong(3), r.getLong(4), r.getAs[Double]("recall"),
        r.getAs[Double]("precision")))).toMap
    val pairs = TextAnalysis.queries("lang_id")(spark, sf)
      .select("labeled_lang", "predicted_lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byCell = pairs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val lt = pairs.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val pt = pairs.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    assert(cells.keySet === byCell.keySet)
    for ((k @ (l, p), n) <- byCell) {
      val (nn, ltot, ptot, rec, prec) = cells(k)
      assert(nn === n && ltot === lt(l) && ptot === pt(p), k)
      assert(rec === n.toDouble / lt(l).toDouble)
      assert(prec === n.toDouble / pt(p).toDouble)
    }
    // every cell count sums to the corpus and the diagonal is non-empty
    assert(cells.values.map(_._1).sum === pairs.length.toLong)
    assert(cells.keys.exists { case (l, p) => l == p })
  }

  test("cdc_chunk_dedup matches a driver-side chunking replay") {
    val P = 1000000007L
    def chunksOf(text: String): Seq[(Long, Long)] = {
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val codes = toks.map(t => t.length.toLong * 31 + t.head.toInt)
      val n = codes.length
      if (n == 0) return Seq.empty
      val ends = (1 to n).filter { i =>
        val h = codes.slice(math.max(i - 4, 0), i)
          .foldLeft(0L)((a, c) => (a * 131 + c) % P)
        i == n || h % 17 == 0
      }
      ends.zip(1 +: ends.dropRight(1).map(_ + 1)).map { case (en, st) =>
        val h = codes.slice(st - 1, en).foldLeft(0L)((a, c) => (a * 131 + c) % P)
        (h, (en - st + 1).toLong)
      }
    }
    val all = graft.Tables.documents(spark, sf)
      .select("text").collect().flatMap(r => chunksOf(r.getString(0)))
    val per = all.groupBy(identity).map { case (k, g) => (k, g.size.toLong) }
    val total = per.values.sum
    val stored = per.keys.toSeq.map(_._2).sum // toSeq: Set.map would dedup lengths
    val totalToks = per.map { case ((_, l), m) => l * m }.sum
    val row = TextAnalysis.queries("cdc_chunk_dedup")(spark, sf).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ===
      ((total, per.size.toLong, totalToks, stored)))
    assert(row.getDouble(4) === 1.0 - stored.toDouble / totalToks.toDouble)
    // real dedup signal: duplicated chunks exist and chunking is non-trivial
    // (multi-token average chunk, more than one chunk per doc on average)
    assert(per.size.toLong < total && totalToks > total && total > 400)
  }
}
