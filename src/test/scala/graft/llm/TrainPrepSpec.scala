package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Training-assembly invariants: hash splits are stable and roughly
  * proportioned, packing offsets stay inside the context window and bins
  * advance monotonically per shard, truncated-embedding energy is a valid
  * fraction of the full norm. */
class TrainPrepSpec extends SparkSpec {

  test("rag_chunk_overlap: chunks tile every tokenized doc at stride 48") {
    val out = TrainPrep.queries("rag_chunk_overlap")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val byDoc = out.groupBy(_._1)
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), Text.tokens(col("text")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // every doc with tokens chunks; empty docs emit nothing
    assert(byDoc.keySet === docs.filter(_._2.nonEmpty).keys.toSet)
    for ((id, chunks) <- byDoc) {
      val toks = docs(id)
      val sorted = chunks.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (0L until sorted.length).toSeq)
      for ((_, idx, start, nck, text) <- sorted) {
        assert(start === idx * 48)
        val exp = toks.slice(start.toInt, start.toInt + 64)
        assert(nck === exp.length.toLong)
        assert(text === exp.mkString(" "))
      }
      // coverage: the final window reaches the end of the token stream
      val last = sorted.last
      assert(last._3 + last._4 >= toks.length.toLong)
    }
    // overlap is real somewhere: at least one doc has >1 chunk
    assert(byDoc.values.exists(_.length > 1))
  }

  test("hash_split is deterministic and roughly 80/10/10") {
    val a = TrainPrep.queries("hash_split")(spark, sf).collect()
    val b = TrainPrep.queries("hash_split")(spark, sf).collect()
    assert(a.toSeq === b.toSeq)
    val n = a.length.toDouble
    val frac = a.groupBy(_.getAs[String]("split")).view.mapValues(_.length / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.1)
    assert(frac.keySet === Set("train", "val", "test"))
  }

  test("seq_packing: offsets inside the window, bins monotone per source") {
    val df = TrainPrep.queries("seq_packing")(spark, sf).cache()
    try {
      assert(df.filter(col("pack_offset") < 0 || col("pack_offset") >= 512).count() === 0L)
      // bin of each doc >= bin of the previous doc within its source shard
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")
      val regress = df
        .withColumn("prev_bin", lag(col("pack_bin"), 1).over(w))
        .filter(col("prev_bin").isNotNull && col("pack_bin") < col("prev_bin"))
      assert(regress.count() === 0L)
      // if some shard holds more than one window of tokens, the packing
      // must actually open a second bin there (at tiny SFs every shard
      // fits in bin 0 — then the stronger check is vacuous and skipped)
      val maxShardTokens = df.groupBy("source").agg(sum("n_tokens").as("t"))
        .agg(max("t")).head().getLong(0)
      if (maxShardTokens > 512L * 2)
        assert(df.agg(max("pack_bin")).head().getLong(0) > 0L)
    } finally df.unpersist()
  }

  test("stratified_sample hits every stratum with a plausible fraction") {
    val rows = TrainPrep.queries("stratified_sample")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val frac = r.getAs[Double]("sampled_frac")
      assert(frac > 0.0 && frac < 1.0, s"lang ${r.getAs[String]("lang")}: frac $frac")
    }
  }

  test("temperature_mix: valid distributions; smoothing compresses toward uniform") {
    val rows = TrainPrep.queries("temperature_mix")(spark, sf).collect()
      .sortBy(_.getAs[Long]("n_tokens"))
    assert(rows.length > 1)
    // both p and q are distributions
    assert(math.abs(rows.map(_.getAs[Double]("p_raw")).sum - 1.0) < 1e-12)
    assert(math.abs(rows.map(_.getAs[Double]("p_temp")).sum - 1.0) < 1e-12)
    // q matches the closed form sqrt(n)/Σsqrt(n) with the ordered fold
    val z = rows.sortBy(_.getAs[String]("lang"))
      .map(r => math.sqrt(r.getAs[Long]("n_tokens").toDouble))
      .foldLeft(0.0)(_ + _)
    rows.foreach { r =>
      val q = math.sqrt(r.getAs[Long]("n_tokens").toDouble) / z
      assert(r.getAs[Double]("p_temp") === q, r.toString)
      assert(r.getAs[Double]("upsample") ===
        r.getAs[Double]("p_temp") / r.getAs[Double]("p_raw"))
    }
    // α = 1/2 smoothing: upsample factor strictly decreases as shard size
    // grows — small shards are boosted, big shards damped
    val ups = rows.map(_.getAs[Double]("upsample"))
    ups.zip(ups.tail).foreach { case (small, big) => assert(small >= big) }
    // and if shard sizes differ, the smallest is upsampled above 1
    if (rows.head.getAs[Long]("n_tokens") < rows.last.getAs[Long]("n_tokens")) {
      assert(ups.head > 1.0 && ups.last < 1.0)
    }
  }

  test("embed_slice_norm: prefix energy is a valid fraction of full energy") {
    val bad = TrainPrep.queries("embed_slice_norm")(spark, sf)
      .filter(col("norm16") > col("norm64") ||
        col("energy_ratio") <= 0.0 || col("energy_ratio") > 1.0)
    assert(bad.count() === 0L)
  }

  test("corpus_budget_select = the maximal greedy quality prefix under half the token mass") {
    val all = TextAnalysis.qualityOf(graft.Tables.documents(spark, sf))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_tokens").toLong,
        r.getAs[Double]("quality_score")))
    val budget = all.map(_._2).sum / 2
    // greedy brute force: quality desc, doc_id asc, take while within budget
    val ordered = all.sortBy { case (id, _, q) => (-q, id) }
    val expected = ordered
      .scanLeft((0L, 0L)) { case ((_, cum), (id, n, _)) => (id, cum + n) }
      .drop(1).takeWhile(_._2 <= budget).toMap
    val got = TrainPrep.queries("corpus_budget_select")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cum_tokens"))
    assert(got.length === got.toMap.size, "each doc selected at most once")
    assert(got.toMap === expected)
    assert(expected.nonEmpty)
    // maximality: the next doc in quality order would overflow the budget
    val nextIdx = expected.size
    if (nextIdx < ordered.length)
      assert(expected.values.max + ordered(nextIdx)._2 > budget)
  }

  test("train_export: chain invariants hold (funnel, packing, shuffle positions)") {
    val funnel = TrainPrep.queries("train_export_funnel")(spark, sf).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    val export = TrainPrep.queries("train_export")(spark, sf).collect()
    // funnel is monotone: each stage only drops documents, and the export
    // carries every train doc exactly once per epoch
    assert(funnel("raw") >= funnel("cleaned"))
    assert(funnel("cleaned") >= funnel("budget_select"))
    assert(funnel("budget_select") >= funnel("train_split"))
    assert(funnel("export_rows") === funnel("train_split") * 2)
    assert(export.length.toLong === funnel("export_rows"))
    assert(funnel("train_split") > 0, "empty export — chain broke upstream")
    // schema: epoch, doc_id, source, n_tokens, quality_score, pack_bin,
    //         pack_offset, shard, pos
    val rows = export.map(r => (r.getInt(0), r.getLong(1), r.getString(2),
      r.getInt(3), r.getDouble(4), r.getLong(5), r.getLong(6), r.getLong(7),
      r.getLong(8)))
    // every exported doc survives the cleaned pipeline's quality gate
    assert(rows.forall(_._5 >= CorpusClean.QualityThreshold))
    // packing: offsets live inside the context window
    assert(rows.forall(r => r._7 >= 0 && r._7 < 512))
    // per-epoch: the two epochs export the SAME doc set under DIFFERENT
    // permutations (that's what folding the epoch into the hash buys)
    val e1 = rows.filter(_._1 == 1); val e2 = rows.filter(_._1 == 2)
    assert(e1.map(_._2).sorted.toSeq === e2.map(_._2).sorted.toSeq)
    assert(e1.map(r => (r._2, r._8, r._9)).toSet !== e2.map(r => (r._2, r._8, r._9)).toSet)
    // shuffle positions are contiguous 1..n per (epoch, shard)
    for (((_, _), grp) <- rows.groupBy(r => (r._1, r._8)))
      assert(grp.map(_._9).sorted.toSeq === (1L to grp.length).toSeq)
  }

  test("fim_transform spans reassemble to the original document") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = TrainPrep.queries("fim_transform")(spark, sf).collect()
    assert(out.length === docs.size) // one output row per document
    var psm = 0
    out.foreach { r =>
      val text = docs(r.getLong(0))
      val n = r.getLong(1)
      assert(n === text.length.toLong)
      if (r.getString(2) == "psm") {
        psm += 1
        val p1 = r.getLong(3).toInt; val p2 = r.getLong(4).toInt
        val f = r.getString(5)
        // slice the sentinel stream by ARITHMETIC (sentinels are 9 chars;
        // span lengths are p1 / n−p2 / p2−p1), then pin each span to the
        // original — proves the transform is information-preserving
        val pre = f.substring(9, 9 + p1)
        val sufStart = 9 + p1 + 9
        val suf = f.substring(sufStart, sufStart + (n.toInt - p2))
        val mid = f.substring(sufStart + (n.toInt - p2) + 9)
        assert(pre === text.substring(0, p1))
        assert(mid === text.substring(p1, p2))
        assert(suf === text.substring(p2))
        assert(pre.nonEmpty && mid.nonEmpty && suf.nonEmpty)
        assert(f.length === n.toInt + 27)
      } else {
        assert(r.getString(5) === text)
        assert(n < 30)
        assert(r.isNullAt(3) && r.isNullAt(4))
      }
    }
    assert(psm > 0, "no document long enough to split — the test is vacuous")
  }

  test("span_corruption: sentinel splice reassembles the original tokens") {
    val rows = TrainPrep.queries("span_corruption")(spark, sf).collect()
    val texts = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    var corrupted = 0
    for (r <- rows) {
      val (id, n, mode) = (r.getLong(0), r.getLong(1), r.getString(2))
      val toks = texts(id).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      assert(n === toks.length.toLong)
      val input = r.getString(5); val target = r.getString(6)
      if (mode == "corrupt") {
        corrupted += 1
        val (sp, ln) = (r.getLong(3), r.getLong(4))
        assert(sp >= 2 && sp <= n - 4 && ln >= 2 && ln <= 4 && sp + ln <= n)
        // input prefix + target span + input suffix == original stream
        val Array(pre, suf) = input.split(" <extra_id_0> ", 2)
        assert(target.startsWith("<extra_id_0> "))
        val mid = target.stripPrefix("<extra_id_0> ")
        assert((pre + " " + mid + " " + suf) === toks.mkString(" "))
        assert(mid.split(" ").length === ln.toInt)
      } else {
        assert(n < 8 && r.isNullAt(3) && r.isNullAt(4))
        assert(input === toks.mkString(" ") && target === "")
      }
    }
    assert(corrupted > 0, "no corruptible docs — vacuous")
  }

  test("preference_pairs picks each source's extreme classifier scores") {
    val rows = TrainPrep.queries("preference_pairs")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    val scored = CorpusClean.classifierScores(spark, sf)
      .select("doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val srcOf = graft.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bySrc = scored.groupBy { case (id, _) => srcOf(id) }
    assert(rows.keySet === bySrc.filter(_._2.length >= 2).keySet)
    for ((src, docs) <- bySrc if docs.length >= 2) {
      val chosen = docs.minBy { case (id, sc) => (-sc, id) }
      val rejected = docs.minBy { case (id, sc) => (sc, -id) }
      val (n, cd, cs, rd, rs, margin) = rows(src)
      assert(n === docs.length.toLong)
      assert((cd, cs) === chosen && (rd, rs) === rejected, src)
      assert(margin === cs - rs && margin >= 0.0)
      assert(cd !== rd, "chosen and rejected must differ")
    }
  }

  test("shard_manifest recounts per shard and xor detects a mutation") {
    val rows = TrainPrep.queries("shard_manifest")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"),
        Text.rollingHash(Text.tokens(col("text"))).as("rh"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byShard = docs.groupBy(_._1 % 8L)
    assert(rows.keySet === byShard.keySet)
    for ((sh, g) <- byShard) {
      val (n, lo, hi, chars, x) = rows(sh)
      assert(n === g.length.toLong && lo === g.map(_._1).min && hi === g.map(_._1).max)
      assert(chars === g.map(_._2).sum)
      assert(x === g.map(_._3).reduce(_ ^ _))
      // dropping any one doc flips the fold (xor self-inverse)
      assert((x ^ g.head._3) !== x)
    }
  }
}
