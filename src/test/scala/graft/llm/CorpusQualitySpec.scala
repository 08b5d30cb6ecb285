package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Corpus-quality filter guarantees: every heuristic rule fires both ways
  * on real rows (no dead branches), PII redaction removes every match it
  * counts, and line dedup keeps exactly one copy of each distinct line. */
class CorpusQualitySpec extends SparkSpec {

  test("boilerplate_share flags exactly the docs dominated by corpus-wide lines") {
    val rows = CorpusQuality.queries("boilerplate_share")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    for ((_, nl, nb, share, flag) <- rows) {
      assert(nl === 3L && nb >= 0L && nb <= nl)
      assert(share === nb.toDouble / nl.toDouble)
      assert(flag === (nb * 3 >= nl))
    }
    // the planted boilerplate line makes every doc_id % 3 == 0 flagged
    assert(rows.filter(_._1 % 3 == 0).forall(_._5))
    // and some doc is NOT flagged, else the threshold is untested
    assert(rows.exists(!_._5))
  }

  test("quality rules are non-degenerate: each rule passes AND fails") {
    val df = CorpusQuality.queries("doc_quality_rules")(spark, sf)
    for (rule <- Seq("r_wordcount", "r_meanlen", "r_diversity", "r_stopwords", "quality_keep")) {
      val n    = df.count()
      val pass = df.filter(col(rule)).count()
      assert(pass > 0 && pass < n, s"$rule is degenerate: $pass/$n pass")
    }
  }

  test("linear classifier margin matches the driver-side dot product") {
    val P = 1000000007L
    def code(t: String): Long =
      t.foldLeft(0L)((a, c) => (a * 131L + c.toLong) % P)
    def wgt(b: Long): Long = ((b * 1103515245L + 12345L) % 2001L) - 1000L
    def toks(t: String): Seq[String] =
      t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val expected = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect().map { r =>
        val w = toks(r.getString(1))
        val terms = w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" "))
        val margin = terms.map(t => wgt(code(t) % CorpusClean.ClfDim)).sum
        (r.getLong(0), (terms.size.toLong, margin))
      }.filter(_._2._1 > 0).toMap // zero-term docs have no exploded rows
    val actual = CorpusClean.classifierScores(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(actual === expected)
    // keep is exactly the sign test, and both classes occur on real data
    val df = CorpusClean.classifierScores(spark, sf)
    assert(df.filter(col("keep") =!= (col("margin") >= 0L)).count() === 0)
    assert(df.filter(col("keep")).count() > 0)
    assert(df.filter(!col("keep")).count() > 0)
  }

  test("yield funnel is monotone and its last stage equals corpus_clean's output") {
    val stages = CorpusClean.yieldFunnel(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(stages.keySet === Set(0, 1, 2, 3, 4))
    // each stage can only drop documents
    (0 to 3).foreach { i =>
      assert(stages(i) >= stages(i + 1), s"stage $i -> ${i + 1} grew")
    }
    assert(stages(0) === graft.Tables.documents(spark, sf).count())
    assert(stages(4) === CorpusClean.clean(spark, sf).count(),
      "funnel terminus must equal the pipeline's actual output")
  }

  test("k-anonymity audit: cumulative in k and consistent with the QI groups") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.Diagnostics.queries("k_anonymity_audit")(spark, sf)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(rows.keySet === Set(2, 5, 10))
    // below-k counts are cumulative in k; totals identical on every row
    assert(rows(2).getLong(1) <= rows(5).getLong(1))
    assert(rows(5).getLong(1) <= rows(10).getLong(1))
    assert(rows.values.map(_.getLong(4)).toSet.size === 1, "n_rows constant")
    assert(rows(2).getLong(4) === graft.Tables.customer(spark, sf).count())
    // cross-check one threshold against a direct group-size computation
    val direct = graft.Tables.customer(spark, sf)
      .groupBy(col("c_mktsegment"), col("c_nationkey"),
        floor(col("c_acctbal") / 1000.0).cast("long"))
      .count().filter(col("count") < 5)
      .agg(coalesce(sum(col("count")), lit(0L))).head().getLong(0)
    assert(rows(5).getLong(2) === direct, "rows_below_5 cross-check")
  }

  test("filter-agreement kappa: contingency sums to n, divisions exact, kappa in [-1,1]") {
    val r = CorpusClean.filterAgreementKappa(spark, sf).head()
    val Seq(n, a, b, c2, d) = (0 to 4).map(r.getLong)
    assert(a + b + c2 + d === n && n > 0)
    assert(r.getDouble(5) === (a + d).toDouble / n)
    val pe = ((a + b) * (a + c2) + (c2 + d) * (b + d)).toDouble / (n.toDouble * n)
    assert(r.getDouble(6) === pe)
    val kappa = r.getDouble(7)
    assert(kappa >= -1.0 && kappa <= 1.0, s"kappa $kappa")
  }

  test("quality_score_topk is the true top-50 by normalized score") {
    val all = CorpusClean.classifierScores(spark, sf).collect()
      .map(r => (r.getDouble(3), r.getLong(0)))
      .sortBy { case (sc, id) => (-sc, id) }.take(50).toSeq
    val topk = CorpusClean.queries("quality_score_topk")(spark, sf).collect()
      .map(r => (r.getDouble(3), r.getLong(0))).toSeq
    assert(topk === all)
  }

  test("repetition filter flags some docs and dup fraction is in [0,1)") {
    val df = CorpusQuality.queries("repetition_ngrams")(spark, sf)
    val flagged = df.filter(col("is_repetitive")).count()
    assert(flagged > 0 && flagged < df.count())
    val bad = df.filter(col("dup_bigram_frac") < 0.0 || col("dup_bigram_frac") >= 1.0).count()
    assert(bad === 0L)
  }

  test("pii redaction removes every counted match and only injected docs have PII") {
    val df = CorpusQuality.queries("pii_redact")(spark, sf)
    // after redaction, no email/phone pattern survives anywhere
    val survivors = df.filter(
      regexp_count(col("redacted"), lit(CorpusQuality.EmailPattern)) > 0 ||
      regexp_count(col("redacted"), lit(CorpusQuality.PhonePattern)) > 0).count()
    assert(survivors === 0L)
    // counts follow the deterministic injection: %6 docs have 2 emails,
    // other %3 docs 1, the rest 0; %5 docs have 1 phone
    val wrong = df.filter(
      col("n_emails") =!= when(col("doc_id") % 6 === 0, 2)
        .when(col("doc_id") % 3 === 0, 1).otherwise(0) ||
      col("n_phones") =!= when(col("doc_id") % 5 === 0, 1).otherwise(0)).count()
    assert(wrong === 0L)
    // redaction placeholders actually appear
    assert(df.filter(col("redacted").contains("<EMAIL>")).count() > 0)
    assert(df.filter(col("redacted").contains("<PHONE>")).count() > 0)
  }

  test("rag chunks: counts match the stride formula, overlap is real") {
    val df = CorpusQuality.queries("rag_chunks")(spark, sf).cache()
    try {
      assert(df.filter(col("chunk_tokens") < 1 || col("chunk_tokens") > 20).count() === 0L)
      // per-doc chunk count == floor(max(n-20,0)/10)+1
      val bad = df.groupBy("doc_id", "n_tokens")
        .agg(count(lit(1)).as("chunks"))
        .filter(col("chunks") =!=
          (greatest(col("n_tokens") - 20, lit(0)) / 10).cast("int") + 1)
      assert(bad.count() === 0L)
      // overlap: for docs with 2+ full chunks, chunk 1 must start at token 11,
      // i.e. chunk 0 and chunk 1 share 10 tokens
      val sample = df.filter(col("doc_id") === df.filter(col("chunk_id") === 1)
        .select(min("doc_id")).head().getLong(0))
        .orderBy("chunk_id").collect()
      val c0 = sample(0).getAs[String]("chunk_text").split(" ")
      val c1 = sample(1).getAs[String]("chunk_text").split(" ")
      assert(c0.drop(10).sameElements(c1.take(c0.length - 10)))
    } finally df.unpersist()
  }

  test("paragraph dedup reassembles docs in order and keeps exactly first occurrences") {
    def toks(t: String): Seq[String] =
      t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> toks(r.getString(1))).sortBy(_._1)
    // driver-side reimplementation: positional 10-token paragraphs,
    // first-occurrence-wins in (doc_id, para_no) order, in-order rejoin
    val seen = scala.collection.mutable.Set.empty[String]
    val expected = docs.map { case (id, w) =>
      val paras = w.grouped(10).map(_.mkString(" ")).toSeq
      val kept = paras.filter(p => seen.add(p))
      id -> ((paras.size.toLong, kept.size.toLong, kept.mkString(" ")))
    }.toMap
    val actual = CorpusQuality.queries("paragraph_dedup")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(actual === expected)
    // and the dedup is real on this corpus: some doc loses a paragraph,
    // and no paragraph text survives twice across all clean_texts
    assert(actual.values.exists { case (np, nk, _) => nk < np })
    val keptParas = actual.toSeq.flatMap(_._2._3 match {
      case "" => Nil
      case t  => toks(t).grouped(10).map(_.mkString(" ")).toSeq
    })
    assert(keptParas.distinct.size === keptParas.size)
  }

  test("paragraph dedup: collapsed and direct paths are row-identical (adaptive gate)") {
    // estDupRate only picks a plan — both must be exact on any input
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.llm.Text.tokens(col("text")).as("toks"))
    def rows(collapse: Boolean) =
      CorpusQuality.paragraphDedupOver(docs, collapseTier = collapse)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .sorted.toSeq
    val a = rows(collapse = true)
    val b = rows(collapse = false)
    assert(a.nonEmpty)
    assert(a === b)
    assert(a.distinct.size === a.size)
  }

  test("line dedup keeps exactly one copy of every distinct line") {
    val df = CorpusQuality.queries("line_dedup")(spark, sf).cache()
    try {
      val distinctLines = df.select("line").distinct().count()
      val kept          = df.filter(col("keep")).count()
      assert(kept === distinctLines)
      // the planted boilerplate line must be deduped hard: many copies, one kept
      val bp = df.filter(col("line") === CorpusQuality.BoilerplateLine)
      assert(bp.count() > 1)
      assert(bp.filter(col("keep")).count() === 1L)
      // and the kept copy is the first occurrence (min doc_id among copies)
      val firstDoc = bp.agg(min("doc_id")).head().getLong(0)
      assert(bp.filter(col("keep")).head().getAs[Long]("doc_id") === firstDoc)
    } finally df.unpersist()
  }

  /** Driver-side (label, pred, score) triples joining the Gopher rules
    * with the classifier — the shared ground truth for the eval and
    * calibration replays. */
  private def labeledScores(): Seq[(Boolean, Boolean, Double, Long)] = {
    val labels = CorpusQuality.queries("doc_quality_rules")(spark, sf)
      .select("doc_id", "quality_keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    CorpusClean.classifierScores(spark, sf)
      .select("doc_id", "keep", "score").collect()
      .map(r => (labels(r.getLong(0)), r.getBoolean(1), r.getDouble(2), r.getLong(0)))
      .toSeq
  }

  test("classifier_eval matches a driver recount incl. the rank-identity AUC") {
    val row = CorpusClean.queries("classifier_eval")(spark, sf).head()
    val xs = labeledScores()
    val tp = xs.count { case (l, p, _, _) => l && p }.toLong
    val fp = xs.count { case (l, p, _, _) => !l && p }.toLong
    val fn = xs.count { case (l, p, _, _) => l && !p }.toLong
    val tn = xs.count { case (l, p, _, _) => !l && !p }.toLong
    assert((row.getAs[Long]("tp"), row.getAs[Long]("fp"),
      row.getAs[Long]("fn"), row.getAs[Long]("tn")) === ((tp, fp, fn, tn)))
    assert(row.getAs[Double]("precision") === tp.toDouble / (tp + fp).toDouble)
    assert(row.getAs[Double]("recall") === tp.toDouble / (tp + fn).toDouble)
    assert(row.getAs[Double]("f1") ===
      (2 * tp).toDouble / (2 * tp + fp + fn).toDouble)
    // AUC: ascending (score, doc_id) ranks, Mann-Whitney identity
    val rankSumPos = xs.sortBy { case (_, _, s, id) => (s, id) }.zipWithIndex
      .collect { case ((l, _, _, _), i) if l => i + 1L }.sum
    val (p, neg) = (tp + fn, fp + tn)
    assert(row.getAs[Double]("auc") ===
      (2 * rankSumPos - p * (p + 1)).toDouble / (2 * p * neg).toDouble)
    // both classes exist, so none of the denominators were degenerate
    assert(p > 0 && neg > 0 && tp + fp > 0)
  }

  test("score_calibration bins partition the corpus and recount exactly") {
    val rows = CorpusClean.queries("score_calibration")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getAs[Double]("mean_score"), r.getAs[Double]("frac_pos")))).toMap
    val xs = labeledScores()
    val byBin = xs.groupBy { case (_, _, s, _) =>
      math.min(math.floor((s + 1.0) * 5.0).toLong, 9L) }
    assert(rows.keySet === byBin.keySet)
    assert(rows.values.map(_._1).sum === xs.length.toLong)
    for ((bin, g) <- byBin) {
      val (n, nPos, meanScore, fracPos) = rows(bin)
      assert(n === g.length.toLong, s"bin $bin n")
      assert(nPos === g.count(_._1).toLong, s"bin $bin n_pos")
      // HALF_UP, matching Spark/DuckDB round(x, 0) — not rint's half-even
      val confNum = g.map { case (_, _, s, _) =>
        BigDecimal(s * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong }.sum
      assert(meanScore === confNum.toDouble / n.toDouble / 1e6, s"bin $bin conf")
      assert(fracPos === nPos.toDouble / n.toDouble, s"bin $bin frac")
    }
  }
}
