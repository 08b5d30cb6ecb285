package graft.llm

import graft.SparkSpec

/** The histogram stump must RECOVER the planted label structure, not just
  * reproduce the oracle arithmetic: the label is a noisy threshold on
  * n_chars, so n_chars must win, the correlated token count must beat the
  * uninformative noise feature, and the noise split must buy ~nothing over
  * the unsplit baseline. */
class StumpSpec extends SparkSpec {

  test("stump ranks the planted signal above the correlated and noise features") {
    val rows = Stump.queries("stump_split_gain")(spark, sf).collect()
      .map(r => r.getAs[String]("feature") ->
        (r.getAs[Long]("split_bin"), r.getAs[Long]("score_q"))).toMap
    assert(rows.keySet === Set("n_chars", "n_tokens", "noise"))
    val (chars, toks, noise) =
      (rows("n_chars"), rows("n_tokens"), rows("noise"))
    assert(chars._2 > toks._2, s"n_chars must outrank n_tokens: $rows")
    assert(toks._2 > noise._2, s"n_tokens must outrank noise: $rows")
    // the recovered n_chars cut sits near the planted threshold (430 minus
    // the 0..240 noise term → effective boundary ~190..430 chars; bins of
    // width 16 → bin 11..27)
    assert(chars._1 >= 11 && chars._1 <= 27, s"split bin off: $chars")
    // the noise split is worth ~nothing: its score stays within 2% of the
    // unsplit baseline purity (Σc²/N²)
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(1) + (r.getLong(0) % 7) * 40 > 430)
    val (p, n) = (docs.count(identity).toLong, docs.count(!_).toLong)
    val base = (p.toDouble * p + n.toDouble * n) / ((p + n).toDouble * (p + n))
    assert(math.abs(noise._2 / 1e6 - base) < 0.02, s"noise=$noise base=$base")
  }
}
