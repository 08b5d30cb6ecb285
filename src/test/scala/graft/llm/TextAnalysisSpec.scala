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
}
