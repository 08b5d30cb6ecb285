package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics checks for the lexical retrieval / sketch family. */
class RetrievalSpec extends SparkSpec {

  test("bm25: scores are non-increasing and every scored doc exists") {
    val rows = Retrieval.bm25TopK(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(s => !s.isNaN && s >= 0))
  }

  test("bm25: a doc with more query-term hits outranks an equal-length doc with none") {
    // Structural sanity on the rational-idf variant: zero-hit docs score 0.
    val rows = Retrieval.bm25TopK(spark, sf, k = 1000).collect()
    val zeroScores = rows.filter(_.getAs[Double]("score") == 0.0)
    // every zero-score doc must truly contain none of the query terms
    val ids = zeroScores.map(_.getAs[Long]("doc_id")).toSet
    if (ids.nonEmpty) {
      val hasTerm = graft.Tables.documents(spark, sf)
        .filter(col("doc_id").isin(ids.toSeq: _*))
        .select(Text.tokens(col("text")).as("toks"))
        .filter(Retrieval.QueryTerms.map(t => array_contains(col("toks"), t)).reduce(_ || _))
      assert(hasTerm.count() === 0)
    }
  }

  test("cms: estimates never underestimate, and the absent probe is exactly 0") {
    val rows = Retrieval.cmsHeavyCounts(spark, sf).collect()
    assert(rows.length === Retrieval.ProbeTokens.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_estimate") >= r.getAs[Long]("exact_n"), r.toString)
      assert(r.getAs[Long]("overestimate") >= 0, r.toString)
    }
    val zebra = rows.find(_.getAs[String]("tok") == "zebra").get
    assert(zebra.getAs[Long]("exact_n") === 0L)
  }

  test("renyi diversity: collision mass in (0,1], eff_vocab bounded by support") {
    val rows = Retrieval.renyiDiversity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cm = r.getAs[Double]("collision_mass")
      assert(cm > 0 && cm <= 1.0, r.toString)
      // inverse-Simpson (exp Renyi-2) never exceeds the distinct-token count
      assert(r.getAs[Double]("eff_vocab") <= r.getAs[Long]("n_distinct") + 1e-9, r.toString)
    }
  }
}
