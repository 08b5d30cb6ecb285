package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Positional-index retrieval operators over `documents`:
  *
  *  - `phrase_search`: exact multi-token phrase matching via a positional
  *    inverted index — the index-join formulation (postings of the phrase
  *    terms equi-joined on doc + position offsets), NOT a LIKE scan of
  *    every document. At 100 TB the postings for three terms are a tiny
  *    slice of the corpus, and the join touches only them; the full-scan
  *    LIKE alternative reads everything. The DuckDB oracle IS the scan
  *    formulation (an independent derivation of the same matches).
  *  - `collocation_lift`: top bigram collocations ranked by lift
  *    = P(xy) / (P(x)·P(y)) = (c_xy·N) / (c_x·c_y) — the log-free
  *    PMI-rank equivalent (ln is banned from oracle-hashed floats; lift
  *    orders identically to PMI since ln is monotone). Counts are exact
  *    integers; the single division is IEEE-correctly-rounded on both
  *    engines.
  *
  * Scale shapes: the positional explode is one narrow flatMap-shaped
  * projection (token, position) partitioned by doc; postings filter to
  * the phrase terms BEFORE the self-join, so the join input is
  * selectivity-bounded. Collocation counting is two hash aggregates
  * (unigram, bigram) plus a broadcast of the unigram dim — vocabulary,
  * not corpus, sized.
  */
object PhraseIndex {

  /** The searched phrase — three mid-frequency corpus terms (hits ~1.4 %
    * of documents at sf0.01, so the result is selective but non-empty at
    * every SF). */
  val Phrase: Seq[String] = Seq("row", "column", "sort")

  /** (doc_id, pos, tok) positional postings, 1-based positions to match
    * DuckDB list indexing. */
  private def postings(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), posexplode(Text.tokens(col("text"))).as(Seq("pos0", "tok")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("tok"))

  def phraseSearch(s: SparkSession, d: String): DataFrame = {
    val p = postings(s, d).filter(col("tok").isin(Phrase: _*))
    // anchor = postings of the first term; each subsequent term must
    // appear at anchor_pos + i. Equi-join on (doc_id, pos) — the join
    // keys co-partition, so one shuffle of the filtered postings.
    val anchor = p.filter(col("tok") === Phrase.head)
      .select(col("doc_id"), col("pos").as("start"))
    val matched = Phrase.zipWithIndex.tail.foldLeft(anchor) { case (acc, (w, i)) =>
      val nxt = p.filter(col("tok") === w)
        .select(col("doc_id"), (col("pos") - i).as("start"))
      acc.join(nxt, Seq("doc_id", "start"))
    }
    matched.groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"), min("start").cast("long").as("first_pos"))
  }

  val phraseSql: String = {
    val conds = Phrase.zipWithIndex
      .map { case (w, i) => s"w[i${if (i == 0) "" else s"+$i"}] = '$w'" }
      .mkString(" AND ")
    s"""
WITH toks AS (
  SELECT doc_id, ${Text.tokensSql("text")} AS w FROM documents
), hits AS (
  SELECT doc_id,
    list_filter(generate_series(1, greatest(len(w) - ${Phrase.size - 1}, 0)),
                i -> $conds) AS starts
  FROM toks
)
SELECT doc_id, CAST(len(starts) AS BIGINT) AS n_matches,
       CAST(starts[1] AS BIGINT) AS first_pos
FROM hits WHERE len(starts) > 0"""
  }

  /** Minimum bigram count for a collocation candidate (kills the noise
    * tail; mirrors standard collocation-extraction practice). */
  val MinSupport = 5L
  val TopN = 20

  def collocationLift(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), Text.tokens(col("text")).as("w"))
      // pre-projected attribute (NOT inlined into the HOF) — the
      // lambda-inlining trap re-evaluates the split per array element
      .select(col("doc_id"), col("w"),
        explode(Text.ngramsAll(col("w"), 2)).as("bg"))
    val bi = toks.groupBy("bg").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= MinSupport)
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .withColumn("w2", split(col("bg"), " ").getItem(1))
    val uniDf = Tables.documents(s, d)
      .select(explode(Text.tokens(col("text"))).as("tok"))
    val uni = uniDf.groupBy("tok").agg(count(lit(1)).as("c"))
    val total = uniDf.agg(count(lit(1)).as("n_tokens"))
    val scored = bi
      .join(broadcast(uni.select(col("tok").as("w1"), col("c").as("c_x"))), Seq("w1"))
      .join(broadcast(uni.select(col("tok").as("w2"), col("c").as("c_y"))), Seq("w2"))
      .crossJoin(broadcast(total))
      .withColumn("lift",
        (col("c_xy") * col("n_tokens")).cast("double") /
          (col("c_x") * col("c_y")).cast("double"))
    scored
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("lift").desc, col("w1"), col("w2"))))
      .filter(col("rnk") <= TopN)
      .select(col("rnk").cast("int").as("rnk"), col("w1"), col("w2"),
        col("c_xy"), col("c_x"), col("c_y"), col("lift"))
  }

  val collocationSql: String = s"""
WITH toks AS (
  -- alias must NOT be `w`: ngramsAllSql's internal subquery aliases its
  -- own `w`, and DuckDB binds the collision self-referentially
  SELECT doc_id, ${Text.tokensSql("text")} AS tk FROM documents
), uni AS (
  SELECT unnest(tk) AS tok FROM toks
), uc AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY tok
), total AS (
  SELECT CAST(count(*) AS BIGINT) AS n_tokens FROM uni
), bi AS (
  SELECT unnest(${Text.ngramsAllSql("tk", 2)}) AS bg FROM toks
), bc AS (
  SELECT bg, CAST(count(*) AS BIGINT) AS c_xy FROM bi GROUP BY bg
  HAVING count(*) >= $MinSupport
), scored AS (
  SELECT string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2, c_xy
  FROM bc
)
SELECT CAST(rnk AS INT) AS rnk, w1, w2, c_xy, c_x, c_y, lift FROM (
  SELECT s.w1, s.w2, s.c_xy, a.c AS c_x, b.c AS c_y,
    CAST(s.c_xy * t.n_tokens AS DOUBLE) / CAST(a.c * b.c AS DOUBLE) AS lift,
    row_number() OVER (ORDER BY CAST(s.c_xy * t.n_tokens AS DOUBLE) / CAST(a.c * b.c AS DOUBLE) DESC, s.w1, s.w2) AS rnk
  FROM scored s
  JOIN uc a ON s.w1 = a.tok
  JOIN uc b ON s.w2 = b.tok
  CROSS JOIN total t
) WHERE rnk <= $TopN"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "phrase_search"    -> ((s, d) => phraseSearch(s, d)),
    "collocation_lift" -> ((s, d) => collocationLift(s, d))
  )

  def oracles: Map[String, String] = Map(
    "phrase_search"    -> phraseSql,
    "collocation_lift" -> collocationSql
  )
}
