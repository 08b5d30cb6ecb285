package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The end-to-end training-data curation pipeline, composed from the
  * verified pieces: per-doc quality scoring → quality filter → exact dedup
  * (keep min doc_id per normalized fingerprint) → near-dup removal (drop
  * the higher doc_id of every Jaccard ≥ τ pair).
  *
  * This is the query a user of the engine actually runs over a raw corpus;
  * each stage is one shuffle (fingerprint window, gram join) and the output
  * is deterministic, so the whole five-stage pipeline is DuckDB-oracle
  * checked end to end.
  */
object CorpusClean {

  val QualityThreshold = 0.5

  def clean(s: SparkSession, d: String): DataFrame = {
    val toks = Text.tokens(col("text"))
    val stats = Tables.documents(s, d)
      .withColumn("toks", toks)
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_distinct", size(array_distinct(col("toks"))))
      .withColumn("stops",
        size(filter(col("toks"), t => t.isin("the", "a", "of", "and", "is", "to", "in"))))
      .withColumn("quality_score",
        least(lit(1.0), col("n_tokens").cast("double") / lit(50.0)) * lit(0.4)
          + (col("n_distinct").cast("double") / col("n_tokens").cast("double")) * lit(0.3)
          + least(lit(1.0), (col("stops").cast("double") / col("n_tokens").cast("double")) * lit(5.0)) * lit(0.3))
      .select(col("doc_id"), col("n_tokens"), col("quality_score"),
        sha2(array_join(col("toks"), " "), 256).as("fingerprint"))

    // exact dedup: keep the lowest doc_id per fingerprint
    val keepers = stats
      .withColumn("keeper", min(col("doc_id")).over(Window.partitionBy("fingerprint")))
      .filter(col("doc_id") === col("keeper"))

    // near-dup removal: drop the higher id of each pair (keep-first policy)
    val losers = TextDedup.queries("dedup_jaccard")(s, d)
      .select(col("d2").as("doc_id")).distinct()

    keepers
      .filter(col("quality_score") >= QualityThreshold)
      .join(losers, Seq("doc_id"), "left_anti")
      .select("doc_id", "n_tokens", "quality_score")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_clean" -> ((s, d) => clean(s, d))
  )

  def oracles: Map[String, String] = {
    val ts = Text.tokensSql("text")
    Map("corpus_clean" -> s"""
WITH base AS (
  SELECT doc_id, $ts AS toks FROM documents
),
m AS (
  SELECT doc_id,
    CAST(len(toks) AS INT) AS n_tokens,
    CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
    CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','is','to','in'))) AS INT) AS stops,
    sha256(array_to_string(toks, ' ')) AS fingerprint
  FROM base
),
q AS (
  SELECT doc_id, n_tokens, fingerprint,
    least(CAST(1.0 AS DOUBLE), CAST(n_tokens AS DOUBLE) / CAST(50.0 AS DOUBLE)) * CAST(0.4 AS DOUBLE)
    + (CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * CAST(0.3 AS DOUBLE)
    + least(CAST(1.0 AS DOUBLE), (CAST(stops AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * CAST(5.0 AS DOUBLE)) * CAST(0.3 AS DOUBLE)
      AS quality_score
  FROM m
),
keepers AS (
  SELECT * FROM (
    SELECT q.*, MIN(doc_id) OVER (PARTITION BY fingerprint) AS keeper FROM q
  ) WHERE doc_id = keeper
),
ng AS (
  SELECT doc_id, ${Text.ngramsSql(ts, 3)} AS grams FROM documents
),
flat AS (SELECT doc_id, unnest(grams) AS g FROM ng),
sizes AS (SELECT doc_id, CAST(len(grams) AS INT) AS n FROM ng),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(COUNT(*) AS INT) AS i
  FROM flat a JOIN flat b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
losers AS (
  SELECT DISTINCT d2 AS doc_id
  FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
  WHERE CAST(i AS DOUBLE) / CAST(s1.n + s2.n - i AS DOUBLE) >= ${TextDedup.JaccardThreshold}
)
SELECT doc_id, n_tokens, quality_score
FROM keepers
WHERE quality_score >= $QualityThreshold
  AND doc_id NOT IN (SELECT doc_id FROM losers)""")
  }
}
