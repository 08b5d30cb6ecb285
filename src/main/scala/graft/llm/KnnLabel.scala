package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Label-space operators over the embedding index — the supervised leg of
  * the similarity stack:
  *
  *  - `knn_classify`: k-NN majority-vote label prediction for the query
  *    sample (vec_id % 50 — the same bounded-query contract as
  *    `ann_topk_cosine`): top-10 cosine neighbors, predicted label = most
  *    votes, ties to the smallest label. The confusion row
  *    (true vs predicted) is what a training pipeline's embedding-quality
  *    gate reads.
  *  - `hard_negatives`: for each query, the single most-similar vector
  *    with a DIFFERENT label — textbook hard-negative mining for
  *    contrastive training. Same scoring kernel, label-mismatch filter
  *    before the top-k, k=1.
  *
  * Scale posture: both reuse the bounded-query × candidate scoring shape
  * whose cost is Q·N/50, and the top-k runs through the bounded-heap
  * operator ([[graft.plans.TopK]]) — no per-query global sort. At real
  * scale the candidate side would come from the LSH/IVF bucket pruning
  * (`ann_lsh_topk` / `ann_ivf_topk`); the exact form here is the recall
  * baseline those paths are measured against. Cosines are the shared
  * fold-exact dot kernel, so the DuckDB replay is bit-identical.
  */
object KnnLabel {

  val K = 10

  /** Scored (query, candidate) pairs for the query sample: query_id,
    * query label, neighbor_id, neighbor label, cosine. */
  private def scored(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("label"),
      col("embedding"), Similarity.norm(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("label").as("true_label"),
        col("embedding").as("qe"), col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("label").as("n_label"),
      col("embedding").as("ce"), col("nrm").as("cn"))
    q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        Similarity.dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .select("query_id", "true_label", "neighbor_id", "n_label", "cosine")
  }

  private def scoredSql: String = s"""
  SELECT q.vec_id AS query_id, q.label AS true_label,
         c.vec_id AS neighbor_id, c.label AS n_label,
         ${Similarity.dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cosine
  FROM e q JOIN e c ON q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id"""

  private def eSql: String =
    s"SELECT vec_id, label, embedding, ${Similarity.normSql("embedding")} AS nrm FROM embeddings"

  def knnClassify(s: SparkSession, d: String): DataFrame = {
    val topk = graft.plans.TopK.perKeyRanked(
      scored(s, d).select("query_id", "true_label", "neighbor_id", "n_label", "cosine"),
      Seq("query_id"), Seq("cosine" -> false, "neighbor_id" -> true), K,
      rankCol = "rank")
    val votes = topk.groupBy("query_id", "true_label", "n_label")
      .agg(count(lit(1)).as("votes"))
    votes
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("votes").desc, col("n_label"))))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("true_label"),
        col("n_label").as("pred_label"), col("votes"),
        (col("true_label") === col("n_label")).as("correct"))
  }

  val knnSql: String = s"""
WITH e AS (
$eSql
), scored AS (
$scoredSql
), topk AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
    FROM scored
  ) WHERE rank <= $K
), votes AS (
  SELECT query_id, true_label, n_label, CAST(count(*) AS BIGINT) AS votes
  FROM topk GROUP BY query_id, true_label, n_label
)
SELECT query_id, true_label, n_label AS pred_label, votes,
       true_label = n_label AS correct
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY votes DESC, n_label) AS rn
  FROM votes
) WHERE rn = 1"""

  def hardNegatives(s: SparkSession, d: String): DataFrame =
    graft.plans.TopK.perKeyRanked(
        scored(s, d).filter(col("n_label") =!= col("true_label")),
        Seq("query_id"), Seq("cosine" -> false, "neighbor_id" -> true), 1,
        rankCol = "rank")
      .select(col("query_id"), col("true_label"),
        col("neighbor_id").as("neg_id"), col("n_label").as("neg_label"),
        col("cosine"))

  val hardNegSql: String = s"""
WITH e AS (
$eSql
), scored AS (
$scoredSql
)
SELECT query_id, true_label, neighbor_id AS neg_id, n_label AS neg_label, cosine
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored WHERE n_label <> true_label
) WHERE rank = 1"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_classify"   -> ((s, d) => knnClassify(s, d)),
    "hard_negatives" -> ((s, d) => hardNegatives(s, d))
  )

  def oracles: Map[String, String] = Map(
    "knn_classify"   -> knnSql,
    "hard_negatives" -> hardNegSql
  )
}
