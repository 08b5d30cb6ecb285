package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Retrieval-quality audit for the ANN family: recall@k of every
  * approximate top-k method against the brute-force exact ground truth
  * (`ann_topk_cosine`) — the metric every production vector pipeline
  * watches when it tunes bucket counts, probe lists or code sizes.
  *
  * recall@k(method) = |approx_topk(method) ∩ exact_topk| / |exact_topk|,
  * counted over the shared bounded query sample (vec_id % 50 = 0). The
  * intersection is a pair-membership join on (query_id, neighbor_id) —
  * integer keys only, no float comparison anywhere — so the whole audit is
  * exact and fully DuckDB-oracled: each method's oracle SQL is reused
  * verbatim as a subquery, making the audit a pure composition of already-
  * verified formulations.
  *
  * Scale shape: the four top-k frames are Q·k rows each (bounded by the
  * query-sample contract); the membership join broadcasts the exact side.
  * The audit costs what the underlying searches cost — nothing new
  * shuffles at scale.
  */
object AnnRecall {

  // each method resolves through its REGISTERED entry, which rides the
  // shared LayerCache — the audit reuses the same materialized top-k
  // frames its standalone queries produce (and vice versa)
  private val Methods: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "ivf"         -> IvfAnn.queries("ann_ivf_topk"),
    "lsh"         -> Similarity.lshQueries("ann_lsh_topk"),
    "partitioned" -> Similarity.queries("ann_partitioned_topk"),
    "pq"          -> PqAnn.queries("ann_pq_topk"))

  def annRecallAudit(s: SparkSession, d: String): DataFrame = {
    val exact = Similarity.queries("ann_topk_cosine")(s, d)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    val approx = Methods.map { case (m, fn) =>
      fn(s, d).select(lit(m).as("method"), col("query_id"), col("neighbor_id"))
    }.reduce(_.unionByName(_))
    val nExact = exact.agg(count(lit(1)).as("n_exact"))
    approx
      .join(broadcast(exact), Seq("query_id", "neighbor_id"), "left")
      .groupBy("method")
      .agg(
        count(lit(1)).as("n_returned"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .crossJoin(broadcast(nExact))
      .withColumn("recall",
        col("n_hits").cast("double") / col("n_exact").cast("double"))
      .select("method", "n_returned", "n_hits", "n_exact", "recall")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_recall_audit" -> ((s, d) => annRecallAudit(s, d))
  )

  /** Each method's verified oracle SQL, reused verbatim as a subquery. */
  def oracles: Map[String, String] = {
    val exactSql = Similarity.oracles("ann_topk_cosine")
    val methodSql = Seq(
      "ivf"         -> IvfAnn.oracles("ann_ivf_topk"),
      "lsh"         -> Similarity.lshOracles("ann_lsh_topk"),
      "partitioned" -> Similarity.oracles("ann_partitioned_topk"),
      "pq"          -> PqAnn.oracles("ann_pq_topk"))
    val union = methodSql.map { case (m, sql) =>
      s"SELECT '$m' AS method, query_id, neighbor_id FROM ($sql)"
    }.mkString("\nUNION ALL\n")
    Map("ann_recall_audit" -> s"""
WITH exact AS (SELECT query_id, neighbor_id FROM ($exactSql)),
approx AS (
$union
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM exact)
SELECT a.method,
  CAST(count(*) AS BIGINT) AS n_returned,
  CAST(sum(CASE WHEN e.query_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
  n.n_exact,
  CAST(sum(CASE WHEN e.query_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(n.n_exact AS DOUBLE) AS recall
FROM approx a
LEFT JOIN exact e
  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
CROSS JOIN n
GROUP BY a.method, n.n_exact""")
  }
}
