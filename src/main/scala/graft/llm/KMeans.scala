package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** One fully-distributed Lloyd (k-means) iteration over the embeddings
  * table, oracle-checked end to end: deterministic seeds (the K lowest
  * vec_ids), per-vector argmin of squared L2 distance against the
  * broadcast centroid table, and exact decimal centroid recomputation via
  * [[graft.expr.VectorCentroid]].
  *
  * Scale shape: the K-row centroid table is broadcast (never shuffled);
  * assignment is a narrow map over the vector table (K distance folds per
  * row); recompute is one partial-aggregable groupBy on cluster id. This
  * is exactly the superstep [[IvfAnn]] runs on a driver-side SAMPLE to
  * train its quantizer — here it runs distributed over the full table,
  * which is how Lloyd iterations are run when the corpus, not a sample,
  * must converge (Spark MLlib KMeans lowers to the same shape).
  *
  * Float parity: the distance fold is the identical left-to-right
  * per-element double expression on both engines; argmin ties break on
  * the smaller centroid id via row_number; the centroid mean uses the
  * same DECIMAL(27,10) accumulation as `label_centroids`.
  */
object KMeans {

  val K = 8

  def kmeansStep(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val init = e.filter(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val sqDist = aggregate(
      zip_with(col("embedding"), col("ce"),
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    val assigned = e.crossJoin(broadcast(init))
      .withColumn("dist", sqDist)
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("dist"), col("cid"))))
      .filter(col("rn") === 1)
    val centroid = udaf(graft.expr.VectorCentroid,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
    assigned.groupBy("cid")
      .agg(count(lit(1)).as("n_vectors"), centroid(col("embedding")).as("centroid"))
      .select(col("cid").as("cluster"), col("n_vectors"),
        posexplode(col("centroid")).as(Seq("dim0", "x")))
      .select(col("cluster"), col("n_vectors"), (col("dim0") + 1).as("dim"), col("x"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kmeans_step" -> ((s, d) => kmeansStep(s, d))
  )

  def oracles: Map[String, String] = Map(
    "kmeans_step" -> s"""
WITH c0 AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < $K
), dists AS (
  SELECT e.vec_id, e.embedding, c.cid,
    list_reduce([CAST(0.0 AS DOUBLE)] || list_transform(generate_series(1, 64),
      i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.ce[i] AS DOUBLE)) *
           (CAST(e.embedding[i] AS DOUBLE) - CAST(c.ce[i] AS DOUBLE))),
      (x, y) -> x + y) AS dist
  FROM embeddings e, c0 c
), assigned AS (
  SELECT vec_id, embedding, cid,
    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM dists
), flat AS (
  -- float -> shortest-repr string -> decimal, as in label_centroids
  SELECT cid, i, CAST(CAST(embedding[i] AS VARCHAR) AS DECIMAL(27,10)) AS x
  FROM assigned, generate_series(1, 64) AS t(i)
  WHERE rn = 1
)
SELECT cid AS cluster, COUNT(*) AS n_vectors, CAST(i AS INT) AS dim,
  CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS x
FROM flat GROUP BY cid, i"""
  )
}
