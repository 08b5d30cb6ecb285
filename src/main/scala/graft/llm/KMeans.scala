package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  val KCenters = 4

  /** Greedy k-center coreset selection (farthest-point traversal) over
    * the embeddings — the 2-approximation coverage core-set a curation
    * pipeline uses to pick maximally-diverse exemplars (Gonzalez 1985;
    * the seeding half of k-means++ with the argmax made deterministic).
    * Seed = the minimum vec_id; each round picks the point FARTHEST from
    * every chosen center (ties to the smaller id) and reports the
    * coverage radius at selection. Each round is one narrow map over the
    * vector table (≤ K broadcast distance folds per row), a grouped min,
    * and a 1-row TakeOrdered — the chosen center is lazily checkpointed
    * so later rounds and the output reuse one materialization instead of
    * re-running the argmax subplan (the superstep discipline). At corpus
    * scale the production variant keeps a running mind2 column updated
    * per round (one pass per center, exactly Lloyd's shape) instead of
    * re-scoring all chosen centers. */
  def kcenterCoreset(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    def sq(a: Column, b: Column): Column = aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double")) *
        (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    val c1 = e.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .localCheckpoint(false)
    def pick(centers: DataFrame): DataFrame = {
      val mind = e.crossJoin(broadcast(centers))
        .withColumn("d2", sq(col("embedding"), col("ce")))
        .groupBy("vec_id").agg(min(col("d2")).as("mind2"))
      mind.join(e, "vec_id")
        .orderBy(col("mind2").desc, col("vec_id")).limit(1)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("mind2"))
        .localCheckpoint(false)
    }
    // centers accumulate: round r scores against ALL previously chosen
    val chosen = (2 to KCenters).foldLeft(
      Seq(c1.withColumn("mind2", lit(null).cast("double")))) { (acc, _) =>
      acc :+ pick(acc.map(_.select("cid", "ce")).reduce(_.unionByName(_)))
    }
    chosen.zipWithIndex.map { case (sel, i) =>
      sel.select(lit(i + 1).as("center_rank"), col("cid").as("vec_id"), col("mind2"))
    }.reduce(_.unionByName(_))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kmeans_step" -> ((s, d) => kmeansStep(s, d)),
    "kcenter_coreset" -> ((s, d) => kcenterCoreset(s, d))
  )

  /** Squared-L2 fold, identical operand order to the zip_with fold. */
  private def sqdSql(a: String, b: String): String =
    s"list_reduce([CAST(0.0 AS DOUBLE)] || list_transform(generate_series(1, 64), i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))), (x, y) -> x + y)"

  private val kcenterSql: String = s"""
WITH c1 AS (
  SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 1
), s2 AS (
  SELECT e.vec_id, e.embedding, ${sqdSql("e.embedding", "a.embedding")} AS mind2
  FROM embeddings e CROSS JOIN c1 a
  ORDER BY mind2 DESC, e.vec_id LIMIT 1
), s3 AS (
  SELECT e.vec_id, e.embedding,
    least(${sqdSql("e.embedding", "a.embedding")},
          ${sqdSql("e.embedding", "b.embedding")}) AS mind2
  FROM embeddings e CROSS JOIN c1 a CROSS JOIN s2 b
  ORDER BY mind2 DESC, e.vec_id LIMIT 1
), s4 AS (
  SELECT e.vec_id, e.embedding,
    least(${sqdSql("e.embedding", "a.embedding")},
          ${sqdSql("e.embedding", "b.embedding")},
          ${sqdSql("e.embedding", "c.embedding")}) AS mind2
  FROM embeddings e CROSS JOIN c1 a CROSS JOIN s2 b CROSS JOIN s3 c
  ORDER BY mind2 DESC, e.vec_id LIMIT 1
)
SELECT CAST(1 AS INT) AS center_rank, vec_id, CAST(NULL AS DOUBLE) AS mind2 FROM c1
UNION ALL SELECT CAST(2 AS INT), vec_id, mind2 FROM s2
UNION ALL SELECT CAST(3 AS INT), vec_id, mind2 FROM s3
UNION ALL SELECT CAST(4 AS INT), vec_id, mind2 FROM s4"""

  def oracles: Map[String, String] = Map(
    "kcenter_coreset" -> kcenterSql,
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
