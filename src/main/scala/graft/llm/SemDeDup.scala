package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-space corpus pruning on top of the trained coarse quantizer
  * ([[IvfAnn.quantizer]]): the two cluster-then-prune techniques a
  * training-data pipeline runs before tokenization.
  *
  *  - `semdedup`: SemDeDup-style semantic deduplication — within each
  *    quantizer cell, a vector is dropped when a LOWER-vec_id cell-mate
  *    sits above the cosine threshold (the deterministic "keep the
  *    earliest representative" tie rule). Candidate pairs are generated
  *    by the cell equi-join, never all-pairs: the quantizer is what bounds
  *    the pair count, exactly as in the paper's k-means bucketing.
  *  - `proto_outliers`: prototypicality pruning — per cell, rank vectors
  *    by cosine to their own centroid and flag the least-prototypical
  *    decile (rank·10 ≤ |cell|, integer arithmetic so the flag is exact
  *    across engines). Low-prototypicality points are the likely
  *    label-noise / off-distribution examples.
  *
  * Both are fully oracle-checked: the quantizer training replays in DuckDB
  * ([[IvfAnn.quantizerSql]]), and everything above it is joins, window
  * ranks, and the shared bit-identical dot kernel.
  *
  * Scale posture: one broadcast of the K·dim quantizer, one cell-keyed
  * shuffle for the self-join (pair count bounded by Σ|cell|²), one window
  * per cell for the ranks. At 100 TB the cell count K grows so cells stay
  * bounded; nothing here ever materializes all-pairs or collects vectors
  * beyond the quantizer's training sample.
  */
object SemDeDup {

  /** SemDeDup cosine threshold: cell-mates this close are duplicates. */
  val Tau = 0.35

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.expr.VectorExpressions.dotF(a, b)

  /** (vec_id, cell, embedding, nrm) for every vector, under a quantizer
    * the CALLER trained — both pruners train once and pass the centroids
    * in (protoOutliers also needs them for the centroid dim table; an
    * internal re-train would double the driver-side Lloyd work for no
    * benefit — ADVICE r6). */
  private def assigned(
      s: SparkSession, d: String, centroids: Array[Array[Float]]): DataFrame =
    IvfAnn.assign(s, d, centroids, top = 1)
      .withColumn("nrm", sqrt(dot(col("embedding"), col("embedding"))))

  def semdedup(s: SparkSession, d: String): DataFrame = {
    val v = assigned(s, d, IvfAnn.quantizer(s, d))
    val a = v.select(col("cell"), col("vec_id").as("id_a"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = v.select(col("cell"), col("vec_id").as("id_b"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(dot(col("ea"), col("eb")) / (col("na") * col("nb")) >= Tau)
      .select(col("id_b").as("dup_id")).distinct()
    v.select(col("vec_id"), col("cell"))
      .join(dropped, col("vec_id") === col("dup_id"), "left")
      .select(col("vec_id"), col("cell").cast("int").as("cell"),
        col("dup_id").isNull.as("kept"))
  }

  def protoOutliers(s: SparkSession, d: String): DataFrame = {
    val centroids = IvfAnn.quantizer(s, d)
    val spark = s
    import spark.implicits._
    // the quantizer is driver-resident by construction (K·dim floats);
    // shipping it as a broadcast dim table is the intended pattern
    val cents = centroids.zipWithIndex
      .map { case (c, i) => (i, c, Similarity.normJvm(c)) }.toSeq
      .toDF("cell", "cemb", "cnrm")
    val v = assigned(s, d, centroids)
    val scored = v.join(broadcast(cents), Seq("cell"))
      .select(col("vec_id"), col("cell"),
        (dot(col("cemb"), col("embedding")) / (col("cnrm") * col("nrm")))
          .as("cos_to_centroid"))
    // keyed-window note (round-10 skew audit): these windows genuinely
    // need a per-cell ORDER (the rank IS the output), so they stay
    // windows; the scale contract is SemDeDup's own — K grows with the
    // corpus (clusters sized to fit an executor, the paper's operating
    // point), so a cell partition is bounded by construction, unlike a
    // content-keyed partition whose hot key is unbounded.
    val wCell = Window.partitionBy("cell")
      .orderBy(col("cos_to_centroid").asc, col("vec_id").asc)
    val wAll = Window.partitionBy("cell")
    scored
      .withColumn("cell_rank", row_number().over(wCell))
      .withColumn("n_cell", count(lit(1)).over(wAll))
      .select(col("vec_id"), col("cell").cast("int").as("cell"),
        col("cos_to_centroid"), col("cell_rank"),
        (col("cell_rank") * 10 <= col("n_cell")).as("is_outlier"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "semdedup"       -> ((s, d) => semdedup(s, d)),
    "proto_outliers" -> ((s, d) => protoOutliers(s, d))
  )

  def oracles: Map[String, String] = Map(
    "semdedup" -> s"""
WITH ${IvfAnn.quantizerSql}, cand AS (
  SELECT c.vec_id, c.cell, e.embedding, e.nrm
  FROM cells c JOIN enorm e USING (vec_id)
), dropped AS (
  SELECT DISTINCT b.vec_id
  FROM cand a JOIN cand b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE ${IvfAnn.dotSqlL("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= $Tau
)
SELECT c.vec_id, CAST(c.cell AS INT) AS cell, (d.vec_id IS NULL) AS kept
FROM cells c LEFT JOIN dropped d ON c.vec_id = d.vec_id""",

    "proto_outliers" -> s"""
WITH ${IvfAnn.quantizerSql}, best AS (
  SELECT vec_id, cell, sim FROM (
    SELECT vec_id, cell, sim,
      row_number() OVER (PARTITION BY vec_id ORDER BY ${IvfAnn.simGuardSql()} DESC, cell) AS rn
    FROM asim) WHERE rn = 1
), sized AS (
  SELECT b.vec_id, b.cell, b.sim,
    row_number() OVER (PARTITION BY b.cell ORDER BY b.sim ASC, b.vec_id ASC) AS cell_rank,
    count(*) OVER (PARTITION BY b.cell) AS n_cell
  FROM best b
)
SELECT vec_id, CAST(cell AS INT) AS cell, sim AS cos_to_centroid,
  CAST(cell_rank AS INT) AS cell_rank,
  (cell_rank * 10 <= n_cell) AS is_outlier
FROM sized"""
  )
}
