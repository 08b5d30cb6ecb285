package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** IVF (inverted-file) approximate nearest neighbor: a spherical-k-means
  * coarse quantizer partitions vectors into cells; each query scores only
  * the vectors in its `nprobe` nearest cells.
  *
  * Training (Lloyd iterations) runs on the driver over a bounded sample —
  * the standard IVF recipe: the quantizer is tiny (K·dim floats) and at
  * 100 TB you train it on a ~1M-vector sample, broadcast it, and the
  * *assignment + search* stages stay fully distributed: assignment is a
  * narrow mapPartitions against the broadcast centroids; search shuffles
  * once on cell id. Everything is seeded/deterministic.
  */
object IvfAnn {

  val K = 16
  val NProbe = 3
  val Iterations = 4

  /** Deterministic spherical k-means over a sample: init = the K lowest
    * vec_ids; assignment by max cosine; centroid = L2-normalized mean. */
  private[llm] def trainCentroids(sample: Array[(Long, Array[Float])]): Array[Array[Float]] = {
    val dim = sample.head._2.length
    def normalize(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => if (n > 0) (x / n).toFloat else 0f)
    }
    var centroids = sample.sortBy(_._1).take(K).map(_._2)
    for (_ <- 1 to Iterations) {
      // hoist the K centroid norms out of the N-vector loop (norm(v) drops
      // out of the per-vector argmax entirely — it scales all K scores)
      val cNorms = centroids.map(Similarity.normJvm)
      val sums = Array.fill(K)(new Array[Double](dim))
      val counts = new Array[Int](K)
      sample.foreach { case (_, v) =>
        var best = 0; var bestSim = Double.MinValue
        var c = 0
        while (c < K) {
          val s = Similarity.dotJvm(centroids(c), v) / cNorms(c)
          if (s > bestSim) { bestSim = s; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      centroids = (0 until K).map { c =>
        if (counts(c) > 0) normalize(sums(c)) else centroids(c)
      }.toArray
    }
    centroids
  }

  /** (vec_id, embedding, cell) assignment via broadcast centroids. */
  private def assign(s: SparkSession, d: String, centroids: Array[Array[Float]],
      top: Int): DataFrame = {
    val spark = s
    import spark.implicits._
    val bc = s.sparkContext.broadcast(centroids)
    Tables.embeddings(s, d).select("vec_id", "embedding").as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        val csNorm = cs.map(Similarity.normJvm)
        it.flatMap { case (id, v) =>
          val vn = Similarity.normJvm(v)
          val sims = cs.indices.map(c => (c, Similarity.dotJvm(cs(c), v) / (csNorm(c) * vn)))
          sims.sortBy { case (c, sim) => (-sim, c) }.take(top)
            .map { case (c, _) => (id, v, c) }
        }
      }
      .toDF("vec_id", "embedding", "cell")
  }

  /** Approximate top-k: candidates share at least one of the query's
    * NProbe cells. */
  /** Training-sample cap: only this many vectors ever reach the driver,
    * selected by a deterministic vec_id stride — at 100 TB the stride
    * grows with the table but the collected sample stays ~4k vectors
    * (the IVF recipe: quantizer quality needs a bounded sample, not the
    * corpus). */
  val TrainSampleCap = 4096

  def annIvfTopK(s: SparkSession, d: String, k: Int = Similarity.TopK): DataFrame = {
    val n = Tables.embeddings(s, d).count()
    val stride = math.max(1L, n / TrainSampleCap)
    val sample = Tables.embeddings(s, d).select("vec_id", "embedding")
      .filter(col("vec_id") % stride === 0)
      .as[(Long, Array[Float])](org.apache.spark.sql.Encoders.product[(Long, Array[Float])])
      .collect()
    val centroids = trainCentroids(sample)
    val dot = graft.expr.VectorExpressions.dotF _
    // norms precomputed once per SIDE (|vectors| + |queries| array passes),
    // not per candidate pair — the pair scoring below is then a single
    // array traversal per pair instead of three
    val cells = assign(s, d, centroids, top = 1)
    val probes = assign(s, d, centroids, top = NProbe)
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("cell"),
        sqrt(dot(col("embedding"), col("embedding"))).as("qn"))
    val cands = cells.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"), col("cell"),
      sqrt(dot(col("embedding"), col("embedding"))).as("cn"))
    // a candidate sharing several probed cells appears once per cell:
    // dedup on the (query, neighbor) KEY PAIR after scoring — hashing two
    // longs — rather than `distinct()` over rows that still carry both
    // 64-float embeddings (array-hashing the wide rows costs more than
    // re-scoring the few multi-cell duplicates)
    val scored = probes.join(cands, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .groupBy("query_id", "neighbor_id")
      .agg(max(col("cosine")).as("cosine"))
    // bounded-heap top-k with native rank emission (graft.plans.TopKPerGroup)
    graft.plans.TopK.perKeyRanked(
        scored.select("query_id", "neighbor_id", "cosine"),
        Seq("query_id"), Seq("cosine" -> false, "neighbor_id" -> true), k,
        rankCol = "rank")
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  def noOracleQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_ivf_topk" -> ((s, d) => annIvfTopK(s, d))
  )
}
