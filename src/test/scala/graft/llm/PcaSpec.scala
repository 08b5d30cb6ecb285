package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Brute-force equivalence for the PCA family: the one-pass Gramian
  * aggregate against the naive exploded self-join, and the distributed
  * power-iteration supersteps against an exact driver-side integer replay
  * (same quantization, same max-abs fixed-point normalization, same
  * truncating division on non-negative operands).
  */
class PcaSpec extends SparkSpec {

  private val D = 64

  private def quantizedFlat = Tables.embeddings(spark, sf)
    .select(col("vec_id"), posexplode(transform(col("embedding"),
      x => round(x.cast("string").cast("decimal(27,10)") * lit(1000)).cast("long")))
      .as(Seq("i", "e")))

  test("one-pass gramian equals the naive exploded self-join") {
    val agg = SparkEntry.queries("gramian_features")(spark, sf)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val eq = quantizedFlat
    val naive = eq.as("a").join(eq.as("b"),
        expr("a.vec_id = b.vec_id AND b.i >= a.i"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum(col("a.e") * col("b.e")).as("g"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(agg.size === D * (D + 1) / 2)
    assert(agg === naive)
  }

  private lazy val replay: (Map[(Int, Int), (Long, Long)], Array[Long]) = {
    val g = Array.ofDim[Long](D, D)
    SparkEntry.queries("gramian_features")(spark, sf).collect().foreach { r =>
      val (i, j, v) = (r.getInt(0), r.getInt(1), r.getLong(2))
      g(i)(j) = v; g(j)(i) = v
    }
    var v = Array.fill(D)(1000L)
    val out = scala.collection.mutable.Map.empty[(Int, Int), (Long, Long)]
    for (t <- 1 to 6) {
      val u = Array.tabulate(D)(i => (0 until D).map(j => g(i)(j) * v(j)).sum)
      val m = u.map(math.abs).max
      v = u.map(x => if (x < 0) -((-x) * 1000L / m) else x * 1000L / m)
      for (i <- 0 until D) out((t, i)) = (u(i), v(i))
    }
    (out.toMap, v)
  }

  test("power iteration matches an exact driver-side integer replay") {
    val got = SparkEntry.queries("pca_power_component")(spark, sf)
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got === replay._1)
  }

  test("power iteration has converged in direction by the final step") {
    val e = replay._1
    val v5 = (0 until D).map(i => e((5, i))._2.toDouble)
    val v6 = (0 until D).map(i => e((6, i))._2.toDouble)
    val cos = v5.lazyZip(v6).map(_ * _).sum /
      (math.sqrt(v5.map(x => x * x).sum) * math.sqrt(v6.map(x => x * x).sum))
    assert(cos > 0.95, s"not converged: cos(v5, v6) = $cos")
  }

  test("streaming gramian fold equals the batch matrix") {
    val batch = SparkEntry.queries("gramian_features")(spark, sf)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val streamed = SparkEntry.queries("stream_exec_gramian")(spark, sf)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(streamed === batch)
  }

  test("random projection equals a driver replay and its sign matrix is balanced") {
    val eq = quantizedFlat.collect().groupBy(_.getLong(0)).map { case (id, rows) =>
      val e = new Array[Long](D); rows.foreach(r => e(r.getInt(1)) = r.getLong(2)); id -> e
    }
    def sign(i: Int, j: Int): Long =
      if (((i * 131L + j * 137L) * 1103515245L + 12345L) % 131072L >= 65536L) 1L else -1L
    val expected = (for ((id, e) <- eq.toSeq; j <- 0 until 16)
      yield ((id, j), (0 until D).map(i => e(i) * sign(i, j)).sum)).toMap
    val got = SparkEntry.queries("embed_random_projection")(spark, sf)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    assert(got === expected)
    // each output dim must mix both signs (the low-bit-parity degenerate
    // matrix this pin guards against was all-alternating)
    for (j <- 0 until 16) {
      val ones = (0 until D).count(i => sign(i, j) > 0)
      assert(ones > 8 && ones < D - 8, s"sign column $j unbalanced: $ones")
    }
  }

  test("projection equals the dot with the final component") {
    val vf = replay._2
    val expected = quantizedFlat.collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.map(r => r.getLong(2) * vf(r.getInt(1))).sum
      }
    val got = SparkEntry.queries("embed_pca_project")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === expected)
  }
}
