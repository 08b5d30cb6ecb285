package graft.llm

import graft.SparkSpec

/** Semantics checks for product-quantization ANN. */
class PqAnnSpec extends SparkSpec {

  test("subspace trainer is deterministic and produces KSub centroids of SubDim") {
    val sample = IvfAnn.trainSample(spark, sf)
    val a = PqAnn.trainSubspace(sample, 0)
    val b = PqAnn.trainSubspace(sample, 0)
    assert(a.length === PqAnn.KSub)
    assert(a.forall(_.length === PqAnn.SubDim))
    assert(a.zip(b).forall { case (x, y) => x.sameElements(y) })
  }

  test("pq top-k: ranks contiguous from 1, distances non-decreasing, no self-match") {
    val rows = PqAnn.pqTopK(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq === (1 to byRank.length))
      val dists = byRank.map(_.getAs[Double]("adc_dist"))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b }, s"query $q")
      assert(dists.forall(_ >= 0.0))
      assert(rs.forall(_.getAs[Long]("neighbor_id") != q))
    }
  }

  test("adc distance of a vector to itself's code is the quantization error floor") {
    // a vector's ADC distance to its own codes equals its reconstruction
    // error, which bounds below the ADC distance to any other vector's
    // codes only on average — here we just pin that reconstruction error
    // is finite and small relative to vector norms (codebook sanity).
    val sample = IvfAnn.trainSample(spark, sf)
    val cbs = (0 until PqAnn.M).map(PqAnn.trainSubspace(sample, _)).toArray
    sample.take(20).foreach { case (_, v) =>
      var err = 0.0; var norm = 0.0
      for (sub <- 0 until PqAnn.M) {
        val off = sub * PqAnn.SubDim
        val best = cbs(sub).minBy { c =>
          var dd = 0.0
          for (i <- 0 until PqAnn.SubDim) {
            val diff = v(off + i).toDouble - c(i).toDouble; dd += diff * diff
          }
          dd
        }
        for (i <- 0 until PqAnn.SubDim) {
          val diff = v(off + i).toDouble - best(i).toDouble
          err += diff * diff
          norm += v(off + i).toDouble * v(off + i).toDouble
        }
      }
      assert(err.isFinite && err <= norm * 4 + 1e-9)
    }
  }
}
