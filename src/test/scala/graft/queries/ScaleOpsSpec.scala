package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics checks for the scale-posture operators (ScaleOps.scala). */
class ScaleOpsSpec extends SparkSpec {

  test("q3: revenue is the exact cents×100 sum and rows rank by it") {
    val rows = ScaleOps.q3ShippingPriority(spark, sf).orderBy("rnk").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    // ranks are 1..n and revenue is non-increasing
    assert(rows.map(_.getAs[Int]("rnk")).toSeq === (1 to rows.length))
    val revs = rows.map(_.getAs[Long]("revenue_c4"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    // spot-check the top order's revenue against a direct recomputation
    val top = rows.head
    val expect = graft.Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") === top.getAs[Long]("l_orderkey") &&
        col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
      .select(sum(floor(col("l_extendedprice") * 100).cast("long") *
        (lit(100L) - floor(col("l_discount") * 100).cast("long"))))
      .collect().head.getLong(0)
    assert(top.getAs[Long]("revenue_c4") === expect)
  }

  test("compaction_bins: bins are the start-offset packing of the manifest") {
    val rows = ScaleOps.compactionBins(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("file_id"),
        r.getAs[Long]("bytes"), r.getAs[Long]("bin")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, fs) =>
      val sorted = fs.sortBy(_._2)
      var cum = 0L
      sorted.foreach { case (_, _, bytes, bin) =>
        assert(bin === cum / 65536L)
        cum += bytes
      }
      // bins are monotone non-decreasing in file order
      val bins = sorted.map(_._4)
      assert(bins.zip(bins.tail).forall { case (a, b) => a <= b })
    }
  }

  test("association_rules: confidence and lift recompute from their counts") {
    val rows = ScaleOps.queries("association_rules")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7), r.getDouble(8)))
    assert(rows.nonEmpty && rows.length <= 50)
    for ((rnk, _, _, nPair, nAnt, nCons, nTot, conf, lift) <- rows) {
      assert(rnk >= 1 && nPair >= 3L && nPair <= math.min(nAnt, nCons))
      assert(conf === nPair.toDouble / nAnt.toDouble && conf > 0.0 && conf <= 1.0)
      assert(lift === (nPair * nTot).toDouble / (nAnt * nCons).toDouble)
    }
    // ranking follows the exact integer quantization of confidence
    val cq = rows.sortBy(_._1).map(r => r._4 * 1000000L / r._5)
    assert(cq === cq.sorted.reverse)
  }

  test("copurchase_pairs matches brute-force per-order pair counting") {
    val fast = ScaleOps.copurchasePairs(spark, sf).collect()
      .map(r => (r.getAs[Long]("p1"), r.getAs[Long]("p2")) -> r.getAs[Long]("n_orders")).toMap
    val op = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val counts = op.groupBy(_._1).values.flatMap { lines =>
      val ps = lines.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val top = counts.toSeq.sortBy { case ((p1, p2), n) => (-n, p1, p2) }.take(20)
    assert(fast === top.toMap)
  }

  test("salted_skew_join equals the plain unsalted join+aggregate") {
    val salted = ScaleOps.saltedSkewJoin(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val plain = graft.Tables.events(spark, sf)
      .select(col("user_id").as("c_custkey"), floor(col("value") * 100).cast("long").as("cents"))
      .join(graft.Tables.customer(spark, sf).select("c_custkey", "c_mktsegment"), Seq("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted === plain)
  }

  test("rendezvous_shards matches brute-force HRW; movement is minimal and one-way") {
    val rows = ScaleOps.queries("rendezvous_shards")(spark, sf).collect()
    val M31 = 2147483648L
    def h(doc: Long, shard: Long): Long = {
      val h0 = (doc * 1103515245L + shard * 2654435761L + 12345L) % M31
      val h2 = ((h0 ^ (h0 / 65536)) * 69069L + 1L) % M31
      h2 ^ (h2 / 2048)
    }
    val docs = graft.Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0))
    // brute-force argmax (ties broken to the higher shard, matching the
    // lexicographic struct max)
    def assign(doc: Long, n: Int): Long =
      (0L until n.toLong).map(sh => (h(doc, sh), sh)).max._2
    val expect = docs.map(doc => (doc, assign(doc, 8), assign(doc, 9)))
    val byShard = expect.groupBy(_._2)
    rows.foreach { r =>
      val s8 = r.getAs[Long]("shard8")
      val mine = byShard(s8)
      assert(r.getAs[Long]("n_docs") === mine.length.toLong)
      assert(r.getAs[Long]("n_moved") === mine.count(t => t._3 != t._2).toLong)
      assert(r.getAs[Boolean]("moves_only_to_new"))
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.length.toLong)
    // HRW minimal movement: overall rate near 1/9, never wildly above
    val moved = rows.map(_.getAs[Long]("n_moved")).sum.toDouble / docs.length
    assert(moved > 0.0 && moved < 0.25, s"moved rate $moved")
  }

  test("join_cardinality_est: exact count equals the materialized join; " +
      "key-sampled estimate within 3x") {
    val r = ScaleOps.queries("join_cardinality_est")(spark, sf).collect().head
    val exact = graft.Tables.events(spark, sf).select(col("user_id"))
      .join(graft.Tables.orders(spark, sf)
        .select(col("o_custkey").as("user_id")), "user_id")
      .count()
    assert(r.getAs[Long]("exact_pairs") === exact)
    assert(r.getAs[Long]("n_join_keys") > 0L)
    // a 1/16 key sample of a ~150-key domain is noisy but must stay in the
    // right order of magnitude (unbiasedness is the estimator's contract;
    // this pins against sign/scale bugs, not variance)
    val est = r.getAs[Long]("est_pairs")
    assert(est > 0L && est < exact * 3 && est > exact / 3,
      s"estimate $est vs exact $exact")
    assert(r.getAs[Double]("rel_err") === (est - exact).toDouble / exact.toDouble)
  }
}
