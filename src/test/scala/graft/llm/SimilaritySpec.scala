package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ANN guarantees: the LSH path must return correctly-scored, correctly-
  * ranked neighbors from within each query's bucket, and its rank-1
  * neighbors must agree with brute force whenever brute force's true
  * nearest neighbor shares the query's bucket. */
class SimilaritySpec extends SparkSpec {

  private lazy val brute = Similarity.queries("ann_topk_cosine")(spark, sf)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
  private lazy val lsh = Similarity.annLshTopK(spark, sf)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))

  test("brute force returns k ranked neighbors per query") {
    val byQuery = brute.groupBy(_._1)
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length), s"ranks for $q")
      val sims = rows.sortBy(_._3).map(_._4)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, s"monotone sims for $q")
    }
  }

  test("LSH cosines agree with brute-force cosines on shared pairs") {
    val bruteSims = brute.map(r => (r._1, r._2) -> r._4).toMap
    val shared = lsh.filter(r => bruteSims.contains((r._1, r._2)))
    assert(shared.nonEmpty)
    shared.foreach { r => assert(math.abs(bruteSims((r._1, r._2)) - r._4) < 1e-12) }
  }

  test("IVF top-k has useful recall against brute force on clustered data") {
    val ivf = IvfAnn.annIvfTopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val bruteSet = brute.map(r => (r._1, r._2)).toSet
    val ivfSet = ivf.map(r => (r._1, r._2)).toSet
    assert(ivf.nonEmpty)
    // cosines must be exact for returned pairs
    val bruteSims = brute.map(r => (r._1, r._2) -> r._4).toMap
    ivf.filter(r => bruteSims.contains((r._1, r._2))).foreach { r =>
      assert(math.abs(bruteSims((r._1, r._2)) - r._4) < 1e-9)
    }
    // embeddings are label-clustered, so nprobe=3 of 16 cells should
    // recover well over half the true top-k set
    val recall = bruteSet.count(ivfSet.contains).toDouble / bruteSet.size
    assert(recall >= 0.5, s"IVF recall@k $recall")
  }

  test("LSH top-1 matches brute-force top-1 when the true NN shares the bucket") {
    val lshTop = lsh.filter(_._3 == 1).map(r => r._1 -> r._2).toMap
    val bruteTop = brute.filter(_._3 == 1).map(r => r._1 -> r._2).toMap
    // Every LSH rank-1 must score <= the true rank-1 (it's a subset search);
    // where they disagree the LSH similarity must not exceed brute force's.
    val bruteSim1 = brute.filter(_._3 == 1).map(r => r._1 -> r._4).toMap
    val lshSim1 = lsh.filter(_._3 == 1).map(r => r._1 -> r._4).toMap
    lshSim1.foreach { case (q, s) =>
      assert(s <= bruteSim1(q) + 1e-12, s"query $q: LSH sim $s exceeds exact ${bruteSim1(q)}")
    }
    // and at least some queries should recover the exact NN
    val agree = lshTop.count { case (q, n) => bruteTop.get(q).contains(n) }
    assert(agree > 0, s"no rank-1 agreement at all (${lshTop.size} queries)")
  }

  test("ann_recall_audit bounds at sf0.01: full k sets, nonzero recall, IVF >= 0.5") {
    // the driver-gate SF, not the spec default: recall@k is meaningless on
    // the 1/10th corpus where buckets hold a handful of vectors
    val rows = AnnRecall.annRecallAudit(spark, "/root/testdata/sf0.01").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rows.keySet === Set("ivf", "lsh", "partitioned", "pq"))
    rows.foreach { case (m, (ret, hits, nExact, rec)) =>
      assert(ret === nExact, s"$m returned $ret of $nExact expected pairs")
      assert(rec === hits.toDouble / nExact, s"$m recall arithmetic")
      assert(rec > 0.0, s"$m recall is zero")
    }
    // embeddings are label-clustered; IVF probes 3 of 16 cells and must
    // recover over half the true top-k set (same bound the sf0.001 IVF
    // test pins)
    assert(rows("ivf")._4 >= 0.5, s"ivf recall ${rows("ivf")._4}")
  }

  test("near-dup block-grid fallback returns exactly the broadcast path's pairs") {
    val e = graft.Tables.embeddings(spark, sf).select(
      col("vec_id"), col("embedding"),
      sqrt(graft.expr.VectorExpressions.dotF(col("embedding"), col("embedding"))).as("nrm"))
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    val bc = Similarity.nearDupBroadcast(e).collect()
    // blockRows small enough that several blocks exist at the test SF,
    // exercising within-block AND cross-block pair coverage
    val blocked = Similarity.nearDupBlocked(e, blockRows = 128L).collect()
    assert(bc.nonEmpty)
    assert(blocked.map(key).sorted.toSeq === bc.map(key).sorted.toSeq)
    // identical arithmetic, not just identical pair sets
    val bcSims = bc.map(r => key(r) -> r.getDouble(2)).toMap
    blocked.foreach { r => assert(bcSims(key(r)) === r.getDouble(2), s"pair ${key(r)}") }
  }

  test("vector exact-collapse tier equals the uncollapsed scan on duplicated vectors") {
    // duplicate every 3rd test vector under two fresh ids — the collapse's
    // cross-group and within-group expansion paths (unreachable on the
    // driver testdata, which has no duplicate vectors) must reproduce the
    // plain broadcast scan over the full duplicated table exactly
    val base = graft.Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val dups = base.filter(col("vec_id") % 3 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val dups2 = base.filter(col("vec_id") % 6 === 0)
      .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding"))
    val emb = base.unionByName(dups).unionByName(dups2)
    val e = emb.select(col("vec_id"), col("embedding"),
      sqrt(graft.expr.VectorExpressions.dotF(col("embedding"), col("embedding"))).as("nrm"))
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    val plain = Similarity.nearDupBroadcast(e).collect()
    val collapsed = Similarity.nearDupCollapsed(emb).collect()
    assert(plain.nonEmpty)
    assert(collapsed.map(key).sorted.toSeq === plain.map(key).sorted.toSeq)
    val plainSims = plain.map(r => key(r) -> r.getDouble(2)).toMap
    collapsed.foreach { r =>
      assert(plainSims(key(r)) === r.getDouble(2), s"pair ${key(r)}")
    }
  }

  test("cosine_neardup size gate picks the broadcast path at test scale") {
    // the registered query must still produce the oracle's rows whichever
    // path the gate picks; at sf the table is far under the bound
    val rows = Similarity.queries("cosine_neardup")(spark, sf).collect()
    assert(rows.nonEmpty)
  }

  test("ann_matryoshka_recall matches a brute-force prefix replay") {
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def topk(l: Int): Map[Long, Set[Long]] = {
      def cos(a: Array[Float], b: Array[Float]): Double = {
        val ap = a.take(l); val bp = b.take(l)
        Similarity.dotJvm(ap, bp) / (Similarity.normJvm(ap) * Similarity.normJvm(bp))
      }
      vecs.filter(_._1 % 50 == 0).map { case (q, qv) =>
        q -> vecs.filter(_._1 != q)
          .map { case (c, cv) => (c, cos(qv, cv)) }
          .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
      }.toMap
    }
    val exact = topk(64)
    val nExact = exact.values.map(_.size).sum
    val got = AnnRecall.queries("ann_matryoshka_recall")(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(got.keySet === Set(8, 16, 32))
    for (l <- Seq(8, 16, 32)) {
      val approx = topk(l)
      val hits = approx.map { case (q, s) => (s intersect exact(q)).size }.sum
      val returned = approx.values.map(_.size).sum
      val (nr, nh, ne, rec) = got(l)
      assert((nr, nh, ne) === ((returned.toLong, hits.toLong, nExact.toLong)), s"L=$l")
      assert(rec === hits.toDouble / nExact.toDouble)
    }
    // the audit must show truncation actually costs recall somewhere
    assert(got(8)._4 < 1.0 && got(32)._4 <= 1.0)
  }

  test("mutual_nn_pairs equals the brute-force mutual-argmax replay") {
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val a = vecs.filter(_._1 % 50 == 0)
    val b = vecs.filter(_._1 % 50 == 25)
    def cos(x: Array[Float], y: Array[Float]): Double =
      Similarity.dotJvm(x, y) / (Similarity.normJvm(x) * Similarity.normJvm(y))
    // argmax with the query's (cosine DESC, id ASC) tie order
    def best(q: Array[Float], pool: Array[(Long, Array[Float])]): Long =
      pool.map { case (id, v) => (id, cos(q, v)) }
        .minBy { case (id, c) => (-c, id) }._1
    val expect = (for {
      (aid, av) <- a
      bid = best(av, b)
      if best(vecs.toMap.apply(bid), a) == aid
    } yield (aid, bid)).toSet
    val got = Similarity.queries("mutual_nn_pairs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expect)
    assert(a.nonEmpty && b.nonEmpty)
    // mutual pairs are a matching: no id repeats on either side
    assert(got.map(_._1).size === got.size && got.map(_._2).size === got.size)
  }
}
