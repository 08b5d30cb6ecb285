package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Semantics checks for Analytics-module operators that need more than the
  * hash oracle (cross-formulation equivalences). */
class AnalyticsSpec extends SparkSpec {

  test("viterbi_decode matches a driver-side DP replay") {
    val out = Analytics.queries("viterbi_decode")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.nonEmpty)
    // the same 3-state integer HMM, folded independently on the driver
    val emit = Map(
      "view" -> Array(0L, 2L, 3L), "click" -> Array(1L, 1L, 3L),
      "purchase" -> Array(4L, 0L, 5L), "error" -> Array(4L, 3L, 0L))
    val otherEmit = Array(2L, 1L, 4L)
    val trans = Array(Array(0L, 2L, 3L), Array(2L, 0L, 3L), Array(1L, 2L, 0L))
    val seqs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)), r.getString(3)))
      .groupBy(_._1)
    assert(seqs.keySet === out.keySet)
    for ((user, evs) <- seqs) {
      val ordered = evs.sortBy(_._2).map(_._3)
      var acc = Array(0L, 0L, 0L)
      for (t <- ordered) {
        val c = emit.getOrElse(t, otherEmit)
        acc = Array.tabulate(3)(st =>
          c(st) + (0 to 2).map(f => acc(f) + trans(f)(st)).min)
      }
      val best = acc.min
      assert(out(user) === ((ordered.length.toLong, best, acc.indexOf(best).toLong)),
        s"user $user: driver DP disagrees with the distributed fold")
    }
    // the replay is only meaningful if some sequence is long enough for the
    // transition costs to matter
    assert(seqs.values.map(_.size).max > 3)
  }

  test("ivm_join_delta: the three delta terms tile the full join exactly") {
    val out = Analytics.queries("ivm_join_delta")(spark, sf)
    // independent full recompute of the view, no old/delta split
    val full = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("price_q"))
      .join(Tables.customer(spark, sf)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_full"), sum(col("price_q")).as("rq_full"))
    val joined = out.join(full, Seq("c_nationkey"), "full_outer")
    assert(joined.filter(
      col("n_orders") =!= col("n_full") ||
      col("revenue_q") =!= col("rq_full") ||
      col("n_old") + col("n_delta") =!= col("n_orders")).count() === 0)
    assert(out.count() > 0)
    // both slices are genuinely non-empty at this SF — the tiling claim is
    // vacuous if either delta side contributes nothing
    assert(out.agg(sum(col("n_delta"))).head.getLong(0) > 0)
    assert(out.agg(sum(col("n_old"))).head.getLong(0) > 0)
  }

  test("km_survival matches a driver-side Kaplan-Meier replay") {
    import org.apache.spark.sql.functions._
    val rows = graft.Tables.orders(spark, sf)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("om"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val maxM = rows.map(_._2).max
    val perUser = rows.groupBy(_._1).values.toSeq.map { g =>
      val fm = g.map(_._2).min
      val lm = g.map(_._2).max
      (lm - fm, lm <= maxM - 3)
    }
    val grid = perUser.groupBy(_._1).toSeq.sortBy(_._1).map { case (l, g) =>
      (l, g.size.toLong, g.count(_._2).toLong)
    }
    val n = perUser.size.toLong
    var before = 0L
    var surv = 1.0
    val expect = grid.map { case (l, nAt, deaths) =>
      val atRisk = n - before
      before += nAt
      surv = surv * ((atRisk - deaths).toDouble / atRisk.toDouble)
      (l, nAt, atRisk, deaths, nAt - deaths, surv)
    }
    val got = Analytics.queries("km_survival")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).sortBy(_._1).toSeq
    assert(got === expect)
    // survival is monotone non-increasing and both censoring and deaths occur
    assert(got.map(_._6).zip(got.map(_._6).tail).forall { case (a, b) => b <= a })
    assert(got.map(_._4).sum > 0 && got.map(_._5).sum > 0)
  }
}
