package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics checks for the statistical-test family (Stats.scala) — each
  * distributed formulation is compared against a driver-side brute-force
  * recomputation at test scale. */
class StatsSpec extends SparkSpec {

  test("grouped_median_twopass matches per-group brute-force order statistics") {
    val out = Stats.queries("grouped_median_twopass")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val vals = graft.Tables.events(spark, sf).filter(col("value").isNotNull)
      .select(col("event_type"), round(col("value") * 1e6, 0).cast("long").as("q"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
    assert(out.keySet === vals.keySet)
    for ((g, rows) <- vals) {
      val sorted = rows.map(_._2).sorted
      val n = sorted.length.toLong
      val k = (n + 1) / 2
      assert(out(g) === ((n, k, sorted((k - 1).toInt).toDouble / 1e6)),
        s"group $g: two-pass median disagrees with the full sort")
    }
  }

  test("ks_statistic matches the brute-force two-sample KS") {
    val row = Stats.ksStatistic(spark, sf).collect().head
    val ev = graft.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select("event_type", "value").collect()
    val s1 = ev.filter(_.getString(0) == "click").map(_.getDouble(1)).sorted
    val s2 = ev.filter(_.getString(0) == "purchase").map(_.getDouble(1)).sorted
    val (n, m) = (s1.length.toLong, s2.length.toLong)
    val dNum = (s1 ++ s2).distinct.map { v =>
      val c1 = s1.count(_ <= v).toLong
      val c2 = s2.count(_ <= v).toLong
      math.abs(c1 * m - c2 * n)
    }.max
    assert(row.getAs[Long]("n") === n)
    assert(row.getAs[Long]("m") === m)
    assert(row.getAs[Long]("d_num") === dNum)
    assert(row.getAs[Double]("d") === dNum.toDouble / (n * m).toDouble)
  }

  test("mannwhitney_u matches brute-force pooled average ranks") {
    val row = Stats.mannWhitneyU(spark, sf).collect().head
    val ev = graft.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select("event_type", "value").collect()
    val s1 = ev.filter(_.getString(0) == "click").map(_.getDouble(1))
    val s2 = ev.filter(_.getString(0) == "purchase").map(_.getDouble(1))
    val pooled = (s1.map((_, 1)) ++ s2.map((_, 2))).sortBy(_._1)
    // average rank per tie group, doubled to stay integral
    val rankX2 = pooled.zipWithIndex.groupBy(_._1._1).toSeq.flatMap { case (_, g) =>
      val rx2 = g.map(_._2 + 1L).sum * 2 / g.length // 2*avg of consecutive ints
      g.map { case ((_, grp), _) => (grp, rx2) }
    }
    val r1x2 = rankX2.filter(_._1 == 1).map(_._2).sum
    val (n1, n2) = (s1.length.toLong, s2.length.toLong)
    assert(row.getAs[Long]("n1") === n1)
    assert(row.getAs[Long]("n2") === n2)
    assert(row.getAs[Long]("r1_x2") === r1x2)
    assert(row.getAs[Long]("u1_x2") === r1x2 - n1 * (n1 + 1))
    // U1 + U2 = n1*n2 identity
    assert(row.getAs[Long]("u1_x2") + row.getAs[Long]("u2_x2") === 2 * n1 * n2)
    // z must be finite and modest for same-ish distributions
    assert(!row.getAs[Double]("z").isNaN)
  }

  test("welch_ttest matches the brute-force t statistic") {
    val row = Stats.welchTTest(spark, sf).collect().head
    val vs = graft.Tables.lineitem(spark, sf)
      .filter(col("l_returnflag").isin("R", "A"))
      .select(col("l_returnflag"), floor(col("l_extendedprice")).cast("long"))
      .collect()
    def stats(flag: String): (Long, Double, Double) = {
      val xs = vs.filter(_.getString(0) == flag).map(_.getLong(1))
      val n = xs.length.toLong
      val mean = xs.sum.toDouble / n.toDouble
      val s2 = xs.map(x => (x - mean) * (x - mean)).sum / (n - 1).toDouble
      (n, mean, s2)
    }
    val (n1, m1, v1) = stats("R")
    val (n2, m2, v2) = stats("A")
    val t = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
    assert(row.getAs[Long]("n1") === n1)
    assert(row.getAs[Long]("n2") === n2)
    assert(math.abs(row.getAs[Double]("mean1") - m1) < 1e-6)
    assert(math.abs(row.getAs[Double]("t") - t) < 1e-6)
    val df = row.getAs[Double]("df")
    assert(df > math.min(n1, n2) / 2.0 && df < (n1 + n2).toDouble)
  }

  test("spearman_rho matches brute-force rank correlation") {
    val row = Stats.spearmanRho(spark, sf).collect().head
    val per = graft.Tables.orders(spark, sf)
      .select(col("o_custkey"), floor(col("o_totalprice") * 100).cast("long"))
      .collect()
      .groupBy(_.getLong(0)).toSeq
      .map { case (ck, rs) => (ck, rs.length.toLong, rs.map(_.getLong(1)).sum) }
    val rankRev = per.sortBy { case (ck, _, cents) => (-cents, ck) }
      .zipWithIndex.map { case ((ck, _, _), i) => ck -> (i + 1L) }.toMap
    val rankCnt = per.sortBy { case (ck, n, _) => (-n, ck) }
      .zipWithIndex.map { case ((ck, _, _), i) => ck -> (i + 1L) }.toMap
    val n = per.length.toLong
    val sumD2 = per.map { case (ck, _, _) =>
      val dd = rankRev(ck) - rankCnt(ck); dd * dd
    }.sum
    assert(row.getAs[Long]("n") === n)
    assert(row.getAs[Long]("sum_d2") === sumD2)
    val rho = 1.0 - 6.0 * sumD2.toDouble / (n * (n * n - 1)).toDouble
    assert(row.getAs[Double]("rho") === rho)
    assert(rho >= -1.0 && rho <= 1.0)
  }

  test("theil_sen_trend matches the brute-force median of pairwise slopes") {
    val row = Stats.theilSenTrend(spark, sf).collect().head
    val weekly = graft.Tables.orders(spark, sf)
      .select(
        expr("datediff(cast(date_trunc('week', o_orderdate) as date), date'1991-12-30') div 7")
          .cast("long"),
        floor(col("o_totalprice") * 100).cast("long"))
      .collect()
      .groupBy(_.getLong(0)).toSeq
      .map { case (x, rs) => (x, rs.map(_.getLong(1)).sum) }
      .sortBy(_._1)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val slopes = for {
      i <- weekly.indices; j <- (i + 1) until weekly.length
    } yield (weekly(j)._2 - weekly(i)._2).toDouble / (weekly(j)._1 - weekly(i)._1).toDouble
    assert(row.getAs[Long]("n_weeks") === weekly.length.toLong)
    assert(row.getAs[Long]("n_pairs") === slopes.length.toLong)
    val slope = row.getAs[Double]("slope_med")
    assert(math.abs(slope - median(slopes)) <= 1e-9 * math.abs(median(slopes)))
    val resid = weekly.map { case (x, y) => y.toDouble - slope * x.toDouble }
    val icept = row.getAs[Double]("intercept_med")
    assert(math.abs(icept - median(resid)) <= 1e-9 * math.abs(median(resid)))
  }

  test("acf_lags matches brute force and stays within [-1, 1]") {
    val out = Stats.acfLags(spark, sf).collect().map(r =>
      r.getAs[Int]("lag") -> r.getAs[Double]("r")).toMap
    val series = graft.Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
      .orderBy("h").collect().map(_.getAs[Long]("x").toDouble)
    val n = series.length
    val mean = series.sum / n
    val den = series.map(x => (x - mean) * (x - mean)).sum
    for (k <- 1 to 6) {
      val num = (0 until n - k).map(t => (series(t) - mean) * (series(t + k) - mean)).sum
      assert(math.abs(out(k) - num / den) < 1e-9, s"lag $k")
      assert(out(k) >= -1.0 && out(k) <= 1.0)
    }
  }

  test("trimmed_stats matches a driver-side sort-trim-winsorize replay") {
    val rows = Stats.queries("trimmed_stats")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val cents = graft.Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100, 0).cast("long").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).sorted }
    assert(rows.keySet === cents.keySet)
    for ((g, qs) <- cents) {
      val n = qs.length
      val r0 = n / 10
      val (kLo, kHi) = (r0 + 1, n - r0)
      val vLo = qs(kLo - 1)
      val vHi = qs(kHi - 1)
      val trimmed = qs.slice(kLo - 1, kHi)
      val winsor = qs.map(q => math.min(math.max(q, vLo), vHi))
      val row = rows(g)
      assert(row.getAs[Long]("n") === n.toLong)
      assert(row.getAs[Long]("k_lo") === kLo.toLong && row.getAs[Long]("k_hi") === kHi.toLong)
      assert(row.getAs[Double]("p10") === vLo.toDouble / 100.0)
      assert(row.getAs[Double]("p90") === vHi.toDouble / 100.0)
      assert(row.getAs[Double]("trimmed_mean")
        === trimmed.sum.toDouble / trimmed.length.toDouble / 100.0)
      assert(row.getAs[Double]("winsorized_mean")
        === winsor.sum.toDouble / n.toDouble / 100.0)
      // the trim must actually bite and robustify: extremes clamp inward
      assert(r0 >= 1 && vLo < vHi)
      assert(row.getAs[Double]("trimmed_mean") > vLo / 100.0)
      assert(row.getAs[Double]("trimmed_mean") < vHi / 100.0)
    }
  }

  test("grouped_quantiles_exact matches a driver-side sort per group") {
    val rows = Stats.queries("grouped_quantiles_exact")(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val byG = graft.Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"), round(col("value") * 1e6, 0).cast("long").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).sorted }
    assert(rows.keySet === byG.keySet.flatMap(g => Seq((g, 50), (g, 90), (g, 99))))
    for ((g, qs) <- byG; pct <- Seq(50, 90, 99)) {
      val n = qs.length
      val k = (n.toLong * pct + 99) / 100 // nearest-rank ceil
      val (nn, kk, v) = rows((g, pct))
      assert(nn === n.toLong && kk === k, s"$g p$pct")
      assert(v === qs((k - 1).toInt).toDouble / 1e6, s"$g p$pct value")
    }
    // the three ranks are genuinely distinct (vacuity guard)
    assert(byG.forall { case (g, _) =>
      Seq(50, 90, 99).map(p => rows((g, p))._2).distinct.size == 3 })
  }

  test("quantile_normalize matches the driver-side rank mapping") {
    val rows = Stats.queries("quantile_normalize")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    def side(t: String) = graft.Tables.events(spark, sf)
      .filter(col("value").isNotNull && col("event_type") === t)
      .select(col("event_id"), round(col("value") * 1e6, 0).cast("long").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val src = side("purchase").sortBy { case (id, q) => (q, id) }
    val ref = side("click").sortBy { case (id, q) => (q, id) }.map(_._2)
    val (n, m) = (src.length.toLong, ref.length.toLong)
    assert(rows.size === src.length && n > 0 && m > 0)
    for (((id, q), i) <- src.zipWithIndex) {
      val r = i + 1L
      val idx = (r * m + n - 1) / n
      val (qq, rr, ii, qref) = rows(id)
      assert(qq === q && rr === r && ii === idx, s"event $id")
      assert(qref === ref((idx - 1).toInt), s"event $id mapped value")
    }
    // the mapping is monotone in rank and lands inside the reference range
    val byRank = rows.values.toSeq.sortBy(_._2).map(_._4)
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
    assert(byRank.head >= ref.min && byRank.last === ref.max)
  }

  test("cuped_adjustment matches a driver-side moments replay") {
    val rows = graft.Tables.events(spark, sf).filter(col("value").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lo = rows.map(_._2).min; val hi = rows.map(_._2).max
    val cutoff = lo + (hi - lo) / 2
    val perUser = rows.groupBy(_._1).toSeq.map { case (u, g) =>
      (u % 2, g.filter(_._2 < cutoff).map(_._3).sum,
        g.filter(_._2 >= cutoff).map(_._3).sum)
    }
    case class M(n: Long, sx: Long, sy: Long, sxx: Double, syy: Double, sxy: Double)
    val ms = perUser.groupBy(_._1).map { case (v, g) =>
      v -> M(g.size.toLong, g.map(_._2).sum, g.map(_._3).sum,
        g.map(e => (e._2 * e._2).toDouble).sum,
        g.map(e => (e._3 * e._3).toDouble).sum,
        g.map(e => (e._2 * e._3).toDouble).sum)
    }
    val gn = ms.values.map(_.n).sum; val gsx = ms.values.map(_.sx).sum
    val gsy = ms.values.map(_.sy).sum
    val gsxx = ms.values.map(_.sxx).sum; val gsxy = ms.values.map(_.sxy).sum
    val num = gn.toDouble * gsxy - gsx.toDouble * gsy.toDouble
    val den = gn.toDouble * gsxx - gsx.toDouble * gsx.toDouble
    val theta = if (den == 0.0) 0.0 else num / den
    val meanXg = gsx.toDouble / gn.toDouble
    val got = Stats.queries("cuped_adjustment")(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet === ms.keySet)
    for ((v, m) <- ms) {
      val r = got(v); val nn = m.n.toDouble
      assert(r.getLong(1) === m.n)
      assert(math.abs(r.getDouble(2) - theta) < 1e-12 * math.max(1.0, math.abs(theta)))
      assert(r.getDouble(3) === m.sy.toDouble / nn)
      val meanAdj = (m.sy.toDouble - theta * (m.sx.toDouble - nn * meanXg)) / nn
      assert(math.abs(r.getDouble(4) - meanAdj) < 1e-9 * math.max(1.0, math.abs(meanAdj)))
      val varPost = m.syy / nn - (m.sy.toDouble / nn) * (m.sy.toDouble / nn)
      val covV = m.sxy / nn - (m.sx.toDouble / nn) * (m.sy.toDouble / nn)
      val varX = m.sxx / nn - (m.sx.toDouble / nn) * (m.sx.toDouble / nn)
      val varAdj = varPost - (2.0 * theta) * covV + (theta * theta) * varX
      assert(math.abs(r.getDouble(5) - varPost) < 1e-6 * varPost)
      assert(math.abs(r.getDouble(6) - varAdj) < 1e-6 * math.max(1.0, varAdj))
      // reduction bounded (pooled θ on a per-variant readout can dip
      // slightly negative when pre/post spend are weakly correlated)
      assert(r.getDouble(7) > -0.5 && r.getDouble(7) < 1.0)
      assert(varAdj >= 0.0)
    }
  }

  test("kendall_tau matches a driver-side O(n^2) concordance count") {
    val monthly = graft.Tables.lineitem(spark, sf)
      .select(date_trunc("month", col("l_shipdate")).cast("long").as("mo"),
        col("l_extendedprice"), col("l_quantity"))
      .collect()
      .map(r => (r.getLong(0),
        math.floor(r.getDouble(1) * 100).toLong, math.floor(r.getDouble(2)).toLong))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, g) => (g.map(_._2).sum, g.map(_._3).sum) }
    var (c, dd, tx, ty) = (0L, 0L, 0L, 0L)
    for (i <- monthly.indices; j <- (i + 1) until monthly.length) {
      val ((x1, y1), (x2, y2)) = (monthly(i), monthly(j))
      if (x1 == x2) tx += 1
      if (y1 == y2) ty += 1
      if ((x1 < x2 && y1 < y2) || (x1 > x2 && y1 > y2)) c += 1
      else if ((x1 < x2 && y1 > y2) || (x1 > x2 && y1 < y2)) dd += 1
    }
    val n = monthly.length.toLong
    val n0 = n * (n - 1) / 2
    val row = Stats.queries("kendall_tau")(spark, sf).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4)) === ((n, c, dd, tx, ty)))
    assert(row.getDouble(5) ===
      (c - dd).toDouble / math.sqrt(((n0 - tx) * (n0 - ty)).toDouble))
    // the correlation must be informative, not a degenerate endpoint
    assert(n >= 10 && c > 0 && dd > 0)
  }
}
