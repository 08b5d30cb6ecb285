package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.llm.Text

/** Semantics checks for the diagnostics/graph/interval operators beyond
  * the DuckDB hash-compare: the sketch superset guarantee, equivalence of
  * the blocked similarity join to the naive all-pairs formulation, BFS
  * against an independently computed transitive expansion, and the interval
  * algebra invariants. */
class DiagnosticsSpec extends SparkSpec {

  test("l_diversity_audit matches a driver recount and is monotone in l") {
    val rows = Diagnostics.queries("l_diversity_audit")(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    assert(rows.keySet === Set(2, 3, 5))
    // independent group recount on the driver
    val groups = graft.Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long").as("c_nationkey"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("b"), col("c_mktsegment"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getString(2)))
      .groupBy(_._1).toSeq.map { case (_, g) => (g.size.toLong, g.map(_._2).distinct.size) }
    for ((l, (gb, rb, ng, nr, minL, risk)) <- rows) {
      assert(gb === groups.count(_._2 < l).toLong)
      assert(rb === groups.filter(_._2 < l).map(_._1).sum)
      assert(ng === groups.size.toLong && nr === groups.map(_._1).sum)
      assert(minL === groups.map(_._2).min.toLong)
      assert(risk === rb.toDouble / nr.toDouble)
    }
    // monotone: raising l can only add exposed groups
    assert(rows(2)._1 <= rows(3)._1 && rows(3)._1 <= rows(5)._1)
  }

  test("fk_integrity_audit matches driver-side orphan recounts on every edge") {
    val out = Diagnostics.queries("fk_integrity_audit")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    def keys(df: org.apache.spark.sql.DataFrame, c: String): Set[Long] =
      df.select(col(c).cast("long")).collect().map(_.getLong(0)).toSet
    val orderKeys = keys(graft.Tables.orders(spark, sf), "o_orderkey")
    val partKeys = keys(graft.Tables.part(spark, sf), "p_partkey")
    val suppKeys = keys(graft.Tables.supplier(spark, sf), "s_suppkey")
    val custKeys = keys(graft.Tables.customer(spark, sf), "c_custkey")
    val natKeys = keys(graft.Tables.nation(spark, sf), "n_nationkey")
    val li = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def check(rel: String, n: Long, orphans: Long): Unit = {
      assert(out(rel) === ((n, 0L, orphans, orphans == 0L)), rel)
    }
    check("lineitem->orders", li.length.toLong,
      li.count(t => !orderKeys(t._1)).toLong)
    check("lineitem->part", li.length.toLong,
      li.count(t => !partKeys(t._2)).toLong)
    check("lineitem->supplier", li.length.toLong,
      li.count(t => !suppKeys(t._3)).toLong)
    val oc = graft.Tables.orders(spark, sf).select("o_custkey").collect().map(_.getLong(0))
    check("orders->customer", oc.length.toLong, oc.count(k => !custKeys(k)).toLong)
    val cn = graft.Tables.customer(spark, sf).select(col("c_nationkey").cast("long"))
      .collect().map(_.getLong(0))
    check("customer->nation", cn.length.toLong, cn.count(k => !natKeys(k)).toLong)
    assert(out.keySet.size === 7 && out.keySet.contains("nation->region"))
  }

  test("benford_digits: fractions sum to 1 and digits are 1..9") {
    val rows: Seq[Row] =
      Diagnostics.queries("benford_digits")(spark, sf).collect().toSeq
    val digits = rows.map(_.getInt(0))
    assert(digits.toSet.subsetOf((1 to 9).toSet))
    val fracSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(fracSum - 1.0) < 1e-9)
  }

  test("heavy_hitters_tokens equals the exact full GROUP BY + threshold") {
    val hh = Diagnostics.queries("heavy_hitters_tokens")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val toks = Tables.documents(spark, sf)
      .select(explode(Text.tokens(col("text"))).as("tok"))
    val n = toks.count()
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 50 > n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(hh == exact)
    assert(hh.nonEmpty, "degenerate: no heavy hitters at this SF")
  }

  test("rolling_median_value: first row per user is its own median; frame <= 5") {
    val df = Diagnostics.queries("rolling_median_value")(spark, sf)
    val ev = Tables.events(spark, sf).filter(col("value").isNotNull)
    val firstPerUser = ev
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
      .filter(col("rn") === 1).select("event_id", "value")
    val joined = df.join(firstPerUser.withColumnRenamed("value", "v0"), "event_id")
    assert(joined.filter(col("roll_median") =!= col("v0")).count() == 0)
  }

  test("editdist_simjoin equals the naive all-pairs formulation") {
    val blocked = Diagnostics.queries("editdist_simjoin")(spark, sf)
      .select("name_a", "name_b", "pair_count")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val p = Tables.part(spark, sf)
      .select(concat(col("p_name"), lit("#"), col("p_size").cast("string")).as("key"))
      .groupBy("key").agg(count(lit(1)).as("n"))
      .select(col("key").as("name"), col("n"),
        split(col("key"), " ").getItem(0).as("tok1"))
    val naive = p.as("a").crossJoin(p.as("b"))
      .filter(col("a.tok1") === col("b.tok1") && col("a.name") < col("b.name") &&
        abs(length(col("a.name")) - length(col("b.name"))) <= 2 &&
        levenshtein(col("a.name"), col("b.name")) <= 2)
      .select(col("a.name"), col("b.name"), (col("a.n") * col("b.n")).as("pc"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(blocked == naive)
    assert(blocked.nonEmpty)
  }

  test("bfs_hops: hop labels are consistent with one-step edge expansion") {
    val hops = Graph.queries("bfs_hops")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(hops(1L) == 0)
    // every node at hop h>0 must have a neighbor at hop h-1
    val nSupp = Tables.supplier(spark, sf).count()
    val raw = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 10 === 0)
      .select(col("l_suppkey").as("x"), (col("l_partkey") % nSupp).as("y"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj: Map[Long, Array[Long]] = (raw ++ raw.map(_.swap)).groupMap(_._1)(_._2)
      .view.mapValues(_.toArray).toMap
    hops.filter(_._2 > 0).foreach { case (node, h) =>
      assert(adj.getOrElse(node, Array.empty[Long]).exists(nb => hops.get(nb).contains(h - 1)),
        s"node $node at hop $h has no hop-${h - 1} neighbor")
    }
  }

  test("link_prediction equals the brute-force capped-kNN common-neighbors ranking") {
    val rows = Graph.queries("link_prediction")(spark, sf).collect()
    val op = Tables.lineitem(spark, sf).filter(col("l_orderkey") % 10 === 0)
      .select("l_orderkey", "l_partkey")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = op.groupMap(_._1)(_._2)
    val pairCount = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byOrder.values.foreach { ps =>
      val s = ps.sorted
      for (i <- s.indices; j <- (i + 1) until s.length)
        pairCount((s(i), s(j))) = pairCount.getOrElse((s(i), s(j)), 0L) + 1L
    }
    val sym = pairCount.toSeq.flatMap { case ((a, b), n) => Seq((a, b, n), (b, a, n)) }
    // MUTUAL cap (the round-15 skew fix): out-cap to each node's 10
    // strongest, then in-cap each neighbor's list to its 10 strongest
    // members — same orders as the query's two TopK.perKey passes
    val adjOut = sym.groupBy(_._1).toSeq.flatMap { case (node, es) =>
      es.sortBy(e => (-e._3, e._2)).take(10).map(e => (node, e._2, e._3))
    }
    val adjPairs = adjOut.groupBy(_._2).toSeq.flatMap { case (nbr, es) =>
      es.sortBy(e => (-e._3, e._1)).take(10).map(e => (e._1, nbr))
    }
    val adj: Map[Long, Seq[Long]] = adjPairs.groupMap(_._1)(_._2)
      .view.mapValues(_.toSeq).toMap
    val adjSet = adjPairs.toSet
    val wedges = scala.collection.mutable.Map.empty[(Long, Long), Long]
    val byNbr = adjSet.toSeq.groupMap(_._2)(_._1)
    byNbr.values.foreach { us =>
      val s = us.sorted
      for (i <- s.indices; j <- (i + 1) until s.length)
        wedges((s(i), s(j))) = wedges.getOrElse((s(i), s(j)), 0L) + 1L
    }
    val scored = wedges.toSeq
      .filter { case ((u, w), _) => !adjSet.contains((u, w)) }
      .map { case ((u, w), cn) =>
        val du = adj(u).length.toLong; val dw = adj(w).length.toLong
        (u, w, cn, du, dw, cn.toDouble / (du + dw - cn).toDouble)
      }
      .sortBy { case (u, w, cn, _, _, j) => (-j, -cn, u, w) }
      .take(20)
    assert(rows.length === scored.length)
    rows.sortBy(_.getAs[Int]("rnk")).zip(scored).foreach { case (r, (u, w, cn, du, dw, j)) =>
      assert(r.getAs[Long]("u") === u && r.getAs[Long]("w") === w, r.toString)
      assert(r.getAs[Long]("cn") === cn)
      assert(r.getAs[Long]("deg_u") === du && r.getAs[Long]("deg_w") === dw)
      assert(r.getAs[Double]("jaccard") === j)
    }
  }

  test("dq_row_issues: planted violations each emit exactly their issue rows") {
    val s0 = spark; import s0.implicits._
    // one row per rule branch, one clean row, one row tripping all four
    val raw = Seq(
      (1L, null.asInstanceOf[String], "2024-01-01 00:00:00", 20.0, "office_in"),
      (2L, "  ", "2024-01-01 00:00:00", 20.0, "office_in"),
      (3L, "DEV_0001", null.asInstanceOf[String], 20.0, "office_in"),
      (4L, "DEV_0002", "2024-01-01 00:00:00", 109.994, "office_in"),
      (5L, "DEV_0003", "2024-01-01 00:00:00", -55.125, "office_in"),
      (6L, "DEV_0004", "2024-01-01 00:00:00", 20.0, null.asInstanceOf[String]),
      (7L, "DEV_0005", "2024-01-01 00:00:00", 20.0, "office_in"),
      (8L, null.asInstanceOf[String], null.asInstanceOf[String], 150.0,
        null.asInstanceOf[String]))
      .toDF("record_id", "device_id", "ts_s", "temperature_raw", "location_raw")
      .withColumn("reading_timestamp", col("ts_s").cast("timestamp"))
      .drop("ts_s")
    val out = Diagnostics.rowIssues(raw).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(4), r.getString(5)))
      .toSet
    val expected = Set(
      (1L, "missing_device_id", null, "CRITICAL"),
      (2L, "missing_device_id", "  ", "CRITICAL"),
      (3L, "missing_timestamp", null, "HIGH"),
      // DECIMAL(6,2) is HALF_UP from double: 109.994 -> 109.99, -55.125 -> -55.13
      (4L, "temperature_out_of_range", "109.99", "HIGH"),
      (5L, "temperature_out_of_range", "-55.13", "HIGH"),
      (6L, "missing_location", null, "LOW"),
      (8L, "missing_device_id", null, "CRITICAL"),
      (8L, "missing_timestamp", null, "HIGH"),
      (8L, "temperature_out_of_range", "150.00", "HIGH"),
      (8L, "missing_location", null, "LOW"))
    assert(out === expected)
    // the clean record emits nothing; the all-bad record emits one row per rule
    assert(!out.exists(_._1 == 7L))
    assert(out.count(_._1 == 8L) === 4)
  }

  test("max_concurrency >= 1 and <= n_intervals for every user") {
    val bad = Temporal.queries("max_concurrency")(spark, sf)
      .filter(col("max_concurrent") < 1 || col("max_concurrent") > col("n_intervals"))
    assert(bad.count() == 0)
  }

  test("interval_coverage: per user, 30min <= covered <= n_intervals * 30min") {
    val iv = 1800000000L
    val perUser = Tables.events(spark, sf).groupBy("user_id")
      .agg(count(lit(1)).as("n_iv"))
    val joined = Temporal.queries("interval_coverage")(spark, sf)
      .join(perUser, "user_id")
    assert(joined.filter(
      col("covered_us") < iv || col("covered_us") > col("n_iv") * iv).count() == 0)
  }

  test("ooo_audit: ooo count bounded by events, skew non-negative only when late events exist") {
    val out = Diagnostics.queries("ooo_audit")(spark, sf).cache()
    try {
      assert(out.filter(col("n_ooo") > col("n_events")).count() === 0)
      assert(out.filter(col("n_ooo") === 0 && col("max_skew_secs").isNotNull).count() === 0)
      assert(out.filter(col("max_skew_secs") <= 0).count() === 0)
    } finally out.unpersist() // leaked caches hijack later suites' plan pins
  }

  test("backfill_gaps: every reported date is truly absent from the sparse feed") {
    val feedDates = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase" && col("user_id") % 50 === 0)
      .select(to_date(col("ts")).as("d")).distinct()
      .collect().map(_.getDate(0).toString).toSet
    val missing = Diagnostics.queries("backfill_gaps")(spark, sf)
      .collect().map(_.getDate(0).toString)
    assert(missing.forall(d => !feedDates.contains(d)))
  }

  test("key_skew_report: 5 heaviest keys, ratio consistent with counts") {
    val rows = Diagnostics.queries("key_skew_report")(spark, sf).collect()
    assert(rows.length === 5)
    val ns = rows.map(_.getAs[Long]("n_rows"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val expect = r.getAs[Long]("n_rows").toDouble / r.getAs[Double]("avg_rows")
      assert(math.abs(r.getAs[Double]("skew_ratio") - expect) < 1e-12)
    }
  }

  test("gdpr_cascade: per-table counts balance and cover all three keyed tables") {
    val rows = Diagnostics.queries("gdpr_cascade")(spark, sf).collect()
    assert(rows.map(_.getAs[String]("table_name")).toSet ===
      Set("events", "orders", "customer"))
    rows.foreach { r =>
      assert(r.getAs[Long]("rows_after") + r.getAs[Long]("rows_deleted") ===
        r.getAs[Long]("rows_before"), r.toString)
      assert(r.getAs[Long]("rows_deleted") >= 0)
    }
  }

  test("incremental_retract: merge-consistency flag holds everywhere") {
    val out = Diagnostics.queries("incremental_retract")(spark, sf).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter(!col("merge_consistent")).count() === 0)
      // net_count really is purchases - errors per user
      val check = Tables.events(spark, sf)
        .filter(col("event_type").isin("purchase", "error"))
        .groupBy("user_id")
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(-1L)).as("expect"))
      assert(out.join(check, "user_id")
        .filter(col("net_count") =!= col("expect")).count() === 0)
    } finally out.unpersist() // leaked caches hijack later suites' plan pins
  }

  test("t_closeness_audit matches a driver EMD recount and is bounded") {
    val rows = Diagnostics.queries("t_closeness_audit")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    // independent recount: per-(nation, band) histogram on the driver
    val raw = Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long"),
        floor(col("c_acctbal") / 1000.0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bands = raw.map(_._2).distinct.sorted
    val m = bands.length.toLong
    val nAll = raw.length.toLong
    val globalCum = bands.map(b => b -> raw.count(_._2 <= b).toLong).toMap
    val byNation = raw.groupBy(_._1)
    assert(rows.keySet === byNation.keySet)
    for ((g, grp) <- byNation) {
      val nG = grp.length.toLong
      val emdNum = bands.map { b =>
        val cumG = grp.count(_._2 <= b).toLong
        math.abs(cumG * nAll - globalCum(b) * nG)
      }.sum
      val (nRows, num, den, emd) = rows(g)
      assert(nRows === nG && num === emdNum)
      assert(den === nG * nAll * (m - 1))
      assert(emd === emdNum.toDouble / den.toDouble)
      // EMD over an m-point ordered domain is bounded by 1
      assert(emd >= 0.0 && emd <= 1.0)
    }
    // the audit is vacuous if every group matches the global distribution
    assert(rows.values.exists(_._4 > 0.0))
  }

  test("key_skew_gini matches the driver-side Lorenz rank formula") {
    val row = Diagnostics.queries("key_skew_gini")(spark, sf).head()
    val counts = Tables.lineitem(spark, sf)
      .groupBy("l_partkey").count().collect().map(_.getLong(1)).sorted
    val n = counts.length.toLong
    val t = counts.sum
    // direct 1-based rank sum over the fully sorted counts — the naive
    // formula the blocked frequency-of-frequencies plan must reproduce
    val s1 = counts.zipWithIndex.map { case (c, i) => (i + 1L) * c }.sum
    assert(row.getAs[Long]("n_keys") === n)
    assert(row.getAs[Long]("total_rows") === t)
    assert(row.getAs[Long]("gini_num") === 2L * s1 - (n + 1L) * t)
    assert(row.getAs[Long]("gini_den") === n * t)
    val g = row.getAs[Double]("gini")
    assert(g === (2L * s1 - (n + 1L) * t).toDouble / (n * t).toDouble)
    assert(g >= 0.0 && g < 1.0)
  }

  test("split_leakage_audit matches a driver replay of the 80% range cut") {
    val row = Diagnostics.queries("split_leakage_audit")(spark, sf).head()
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (lo, hi) = (ev.map(_._2).min, ev.map(_._2).max)
    val cutoff = lo + ((hi - lo) / 5L) * 4L
    assert(row.getAs[Long]("cutoff") === cutoff)
    val byUser = ev.groupBy(_._1).map { case (u, xs) =>
      (u, xs.count(_._2 < cutoff).toLong, xs.count(_._2 >= cutoff).toLong) }
    assert(row.getAs[Long]("n_train_events") === byUser.map(_._2).sum)
    assert(row.getAs[Long]("n_test_events") === byUser.map(_._3).sum)
    val (uTr, uTe, uBoth) = (byUser.count(_._2 > 0).toLong,
      byUser.count(_._3 > 0).toLong,
      byUser.count(x => x._2 > 0 && x._3 > 0).toLong)
    assert(row.getAs[Long]("n_users_train") === uTr)
    assert(row.getAs[Long]("n_users_test") === uTe)
    assert(row.getAs[Long]("n_users_both") === uBoth)
    assert(row.getAs[Double]("leakage_rate") === uBoth.toDouble / uTe.toDouble)
    // the audit must be non-vacuous: events on both sides of the cut
    assert(uTr > 0 && uTe > 0)
  }
}
