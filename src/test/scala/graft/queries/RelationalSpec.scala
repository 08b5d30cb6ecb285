package graft.queries

import graft.SparkSpec

class RelationalSpec extends SparkSpec {

  test("approx_count_distinct lands within 10% of exact (A7 scale path)") {
    // tighter bound than the 15% in-query verdict: check the raw estimate
    val li = graft.Tables.lineitem(spark, sf)
    import org.apache.spark.sql.functions._
    val r0 = li.agg(
      countDistinct(col("l_partkey")).as("ep"),
      approx_count_distinct(col("l_partkey")).as("ap"),
      countDistinct(col("l_suppkey")).as("es"),
      approx_count_distinct(col("l_suppkey")).as("as_")).head()
    val (exactP, approxP) = (r0.getAs[Long]("ep"), r0.getAs[Long]("ap"))
    val (exactS, approxS) = (r0.getAs[Long]("es"), r0.getAs[Long]("as_"))
    assert(math.abs(approxP - exactP).toDouble / exactP < 0.10, s"parts $approxP vs $exactP")
    assert(math.abs(approxS - exactS).toDouble / exactS < 0.10, s"supps $approxS vs $exactS")
    // and the gate query's verdict columns must come out TRUE (the oracle
    // asserts them as literals)
    val r = Relational.queries("approx_distinct")(spark, sf).head()
    assert(r.getAs[Boolean]("parts_within_tol") && r.getAs[Boolean]("supps_within_tol"))
  }

  test("approx_percentile lands within 2% of the exact order statistic") {
    import org.apache.spark.sql.functions.expr
    val raw = graft.Tables.lineitem(spark, sf).agg(
      expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").as("p50"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx_p50"),
      expr("percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice)").as("p95"),
      expr("approx_percentile(l_extendedprice, 0.95, 1000)").as("approx_p95")).head()
    for (p <- Seq("p50", "p95")) {
      val e = raw.getAs[Double](p)
      val a = raw.getAs[Double](s"approx_$p")
      assert(math.abs(a - e) / e < 0.02, s"$p: $a vs $e")
    }
    val r = Relational.queries("approx_quantiles")(spark, sf).head()
    for (c <- Seq("p50_within_tol", "p95_within_tol", "p99_within_tol"))
      assert(r.getAs[Boolean](c), c)
  }

  test("as-of join: every error with a prior purchase gets the latest one") {
    val rows = Temporal.asofLastPurchase(spark, sf).collect()
    assert(rows.nonEmpty)
    // spot-check the invariant on the driver against a brute-force lookup
    val ev = graft.Tables.events(spark, sf)
      .select("event_id", "user_id", "ts", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3)))
    val purchases = ev.filter(_._4 == "purchase")
    rows.take(50).foreach { r =>
      val user = r.getAs[Long]("user_id")
      val errTs = r.getAs[java.sql.Timestamp]("error_ts")
      val expect = purchases.filter(p => p._2 == user && !p._3.after(errTs))
        .sortBy(p => (p._3.getTime, p._1)).lastOption
      val got = Option(r.getAs[java.lang.Long]("asof_purchase_id")).map(_.toLong)
      assert(got === expect.map(_._1), s"user $user at $errTs")
    }
  }

  test("sessionization: events within a session are gap-bounded") {
    val sess = Temporal.sessionize(spark, sf).collect()
    assert(sess.nonEmpty)
    // session durations are non-negative; multi-event sessions exist at
    // sf0.001's event density; no session spans more than the full range
    assert(sess.forall(_.getAs[Double]("duration_secs") >= 0))
    assert(sess.exists(_.getAs[Long]("n_events") > 1))
  }
}
