package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics checks for the enrichment family (Enrich.scala). */
class EnrichSpec extends SparkSpec {

  test("entity_match_blocked equals a driver replay of collapse + block + verify") {
    val out = Enrich.queries("entity_match_blocked")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val names = graft.Tables.part(spark, sf)
      .groupBy(col("p_name")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def lev(a: String, b: String): Int = {
      val dp = Array.range(0, b.length + 1)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length)
    }
    val keyed = names.keys.toSeq.flatMap { n =>
      val w = n.split(" ")
      Seq(("f:" + w.head, n), ("l:" + w.last, n))
    }
    val cand = keyed.groupBy(_._1).values.flatMap { g =>
      val items = g.map(_._2).sorted.take(1000)
      for (i <- items.indices; j <- (i + 1) until items.length)
        yield (items(i), items(j))
    }.groupBy(identity).map { case ((a, b), occ) => (a, b, occ.size.toLong) }
    val brute = cand.collect {
      case (a, b, nk) if lev(a, b) <= 3 =>
        (a, b, lev(a, b), nk, names(a), names(b))
    }.toSet
    assert(out === brute)
    assert(out.nonEmpty)
    // multi-key blocking earns its keep: some match shares BOTH keys'
    // nouns/adjectives split (n_shared_keys covers 1 and only 1 or 2)
    assert(out.forall(m => m._4 == 1L || m._4 == 2L))
  }

  test("funnel_within_hour matches a driver-side per-user replay") {
    val out = Enrich.queries("funnel_within_hour")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), r.getInt(4)))).toMap
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    val hour = 3600L * 1000000L
    val expect = ev.flatMap { case (u, rows) =>
      val byType = rows.groupBy(_._2)
      byType.get("view").map(_.map(_._3).min).map { vt =>
        val ct = byType.getOrElse("click", Seq.empty)
          .map(_._3).filter(t => t > vt && t <= vt + hour)
          .sorted.headOption
        val pt = ct.flatMap(c => byType.getOrElse("purchase", Seq.empty)
          .map(_._3).filter(t => t > c && t <= c + hour)
          .sorted.headOption)
        u -> ((vt, ct, pt, 1 + ct.size + pt.size))
      }
    }
    assert(out.keySet === expect.keySet)
    for ((u, (vt, ct, pt, stage)) <- expect) {
      val (ovt, oct, opt, ostage) = out(u)
      def micros(o: Option[Any]): Option[Long] =
        o.map(_.asInstanceOf[java.sql.Timestamp])
          .map(t => Math.multiplyExact(t.getTime / 1000, 1000000L) +
            (t.getNanos / 1000) % 1000000)
      assert(micros(ovt) === Some(vt) && micros(oct) === ct &&
        micros(opt) === pt && ostage === stage, s"user $u funnel disagrees")
    }
    // the windowed chain must fire somewhere (stage >= 2), else the replay
    // degenerates to min(view); stage 3 is data-dependent at this SF
    assert(expect.values.exists(_._4 >= 2))
  }

  test("cohort_retention: offset-0 is the full cohort and cells stay inside it") {
    val rows = Enrich.queries("cohort_retention")(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    // every user is active in their own cohort week: offset 0 == cohort size
    val zero = rows.filter(_._2 == 0L)
    assert(zero.map(_._1).toSet === rows.map(_._1).toSet)
    assert(zero.forall(r => r._3 == r._4 && r._5 == 1.0))
    for ((_, off, active, size, ret) <- rows) {
      assert(off >= 0L && active >= 1L && active <= size)
      assert(ret === active.toDouble / size.toDouble)
    }
    // cohort sizes sum to the distinct-user count
    val users = graft.Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).head.getLong(0)
    assert(zero.map(_._4).sum === users)
  }

  test("transition_matrix: probabilities row-normalize to 1") {
    val sums = Enrich.transitionMatrix(spark, sf)
      .groupBy("from_type").agg(sum(col("p")).as("ps")).collect()
    assert(sums.nonEmpty)
    sums.foreach(r => assert(math.abs(r.getAs[Double]("ps") - 1.0) < 1e-9, r.toString))
  }

  test("cdc_apply: one row per surviving user, none whose last op is a delete") {
    val out = Enrich.cdcApply(spark, sf).cache()
    try {
      assert(out.groupBy("user_id").count().filter(col("count") > 1).count() === 0)
      assert(out.filter(col("last_event_type") === "error").count() === 0)
    } finally out.unpersist() // leaked caches hijack later suites' plan pins
  }

  test("rfm: scores are quintiles 1..5 and segment concatenates them") {
    val rows = Enrich.rfmSegments(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      for (c <- Seq("r_score", "f_score", "m_score")) {
        val v = r.getAs[Int](c); assert(v >= 1 && v <= 5, s"$c=$v")
      }
      assert(r.getAs[String]("segment") ===
        s"${r.getAs[Int]("r_score")}${r.getAs[Int]("f_score")}${r.getAs[Int]("m_score")}")
    }
  }

  test("geo grid join: matches the brute-force O(n^2) join at test scale") {
    val fast = Enrich.geoGridJoin(spark, sf)
      .select("key_a", "key_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over the same derived points
    val cust = graft.Tables.customer(spark, sf)
      .select("c_custkey").collect().map(_.getLong(0))
    val M = 2147483648L
    def pos(k: Long): (Long, Long) = {
      val h0 = (k * 1103515245L + 12345L) % M
      val h1 = h0 ^ (h0 / 65536)
      val h2 = (h1 * 69069L + 1L) % M
      val h3 = h2 ^ (h2 / 2048)
      val h4 = (h3 * 1103515245L + 12345L) % M
      val h5 = h4 ^ (h4 / 65536)
      (h3 % 1000000L, h5 % 1000000L)
    }
    val pts = cust.map(k => k -> pos(k))
    val slow = (for {
      (ka, (xa, ya)) <- pts; (kb, (xb, yb)) <- pts
      if ka < kb
      dx = xa / 1000.0 - xb / 1000.0; dy = ya / 1000.0 - yb / 1000.0
      if dx * dx + dy * dy <= 25.0
    } yield (ka, kb)).toSet
    assert(fast === slow)
  }

  test("allocation: per-order allocations sum exactly to the order total") {
    val bad = Enrich.allocateLargestRemainder(spark, sf)
      .groupBy("l_orderkey", "total_cents")
      .agg(sum(col("alloc_cents")).as("allocated"))
      .filter(col("allocated") =!= col("total_cents"))
    assert(bad.count() === 0)
  }

  test("allocation: every allocation is within 1 cent-share of exact proportionality") {
    val off = Enrich.allocateLargestRemainder(spark, sf)
      .withColumn("order_w", sum(col("w_cents")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey")))
      // exact share in cents is total*w/W; largest-remainder keeps every
      // row within (floor, floor+1]
      .filter(col("alloc_cents") < expr("(total_cents * w_cents) div order_w") ||
        col("alloc_cents") > expr("(total_cents * w_cents) div order_w") + 1)
    assert(off.count() === 0)
  }

  test("pps systematic sample: total picks equal K and every pick has positive weight share") {
    val rows = Enrich.ppsSystematicSample(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_picks")).sum === 25L)
    assert(rows.forall(_.getAs[Long]("w") > 0))
  }

  test("ewma: first event per user equals its own value; ewma stays in window hull") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val out = Enrich.ewmaValue(spark, sf)
      .withColumn("rn", row_number().over(w))
      .withColumn("lo", least(col("value"),
        coalesce(lag(col("value"), 1).over(w), col("value")),
        coalesce(lag(col("value"), 2).over(w), col("value")),
        coalesce(lag(col("value"), 3).over(w), col("value")),
        coalesce(lag(col("value"), 4).over(w), col("value"))))
      .withColumn("hi", greatest(col("value"),
        coalesce(lag(col("value"), 1).over(w), col("value")),
        coalesce(lag(col("value"), 2).over(w), col("value")),
        coalesce(lag(col("value"), 3).over(w), col("value")),
        coalesce(lag(col("value"), 4).over(w), col("value"))))
      .cache()
    try {
      assert(out.filter(col("rn") === 1 && col("ewma") =!= col("value")).count() === 0)
      // convex combination of the window values stays inside their hull
      assert(out.filter(col("ewma") < col("lo") - lit(1e-9) ||
        col("ewma") > col("hi") + lit(1e-9)).count() === 0)
    } finally out.unpersist()
  }

  test("streaming left join equals the batch left join") {
    val streamed = Enrich.streamLeftJoin(spark, sf).collect()
      .map(r => (r.getAs[Long]("click_id"), Option(r.getAs[Any]("purchase_id")))).sorted(
        Ordering.by((t: (Long, Option[Any])) => (t._1, t._2.map(_.toString).getOrElse(""))))
    val ev = graft.Tables.events(spark, sf)
    val bounds = ev.agg(
      max(when(col("event_type") === "click", unix_micros(col("ts")))),
      max(when(col("event_type") === "purchase", unix_micros(col("ts"))))).head()
    val cutoff = math.min(bounds.getLong(0), bounds.getLong(1)) - 3L * 3600 * 1000000L
    val clicks = ev.filter(col("event_type") === "click" &&
        unix_micros(col("ts")) <= cutoff)
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("pu"),
        col("ts").as("purchase_ts"))
    val batch = clicks.join(purchases,
        col("user_id") === col("pu") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
        "left_outer")
      .collect()
      .map(r => (r.getAs[Long]("click_id"), Option(r.getAs[Any]("purchase_id")))).sorted(
        Ordering.by((t: (Long, Option[Any])) => (t._1, t._2.map(_.toString).getOrElse(""))))
    assert(streamed.toSeq === batch.toSeq)
  }

  test("winsorize: clipped to [p05, p95], untouched inside the band") {
    val out = Enrich.winsorizeValues(spark, sf).cache()
    try {
      assert(out.filter(col("winsorized") < col("p05") ||
        col("winsorized") > col("p95")).count() === 0)
      assert(out.filter(col("o_totalprice").between(col("p05"), col("p95")) &&
        col("winsorized") =!= col("o_totalprice")).count() === 0)
    } finally out.unpersist()
  }

  test("rank_normalize: qnorm in (0,1) with per-group mean exactly 1/2") {
    val out = Enrich.rankNormalize(spark, sf).cache()
    try {
      assert(out.filter(col("qnorm") <= 0.0 || col("qnorm") >= 1.0).count() === 0)
      // mean of (i-0.5)/n over i=1..n is exactly 0.5
      val means = out.groupBy("event_type").agg(avg(col("qnorm")).as("m")).collect()
      means.foreach(r => assert(math.abs(r.getAs[Double]("m") - 0.5) < 1e-9, r.toString))
    } finally out.unpersist()
  }

  test("group_kfold: 5 folds, shares sum to 1, and no user straddles folds") {
    val rows = Enrich.groupKfold(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("fold")).toSet.subsetOf((0 until 5).toSet))
    assert(math.abs(rows.map(_.getAs[Double]("event_share")).sum - 1.0) < 1e-9)
    val straddlers = graft.Tables.events(spark, sf)
      .withColumn("fold", (((col("user_id") * lit(2654435761L)) % lit(1000003L)) % 5).cast("int"))
      .groupBy("user_id").agg(countDistinct(col("fold")).as("nf"))
      .filter(col("nf") > 1)
    assert(straddlers.count() === 0)
  }

  test("url_parse: components reassemble the original url") {
    val bad = Enrich.urlParse(spark, sf)
      .filter(concat(lit("https://"), col("host"), col("path"), lit("?"), col("query"))
        =!= col("url"))
    assert(bad.count() === 0)
  }

  test("url_dedup: canonical forms are clean and variants actually collapse") {
    val rows = Enrich.urlDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    // canonicalization left no mess behind
    rows.foreach { r =>
      val u = r.getAs[String]("canonical_url")
      assert(!u.contains(":443") && !u.contains("utm_") && !u.contains("#") &&
        !u.contains("/?") && u == u.toLowerCase, u)
      assert(r.getAs[Long]("n_raw_forms") >= 1L &&
        r.getAs[Long]("n_raw_forms") <= r.getAs[Long]("n_events"), u)
    }
    // every event lands in exactly one canonical group
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total === graft.Tables.events(spark, sf).count())
    // and the mess residues really produce multi-variant pages somewhere
    assert(rows.exists(_.getAs[Long]("n_raw_forms") > 1L))
  }

  test("url_prefix_policy: longest matching rule wins, carve-outs override") {
    val rows = Enrich.urlPrefixPolicy(spark, sf).collect()
    assert(rows.length === graft.Tables.events(spark, sf).count())
    // driver-side longest-prefix replay against the literal rule table
    val rules = Enrich.PolicyRules.map { case (p, a, i) => p -> ((a, i)) }.toMap
    rows.foreach { r =>
      val path = r.getAs[String]("path")
      val segs = path.stripPrefix("/").split("/")
      val prefixes = Seq("/", "/" + segs(0), path)
      val best = prefixes.filter(rules.contains).maxBy(_.length)
      val (a, i) = rules(best)
      assert(r.getAs[String]("action") === a, path)
      assert(r.getAs[Long]("rule_id") === i, path)
      assert(r.getAs[Int]("matched_len") === best.length, path)
    }
    // unlisted types fall to the root default-deny
    val m = rows.map(r => r.getAs[String]("path") -> r.getAs[String]("action")).toMap
    assert(m.exists { case (p, a) => p.startsWith("/signup/") && a == "deny" })
  }

  test("url_prefix_policy: the depth-2 carve-out beats its allow parent (planted)") {
    // event types per id are NOT stable across driver SFs, so the
    // carve-out proof runs on a planted corpus where /click/100 exists
    val s0 = spark; import s0.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = Seq(
      (100L, ts, 1L, "click", 1.0, "{}"),
      (101L, ts, 1L, "click", 1.0, "{}"),
      (102L, ts, 2L, "view", 1.0, "{}"),
      (103L, ts, 2L, "signup", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_upp_").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val m = Enrich.urlPrefixPolicy(spark, dir).collect()
      .map(r => r.getAs[String]("path") ->
        ((r.getAs[String]("action"), r.getAs[Long]("rule_id")))).toMap
    assert(m("/click/100") === (("deny", 5L)), "carve-out must beat /click allow")
    assert(m("/click/101") === (("allow", 1L)))
    assert(m("/view/102") === (("allow", 2L)))
    assert(m("/signup/103") === (("deny", 0L)), "unlisted type falls to root deny")
  }

  test("priority_sample matches a driver replay and estimates within 15%") {
    val r = Enrich.queries("priority_sample")(spark, sf).collect().head
    // driver replay: same mix, same priorities, same top-K and estimator
    val rows = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey"), round(col("o_totalprice") * 100, 0).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val scored = rows.map { case (k, w) =>
      val h0 = (k * 1103515245L + 12345L) % 2147483647L
      val h = ((h0 ^ (h0 / 65536L)) * 69069L + 1L) % 2147483648L
      (k, w, w.toDouble / ((h + 1).toDouble / 2147483648.0))
    }
    val byPrio = scored.sortBy(t => (-t._3, t._1))
    val K = 256
    assert(rows.length > K + 1, "corpus too small for the sample size")
    val tau = math.ceil(byPrio.take(K + 1).map(_._3).min).toLong
    val est = byPrio.take(K).map(t => math.max(t._2, tau)).sum
    val truth = rows.map(_._2).sum
    assert(r.getAs[Long]("n_sampled") === K.toLong)
    assert(r.getAs[Long]("tau") === tau)
    assert(r.getAs[Long]("est_total") === est)
    assert(r.getAs[Long]("true_total") === truth)
    assert(r.getAs[Double]("rel_err") === (est - truth).toDouble / truth.toDouble)
    // the DLT estimator's accuracy contract at K=256 over ~1.5k rows:
    // well within 15% (a sign/scale bug lands far outside)
    assert(math.abs(r.getAs[Double]("rel_err")) < 0.15, s"rel_err ${r.getAs[Double]("rel_err")}")
  }

  test("hhi_concentration matches a brute-force share computation") {
    val brand = graft.Tables.part(spark, sf).select("p_partkey", "p_brand")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val vols = graft.Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey", "l_quantity").collect()
      .map(r => ((brand(r.getLong(0)), r.getLong(1)), r.getDouble(2).toLong))
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
    val out = Enrich.queries("hhi_concentration")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5)))).toMap
    val byBrand = vols.groupBy(_._1._1)
    assert(out.keySet === byBrand.keySet)
    for ((b, sup) <- byBrand) {
      val vs = sup.values.toSeq
      val total = vs.sum
      val num = vs.map(v => v * v).sum
      val hhi = num.toDouble / (total * total).toDouble
      assert(out(b) === ((vs.size.toLong, total, num, hhi, num * 4 > total * total)), s"brand $b")
    }
    // shares must be non-degenerate: some brand strictly between the
    // monopoly (1.0) and perfectly-split (1/n) extremes
    assert(out.values.exists { case (n, _, _, h, _) => h > 1.0 / n && h < 1.0 })
  }

  test("markov_stationary matches a driver-side fixed-point power iteration") {
    val rows = graft.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = rows.groupBy(_._1).values.toSeq.flatMap { g =>
      val types = g.sortBy(e => (e._2, e._3)).map(_._4)
      types.sliding(2).filter(_.length == 2).map(w => (w(0), w(1)))
    }.groupBy(identity).map { case ((f, t), g) => (f, t, g.size.toLong) }.toSeq
    val rowSum = trans.groupBy(_._1).map { case (f, g) => f -> g.map(_._3).sum }
    val domain = rowSum.keys.toSeq.sorted
    var x: Map[String, Long] = domain.map(_ -> 1000000000L / domain.size).toMap
    for (_ <- 1 to 6) {
      x = trans.flatMap { case (f, t, c) =>
        x.get(f).map(xv => t -> (xv * c) / rowSum(f))
      }.groupBy(_._1).map { case (t, g) => t -> g.map(_._2).sum }
    }
    val got = Enrich.queries("markov_stationary")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === x)
    // mass approximately conserved (truncation only loses scaled ulps)
    val total = x.values.sum
    assert(total > 990000000L && total <= 1000000000L)
    assert(x.size > 1)
  }

  test("event_paths_topk matches a driver-side sequence replay") {
    // ts collected as unix MICROS (not Timestamp.getTime millis): the
    // query's window orders by full-precision ts (the rle_compress_stats
    // lesson)
    val seqs = graft.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1).values
    val triples = seqs.toSeq.flatMap { g =>
      val types = g.sortBy(e => (e._2, e._3)).map(_._4)
      types.sliding(3).filter(_.length == 3)
        .map(w => (w.mkString(">"), g.head._1))
    }
    val expect = triples.groupBy(_._1)
      .map { case (p, g) => (p, g.size.toLong, g.map(_._2).distinct.size.toLong) }
      .toSeq.sortBy { case (p, n, u) => (-n, -u, p) }.take(20)
    val got = Enrich.queries("event_paths_topk")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expect)
    assert(got.size === 20 && got.head._2 >= got.last._2)
  }
}
