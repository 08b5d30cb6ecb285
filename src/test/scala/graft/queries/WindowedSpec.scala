package graft.queries

import graft.SparkSpec

class WindowedSpec extends SparkSpec {

  test("gap-fill: observed hours keep their value; interior gaps interpolate; edges stay null") {
    val rows = Windowed.queries("gapfill_interpolate")(spark, sf).collect()
    assert(rows.nonEmpty)
    // observed hours: v_filled == v_raw and not flagged
    rows.filter(r => !r.isNullAt(r.fieldIndex("v_raw"))).foreach { r =>
      assert(r.getAs[Double]("v_filled") == r.getAs[Double]("v_raw"))
      assert(!r.getAs[Boolean]("interpolated"))
    }
    // gaps exist and interpolated values land strictly between or at the
    // neighbors per user (linear interpolation is bounded by endpoints)
    val interp = rows.filter(_.getAs[Boolean]("interpolated"))
    assert(interp.nonEmpty, "spine should contain interpolated hours at sf0.001 density")
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("h"))
      val obs = sorted.filter(r => !r.isNullAt(r.fieldIndex("v_raw")))
      if (obs.nonEmpty) {
        val firstObs = obs.head.getAs[Long]("h")
        val lastObs  = obs.last.getAs[Long]("h")
        sorted.foreach { r =>
          val h = r.getAs[Long]("h")
          if (h < firstObs || h > lastObs)
            assert(r.isNullAt(r.fieldIndex("v_filled")), s"edge hour $h must stay null")
        }
      }
    }
    // spot-check exact linearity on one interpolated row
    val r0 = interp.head
    val u = r0.getAs[Long]("user_id"); val h = r0.getAs[Long]("h")
    val sorted = byUser(u).sortBy(_.getAs[Long]("h"))
      .filter(r => !r.isNullAt(r.fieldIndex("v_raw")))
    val prev = sorted.filter(_.getAs[Long]("h") < h).last
    val next = sorted.filter(_.getAs[Long]("h") > h).head
    val (ph, pv) = (prev.getAs[Long]("h"), prev.getAs[Double]("v_raw"))
    val (nh, nv) = (next.getAs[Long]("h"), next.getAs[Double]("v_raw"))
    val expect = pv + (nv - pv) * ((h - ph).toDouble / (nh - ph).toDouble)
    assert(r0.getAs[Double]("v_filled") == expect)
  }

  test("mode: the reported value has the max count, ties broken to the smallest value") {
    val modes = Windowed.queries("mode_per_flag")(spark, sf).collect()
    assert(modes.nonEmpty)
    val counts = graft.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag", "l_quantity").count().collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    modes.foreach { m =>
      val flag = m.getAs[String]("l_returnflag")
      val got  = m.getAs[Double]("mode_qty")
      val cnt  = m.getAs[Long]("mode_count")
      val inFlag = counts.filter(_._1 == flag)
      assert(cnt == inFlag.map(_._3).max)
      val tied = inFlag.filter(_._3 == cnt).map(_._2)
      assert(got == tied.min, s"$flag: got $got, tied candidates ${tied.sorted.toSeq}")
    }
  }

  test("null-safe join: the NULL bucket survives and matches both sides") {
    val rows = Windowed.queries("nullsafe_join_buckets")(spark, sf).collect()
    assert(rows.length == 7) // buckets 0,1,2,4,5,6 + NULL (3 is nullif'd away)
    val nullRow = rows.filter(_.isNullAt(0))
    assert(nullRow.length == 1, "exactly one NULL<=>NULL matched bucket")
    assert(nullRow.head.getAs[Long]("n_orders") > 0)
    assert(nullRow.head.getAs[Long]("n_customers") > 0)
  }

  test("percent_rank/cume_dist bounds and quartile balance") {
    val rows = Windowed.queries("window_percent_ranks")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pr = r.getAs[Double]("pct_rank"); val cd = r.getAs[Double]("cume")
      assert(pr >= 0.0 && pr <= 1.0); assert(cd > 0.0 && cd <= 1.0)
      val q = r.getAs[Int]("quartile"); assert(q >= 1 && q <= 4)
    }
  }

  test("seasonal_decompose matches brute force; components reconstruct y") {
    import org.apache.spark.sql.functions._
    val rows = Windowed.queries("seasonal_decompose")(spark, sf).collect()
      .sortBy(_.getAs[Long]("x"))
    val daily = graft.Tables.orders(spark, sf)
      .select(datediff(col("o_orderdate"), lit("1992-01-01").cast("date")).cast("long"),
        floor(col("o_totalprice") * 100).cast("long"))
      .collect()
      .groupBy(_.getLong(0)).toSeq
      .map { case (x, rs) => (x, rs.map(_.getLong(1)).sum) }
      .sortBy(_._1)
    assert(rows.length === daily.length)
    // brute-force centered 7-observation MA trend
    val trend = daily.indices.map { i =>
      val lo = math.max(0, i - 3); val hi = math.min(daily.length - 1, i + 3)
      val win = (lo to hi).map(daily(_)._2)
      win.sum.toDouble / win.length.toDouble
    }
    val detr = daily.indices.map(i => daily(i)._2.toDouble - trend(i))
    val seasonal = daily.indices.groupBy(i => daily(i)._1 % 7).map { case (dow, is) =>
      dow -> is.map(detr).sum / is.length.toDouble
    }
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("y") === daily(i)._2)
      assert(math.abs(r.getAs[Double]("trend") - trend(i)) < 1e-6, s"x=${daily(i)._1}")
      val dow = daily(i)._1 % 7
      assert(math.abs(r.getAs[Double]("seasonal") - seasonal(dow)) < 1e-6)
      // additive identity: y = trend + seasonal + resid (float-tolerant)
      val recon = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("resid")
      assert(math.abs(recon - daily(i)._2.toDouble) < 1e-6)
    }
  }

  test("attribution_credit: brute-force touch counts; credit conserves purchase value") {
    import org.apache.spark.sql.functions._
    val rows = Analytics.queries("attribution_credit")(spark, sf).collect()
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
      .collect()
    val clicks = ev.filter(_.getAs[String]("event_type") == "click")
    val purchases = ev.filter(_.getAs[String]("event_type") == "purchase")
    assert(rows.map(_.getAs[Long]("purchase_id")).distinct.length === purchases.length)
    val week = 604800000000L
    purchases.foreach { p =>
      val pid = p.getAs[Long]("event_id")
      val pt = p.getAs[Long]("us")
      val touched = clicks.filter { c =>
        c.getAs[Long]("user_id") == p.getAs[Long]("user_id") && {
          val ct = c.getAs[Long]("us"); ct < pt && ct >= pt - week
        }
      }.map(_.getAs[Long]("event_id")).toSet
      val mine = rows.filter(_.getAs[Long]("purchase_id") == pid)
      if (touched.isEmpty) {
        // direct conversion: single sentinel row with full credit
        assert(mine.length === 1 && mine.head.getAs[Long]("touch_id") === -1L)
        assert(mine.head.getAs[Long]("n_touches") === 0L)
        assert(mine.head.getAs[Double]("credit") === p.getAs[Double]("value"))
      } else {
        assert(mine.map(_.getAs[Long]("touch_id")).toSet === touched)
        mine.foreach(r => assert(r.getAs[Long]("n_touches") === touched.size.toLong))
        // equal split conserves the purchase value
        val total = mine.map(_.getAs[Double]("credit")).sum
        assert(math.abs(total - p.getAs[Double]("value")) < 1e-9)
      }
    }
  }
}
