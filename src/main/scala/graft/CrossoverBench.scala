package graft

import org.apache.spark.sql.functions._

import graft.model.{MartReadings, Staging}
import graft.streaming.IncrementalMart

/** Incremental-vs-full-refresh crossover measurement (VERDICT r15 #5):
  * feeds the SAME six weekly arrival slices to both maintenance
  * strategies and prints per-batch marginals and totals.
  *
  *  - full refresh: after each arrival, recompute the whole staging →
  *    anomalies → mart chain over everything arrived so far (the
  *    reference's per-run `full_refresh` dbt semantics — what the
  *    stream_exec_iot_chain gate does per micro-batch);
  *  - incremental: apply each arrival as an O(batch) state update
  *    (IncrementalMart.applyBatch), then materialize the mart and the
  *    summary once at the end.
  *
  * Slices are event-time weeks of January 2024 (the testdata span), with
  * null/out-of-range timestamps riding the last slice — the same arrival
  * cadence the incremental gate's slicing models. Each slice is applied
  * as its own batch, so cross-slice winner contention (including the
  * null-minute sentinel keys) goes through the normal compare-and-set
  * path. Output rows are counted at the end as a sanity check against
  * the batch chain.
  *
  * Usage: runMain graft.CrossoverBench [sfDir]
  */
object CrossoverBench {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = Sessions.local("graft-crossover")
    def timed(tag: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"CROSSOVER $tag $s%.2f s")
      s
    }
    val ev = Tables.events(spark, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ev.count()

    def tsOf(s: String) = to_timestamp(lit(s))
    val weekBounds = (0 to 4).map { i =>
      val (lo, hi) = (i * 7 + 1, math.min(i * 7 + 8, 32))
      (f"2024-01-$lo%02d", if (hi == 32) "2024-02-01" else f"2024-01-$hi%02d")
    }
    val slices: Seq[org.apache.spark.sql.DataFrame] =
      weekBounds.take(5).map { case (lo, hi) =>
        ev.filter(col("ts").isNotNull && col("ts") >= tsOf(lo) && col("ts") < tsOf(hi))
      } :+ ev.filter(col("ts").isNull || col("ts") < tsOf("2024-01-01") ||
        col("ts") >= tsOf("2024-02-01"))

    // full refresh: chain over the growing prefix after each arrival
    var fullTotal = 0.0
    (1 to slices.size).foreach { k =>
      val prefix = slices.take(k).reduce(_ unionByName _)
      fullTotal += timed(s"full_refresh batch=$k")(
        MartReadings.fromStaging(Staging.fromEvents(prefix))
          .write.format("noop").mode("overwrite").save())
    }
    println(f"CROSSOVER full_refresh_total $fullTotal%.2f s")

    // incremental: O(batch) state maintenance + one materialization
    val root = graft.streaming.StreamGate.tempDir("crossover_")
    var incrTotal = 0.0
    slices.zipWithIndex.foreach { case (b, i) =>
      incrTotal += timed(s"incremental batch=${i + 1}")(
        IncrementalMart.applyBatch(spark, b, i.toLong, root))
    }
    incrTotal += timed("incremental materialize_mart")(
      IncrementalMart.materialize(spark, root)
        .write.format("noop").mode("overwrite").save())
    val summarySec = timed("incremental materialize_summary")(
      IncrementalMart.materializeSummary(spark, root)
        .write.format("noop").mode("overwrite").save())
    println(f"CROSSOVER incremental_total ${incrTotal}%.2f s (+ summary $summarySec%.2f s)")

    // sanity: same mart cardinality as the one-shot batch chain
    val batchRows = MartReadings.fromStaging(Staging.fromEvents(ev)).count()
    val incrRows = IncrementalMart.materialize(spark, root).count()
    println(s"CROSSOVER rows batch=$batchRows incremental=$incrRows " +
      (if (batchRows == incrRows) "MATCH" else "MISMATCH"))

    // Phase 2 — steady state: equal-size week batches (above) measure the
    // regime where batch ≈ prefix/6, and there the state machinery's
    // per-row overhead (~1.4× the plain chain) eats the win. The realistic
    // 100-TB cadence is the OPPOSITE regime: small arrivals against a
    // large accumulated state. Build a fresh state over weeks 1-3, then
    // apply the days of week 4 one at a time, pairing each day's
    // incremental applyBatch against the full-refresh alternative
    // (recompute the whole chain over everything arrived so far).
    val root2 = graft.streaming.StreamGate.tempDir("crossover_ss_")
    val warm = ev.filter(col("ts").isNotNull &&
      col("ts") >= tsOf("2024-01-01") && col("ts") < tsOf("2024-01-22"))
    timed("steady warmup weeks1-3")(
      IncrementalMart.applyBatch(spark, warm, 100L, root2))
    (0 until 7).foreach { i =>
      val (lo, hi) = (f"2024-01-${22 + i}%02d", f"2024-01-${23 + i}%02d")
      val day = ev.filter(col("ts").isNotNull &&
        col("ts") >= tsOf(lo) && col("ts") < tsOf(hi))
      val inc = timed(s"steady incr day=$lo")(
        IncrementalMart.applyBatch(spark, day, 101L + i, root2))
      val prefix = ev.filter(col("ts").isNotNull &&
        col("ts") >= tsOf("2024-01-01") && col("ts") < tsOf(hi))
      val full = timed(s"steady full day=$lo")(
        MartReadings.fromStaging(Staging.fromEvents(prefix))
          .write.format("noop").mode("overwrite").save())
      println(f"CROSSOVER steady_pair day=$lo incr=$inc%.2f full=$full%.2f " +
        f"ratio=${full / inc}%.1f")
    }
    spark.stop()
  }
}
