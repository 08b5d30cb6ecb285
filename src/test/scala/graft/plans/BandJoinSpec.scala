package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** [[RewriteBandJoin]] must (a) produce exactly the naive nested-loop band
  * join's result multiset — including pairs exactly at the tolerance, at
  * tolerance+1, and with negative values spanning the double-width cell 0
  * that truncate-toward-zero `div` produces — (b) plan the band join as
  * Generate → equi-join with no nested loop, and (c) leave out-of-scope
  * joins (outer, non-integral operands) untouched. */
class BandJoinSpec extends SparkSpec {

  private def withFlag[T](on: Boolean)(body: => T): T = {
    spark.conf.set(RewriteBandJoin.ConfKey, on.toString)
    try body finally spark.conf.set(RewriteBandJoin.ConfKey, "false")
  }

  /** Forces plan + result under the flag setting. */
  private def run(on: Boolean)(build: => DataFrame): (String, Set[Seq[Any]]) =
    withFlag(on) {
      val df = build
      val plan = df.queryExecution.executedPlan.toString
      (plan, df.collect().map(_.toSeq.toIndexedSeq: Seq[Any]).toSet)
    }

  private def eventsBand(): DataFrame = {
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), unix_micros(col("ts")).as("pt"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), unix_micros(col("ts")).as("et"))
    errors.join(purchases, abs(col("pt") - col("et")) <= lit(900000000L))
      .groupBy("error_id").agg(count(lit(1)).as("n_nearby_purchases"))
  }

  test("rewritten band join equals the nested-loop result on events") {
    val (naivePlan, expected) = run(on = false)(eventsBand())
    val (plan, got) = run(on = true)(eventsBand())
    assert(naivePlan.contains("BroadcastNestedLoopJoin"),
      s"baseline should be the nested loop:\n$naivePlan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"not rewritten:\n$plan")
    assert(plan.contains("Generate explode"), s"no probe-cell explode:\n$plan")
    assert(got === expected)
  }

  test("boundary + negative values: exact-tolerance pairs kept, tol+1 dropped") {
    val s0 = spark
    import s0.implicits._
    // cells of width 10 around zero: truncate-toward-zero makes cell 0 span
    // [-9, 9] — the widened-cell case the adjacency argument must survive
    val xs = Seq(-21L, -10L, -9L, -1L, 0L, 9L, 10L, 19L, 30L).toDF("x")
    val ys = Seq(-31L, -20L, -11L, -10L, 0L, 10L, 20L, 29L, 40L).toDF("y")
    def pairs() = xs.join(ys, abs(col("x") - col("y")) <= lit(10L))
    val (_, expected) = run(on = false)(pairs())
    val (plan, got) = run(on = true)(pairs())
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(got === expected)
    // sanity on the fixture itself: includes exact-tol and tol+1 pairs
    assert(expected.contains(Seq(-21L, -11L)))   // |Δ| = 10, kept
    assert(!expected.contains(Seq(-21L, -10L)))  // |Δ| = 11, dropped
  }

  test("multiplicity: duplicate rows join once per pair, never deduped or doubled") {
    val s0 = spark
    import s0.implicits._
    val xs = Seq(5L, 5L, 17L).toDF("x")
    val ys = Seq(7L, 7L, 7L).toDF("y")
    val (_, got) = run(on = true) {
      xs.join(ys, abs(col("x") - col("y")) <= lit(10L))
        .groupBy("x").agg(count(lit(1)).as("n"))
    }
    // groupBy collapses the duplicate x=5 rows: 2 rows × 3 matches = 6 —
    // any dedup in the rewrite would yield 3, any double-count 12
    assert(got === Set[Seq[Any]](Seq(5L, 6L), Seq(17L, 3L)))
  }

  test("asymmetric two-inequality band: rewritten, centered, and exact") {
    val s0 = spark
    import s0.implicits._
    val xs = (-30L to 30L by 3L).toDF("x")
    val ys = (-25L to 35L by 2L).toDF("y")
    // -7 ≤ x − y ≤ 3, strict upper: x − y < 4 ⟺ ≤ 3
    def pairs() = xs.join(ys,
      col("x") >= col("y") - lit(7L) && col("x") - col("y") < lit(4L))
    val (naivePlan, expected) = run(on = false)(pairs())
    val (plan, got) = run(on = true)(pairs())
    assert(naivePlan.contains("BroadcastNestedLoopJoin"), naivePlan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"not rewritten:\n$plan")
    assert(plan.contains("Generate explode"), plan)
    assert(got === expected)
  }

  test("far-offset band (100 ≤ x − y ≤ 110) buckets at the half-width via centering") {
    val s0 = spark
    import s0.implicits._
    val xs = (0L to 400L by 7L).toDF("x")
    val ys = (0L to 300L by 5L).toDF("y")
    def pairs() = xs.join(ys,
      col("x") - lit(100L) >= col("y") && col("x") <= col("y") + lit(110L))
    val (_, expected) = run(on = false)(pairs())
    val (plan, got) = run(on = true)(pairs())
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"not rewritten:\n$plan")
    // centered half-width w = 5, not the raw 110-wide bound
    assert(plan.contains("div 5"), s"expected width-5 buckets:\n$plan")
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("scope guards: outer joins and fractional operands are left alone") {
    val s0 = spark
    import s0.implicits._
    val xs = Seq(1L, 2L).toDF("x")
    val ys = Seq(3L, 4L).toDF("y")
    val (outerPlan, _) = run(on = true) {
      xs.join(ys, abs(col("x") - col("y")) <= lit(1L), "left")
    }
    assert(outerPlan.contains("BroadcastNestedLoopJoin"),
      s"outer band join must not be rewritten:\n$outerPlan")
    val xd = Seq(1.0, 2.0).toDF("xd")
    val yd = Seq(3.0, 4.0).toDF("yd")
    val (doublePlan, _) = run(on = true) {
      xd.join(yd, abs(col("xd") - col("yd")) <= lit(1.5))
    }
    assert(doublePlan.contains("BroadcastNestedLoopJoin"),
      s"fractional band join must not be rewritten:\n$doublePlan")
  }
}
