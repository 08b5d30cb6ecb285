package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Semantics checks for Analytics-module operators that need more than the
  * hash oracle (cross-formulation equivalences). */
class AnalyticsSpec extends SparkSpec {

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
}
