package graft

import org.apache.spark.sql.functions._
import graft.expr.Exact

/** Throwaway dev micro-bench for optimization experiments.
  * Usage: runMain graft.Micro <sfDir>
  */
object Micro {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("graft-micro")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    def t(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"MICRO $tag%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }

    // outlier_iqr A/B: spreadNarrow + percentile_cont counts-map (the
    // measured r16 form) vs Ranks.exactGroupedPercentileArray (the
    // unmeasured fd9ee95 rewrite the driver read as 0.883 regressed).
    def iqrA() = {
      val li = Tables.lineitem(spark, dir)
      val q = Tables.spreadNarrow(spark,
          li.select(col("l_returnflag"), col("l_extendedprice")))
        .groupBy("l_returnflag").agg(
          expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice)").as("q1"),
          expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY l_extendedprice)").as("q3"))
      li.join(broadcast(q), "l_returnflag")
        .groupBy(col("l_returnflag"), col("q1"), col("q3"))
        .agg(
          Exact.cntIf(col("l_extendedprice") < col("q1") - lit(1.5) * (col("q3") - col("q1")) ||
            col("l_extendedprice") > col("q3") + lit(1.5) * (col("q3") - col("q1"))).as("n_outliers"),
          count(lit(1)).as("n"))
    }
    def iqrB() = {
      val li = Tables.lineitem(spark, dir)
      val q = graft.operators.Ranks.exactGroupedPercentileArray(
          li.select(col("l_returnflag"), col("l_extendedprice")),
          "l_returnflag", col("l_extendedprice"), Seq(0.25, 0.75), "qs")
        .select(col("l_returnflag"),
          element_at(col("qs"), 1).as("q1"), element_at(col("qs"), 2).as("q3"))
      li.join(broadcast(q), "l_returnflag")
        .groupBy(col("l_returnflag"), col("q1"), col("q3"))
        .agg(
          Exact.cntIf(col("l_extendedprice") < col("q1") - lit(1.5) * (col("q3") - col("q1")) ||
            col("l_extendedprice") > col("q3") + lit(1.5) * (col("q3") - col("q1"))).as("n_outliers"),
          count(lit(1)).as("n"))
    }
    for (pass <- 1 to 4) {
      t(s"iqr A spreadNarrow+percentile_cont p$pass") {
        iqrA().write.format("noop").mode("overwrite").save()
      }
      t(s"iqr B exactGroupedPercentileArray p$pass") {
        iqrB().write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
