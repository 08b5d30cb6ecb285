package graft

import org.apache.spark.sql.functions._

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
    val li = Tables.lineitem(spark, dir)
    val ep = li.select(col("l_extendedprice"))
    val epSpread = Tables.spreadNarrow(spark, ep)
    for (_ <- 1 to 2) {
      t("exact percentile ep serial") {
        ep.agg(expr("percentile(l_extendedprice, array(0.5, 0.95))"))
          .write.format("noop").mode("overwrite").save()
      }
      t("exact percentile ep spread") {
        epSpread.agg(expr("percentile(l_extendedprice, array(0.5, 0.95))"))
          .write.format("noop").mode("overwrite").save()
      }
      t("approx percentile ep serial") {
        ep.agg(expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)"))
          .write.format("noop").mode("overwrite").save()
      }
      t("approx percentile ep spread") {
        epSpread.agg(expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)"))
          .write.format("noop").mode("overwrite").save()
      }
      t("sort ep + pick 4 ranks") {
        val n = ep.count()
        val ranked = graft.operators.Ranks.globalRowNumber(ep, Seq(col("l_extendedprice")), "rk")
        val want = Seq(0.5, 0.95).flatMap { q =>
          val pos = q * (n - 1); Seq(math.floor(pos).toLong + 1, math.ceil(pos).toLong + 1)
        }.distinct
        ranked.filter(col("rk").isin(want: _*))
          .write.format("noop").mode("overwrite").save()
      }
      t("qty percentile serial") {
        li.select(col("l_quantity")).agg(expr("percentile(l_quantity, 0.99)"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
