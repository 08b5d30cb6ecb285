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
    for (i <- 1 to 3) {
      t(s"10 trivial no-shuffle jobs (pass $i)") {
        (1 to 10).foreach { _ =>
          spark.range(0, 32, 1, 32).selectExpr("sum(id)")
            .write.format("noop").mode("overwrite").save()
        }
      }
      t(s"10 trivial 1-shuffle jobs (pass $i)") {
        (1 to 10).foreach { _ =>
          spark.range(0, 3200, 1, 32).groupBy(expr("id % 7")).count()
            .write.format("noop").mode("overwrite").save()
        }
      }
    }
    // pagerank build decomposition
    for (pass <- 1 to 2) {
      val nSupp = Tables.supplier(spark, dir).agg(count(lit(1)).as("n_supp"))
      var edges: org.apache.spark.sql.DataFrame = null
      t(s"pr$pass edges plan") {
        edges = Tables.lineitem(spark, dir)
          .crossJoin(broadcast(nSupp))
          .select(col("l_suppkey").as("src"), (col("l_partkey") % col("n_supp")).as("dst"))
          .filter(col("src") =!= col("dst"))
          .distinct().persist()
      }
      val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val nodes = Tables.supplier(spark, dir).select(col("s_suppkey").as("node"))
      var mass = nodes.withColumn("mass", lit(1000000L))
      for (round <- 1 to 3) {
        t(s"pr$pass round $round plan") {
          val contrib = edges.join(deg, "src")
            .join(mass.withColumnRenamed("node", "src"), "src")
            .groupBy(col("dst").as("node"))
            .agg(sum(expr("(mass * 85) div (100 * outdeg)")).as("contrib"))
          mass = nodes.join(contrib, Seq("node"), "left")
            .select(col("node"),
              (lit(150000L) + coalesce(col("contrib"), lit(0L))).as("mass"))
        }
        if (round % 2 == 0) t(s"pr$pass round $round ckpt") {
          mass = mass.localCheckpoint(false)
        }
      }
      t(s"pr$pass exec") {
        mass.write.format("noop").mode("overwrite").save()
      }
      edges.unpersist()
    }
    // same loop, NO checkpoint
    for (pass <- 1 to 2) {
      val nSupp = Tables.supplier(spark, dir).agg(count(lit(1)).as("n_supp"))
      val edges = Tables.lineitem(spark, dir)
        .crossJoin(broadcast(nSupp))
        .select(col("l_suppkey").as("src"), (col("l_partkey") % col("n_supp")).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct().persist()
      val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val nodes = Tables.supplier(spark, dir).select(col("s_suppkey").as("node"))
      var mass = nodes.withColumn("mass", lit(1000000L))
      t(s"prNC$pass build+exec") {
        for (round <- 1 to 3) {
          val contrib = edges.join(deg, "src")
            .join(mass.withColumnRenamed("node", "src"), "src")
            .groupBy(col("dst").as("node"))
            .agg(sum(expr("(mass * 85) div (100 * outdeg)")).as("contrib"))
          mass = nodes.join(contrib, Seq("node"), "left")
            .select(col("node"),
              (lit(150000L) + coalesce(col("contrib"), lit(0L))).as("mass"))
        }
        mass.write.format("noop").mode("overwrite").save()
      }
      edges.unpersist()
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
