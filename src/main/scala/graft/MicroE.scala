package graft

/** Throwaway dev A/B: does spark.sql.optimizer.canChangeCachedPlanOutputPartitioning
  * affect queries that touch no cached frame? Two sessions in one JVM
  * (shared context, independent SQLConf), alternating runs.
  * Usage: runMain graft.MicroE <sfDir>
  */
object MicroE {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val base = Sessions.local("graft-microe")
    base.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "false")
    val tuned = base.newSession()
    tuned.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    Sessions.tune(tuned)
    base.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    def t(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"MICROE $tag%-36s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    val qs = Seq("mannwhitney_u", "exact_median_twopass", "quantile_normalize")
    for (pass <- 1 to 3; q <- qs) {
      t(s"$q OFF p$pass") {
        SparkEntry.queries(q)(base, dir).write.format("noop").mode("overwrite").save()
      }
      t(s"$q ON  p$pass") {
        SparkEntry.queries(q)(tuned, dir).write.format("noop").mode("overwrite").save()
      }
    }
    base.stop()
  }
}
