package graft

/** Throwaway dev A/B: AQE on vs off for the tiny-shuffle superstep
  * family (per-exchange stage materialization is a driver round-trip per
  * exchange; at sf0.1 the frames are KBs). Two sessions in one JVM.
  * Usage: runMain graft.MicroG <sfDir>
  */
object MicroG {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val base = Sessions.local("graft-microg")
    val noAqe = base.newSession()
    noAqe.conf.set("spark.sql.adaptive.enabled", "false")
    Sessions.tune(noAqe)
    base.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    def t(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"MICROG $tag%-36s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    val qs = Seq("pagerank_integer", "kcenter_coreset_k16", "link_prediction")
    for (pass <- 1 to 3; q <- qs) {
      t(s"$q AQE  p$pass") {
        SparkEntry.queries(q)(base, dir).write.format("noop").mode("overwrite").save()
      }
      t(s"$q noAQE p$pass") {
        SparkEntry.queries(q)(noAqe, dir).write.format("noop").mode("overwrite").save()
      }
    }
    base.stop()
  }
}
