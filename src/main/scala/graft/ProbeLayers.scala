package graft

/** Ad-hoc layer-build profiler: runs the named queries once cold and
  * prints the [[LayerMetrics]] manifest — the per-layer breakdown the
  * bench publishes, runnable standalone while chasing a layer-build
  * regression (round 14: the `clusters` layer). */
object ProbeLayers {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = Sessions.local("graft-probe")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    args.tail.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    LayerMetrics.snapshot.foreach { case (k, (b, n, r)) =>
      println(f"LAYER $k build=$b%.3f s builds=$n reuses=$r")
    }
    spark.stop()
  }
}
