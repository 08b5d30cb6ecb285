package graft
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = Sessions.local("graft-timeq")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    // @file expands to whitespace-separated query names (arg-length limits)
    val names: Seq[String] = args.tail.toSeq.flatMap { a =>
      if (a.startsWith("@"))
        java.nio.file.Files.readString(java.nio.file.Paths.get(a.drop(1)))
          .split("\\s+").filter(_.nonEmpty).toSeq
      else Seq(a)
    }
    // The lineitem noop between queries keeps a cold-ish cache baseline
    // (it evicts whatever the previous query warmed); GRAFT_TIMEQ_NONOOP
    // skips it for isolating its own allocation/GC interaction with the
    // timed query (round-16 content-skew postmortem).
    val noNoop = sys.env.contains("GRAFT_TIMEQ_NONOOP")
    names.foreach { name =>
      if (!noNoop)
        Tables.lineitem(spark, dir).write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"TIMEQ $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
