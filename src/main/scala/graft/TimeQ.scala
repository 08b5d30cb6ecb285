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
    names.foreach { name =>
      Tables.lineitem(spark, dir).write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"TIMEQ $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
