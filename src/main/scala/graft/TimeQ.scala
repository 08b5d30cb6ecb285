package graft
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = Sessions.local("graft-timeq")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    args.tail.foreach { name =>
      Tables.lineitem(spark, dir).write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"TIMEQ $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
