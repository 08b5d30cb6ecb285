package graft

/** Local smoke runner mirroring the driver's t1 check: `entry` must return
  * rows on sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-smoke")
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS=$n")
    spark.stop()
    assert(n > 0, "entry returned no rows")
  }
}
