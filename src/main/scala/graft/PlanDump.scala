package graft

/** Dev main: print a registered query's formatted executed plan against a
  * data dir. Usage: runMain graft.PlanDump <sfDir> <query> */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-plandump")
    val df = SparkEntry.queries(args(1))(spark, args(0))
    println("==== PLAN " + args(1))
    println(df.queryExecution.executedPlan.toString)
    println("==== END")
    spark.stop()
  }
}
