package graft

import org.apache.spark.scheduler._

/** Dev profiling main: per-query decomposition of wall time into
  * plan-construction (fn call), driver planning (executedPlan force), and
  * execution, with listener-summed task metrics — answers "is this query
  * driver-bound, scheduler-bound or compute-bound" (optimization guide §1/§7).
  * Usage: runMain graft.ProfileQ <sfDir> <query...> (each runs twice)
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = Sessions.local("graft-profileq")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L   // executor run time
    @volatile var gcMs = 0L
    @volatile var deserMs = 0L
    @volatile var serMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        val m = t.taskMetrics
        if (m != null) {
          taskTimeMs += m.executorRunTime
          gcMs += m.jvmGCTime
          deserMs += m.executorDeserializeTime
          serMs += m.resultSerializationTime
        }
      }
    })
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    def reset(): Unit = { jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0; gcMs = 0; deserMs = 0; serMs = 0 }
    val names: Seq[String] = args.tail.toSeq
    names.foreach { name =>
      for (pass <- 1 to 2) {
        reset()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+physical planning
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        // task time is summed over all cores; wall-equivalent = /32
        println(f"PROFQ $name%-28s p$pass build=${(t1 - t0) / 1e9}%6.3f plan=${(t2 - t1) / 1e9}%6.3f exec=${(t3 - t2) / 1e9}%6.3f total=${(t3 - t0) / 1e9}%6.3f | jobs=$jobs%3d stages=$stages%3d tasks=$tasks%4d taskSum=${taskTimeMs / 1000.0}%7.2f gc=${gcMs / 1000.0}%5.2f deser=${deserMs / 1000.0}%5.2f ser=${serMs / 1000.0}%5.2f")
      }
    }
    spark.stop()
  }
}
