package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev profiling main: per-STAGE decomposition for one query — task count,
  * executor run time, deserialize time, GC, and the stage name line — to
  * attribute where a many-job superstep query actually spends its time.
  * Usage: runMain graft.ProfileS <sfDir> <query> [passes]
  */
object ProfileS {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val passes = if (args.length > 2) args(2).toInt else 2
    val spark = Sessions.local("graft-profs")
    case class St(var tasks: Int = 0, var runMs: Long = 0, var deserMs: Long = 0,
      var gcMs: Long = 0, var resultBytes: Long = 0, var info: String = "")
    val stages = mutable.LinkedHashMap.empty[Int, St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val st = stages.getOrElseUpdate(s.stageInfo.stageId, St())
        st.info = s.stageInfo.name.take(90)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val st = stages.getOrElseUpdate(t.stageId, St())
        st.tasks += 1
        val m = t.taskMetrics
        if (m != null) {
          st.runMs += m.executorRunTime
          st.deserMs += m.executorDeserializeTime
          st.gcMs += m.jvmGCTime
          st.resultBytes += m.resultSize
        }
      }
    })
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    for (p <- 1 to passes) {
      stages.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"PROFS $name pass $p wall=$wall%.3f s, ${stages.size} stages")
      stages.toSeq.sortBy(-_._2.deserMs).take(30).foreach { case (id, s) =>
        println(f"PROFS   stage=$id%4d tasks=${s.tasks}%4d run=${s.runMs / 1000.0}%7.2f deser=${s.deserMs / 1000.0}%7.2f gc=${s.gcMs / 1000.0}%5.2f | ${s.info}")
      }
    }
    spark.stop()
  }
}
