package graft

import org.apache.spark.sql.functions._

/** Dev profiling main: stage-by-stage wall times of the IoT chain build —
  * the dominant fixed cost in the bench (the first mart consumer pays it).
  * Usage: runMain graft.Profile [sfDir]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("graft-profile")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    time("jvm/session warmup job") {
      spark.range(0, 1000000, 1, 32).selectExpr("sum(id)").collect()
      Tables.lineitem(spark, dir).count()
    }
    time("events raw scan noop") {
      spark.read.parquet(s"$dir/events.parquet")
        .write.format("noop").mode("overwrite").save()
    }
    time("events + tsconv noop") {
      Tables.normalizeTs(spark.read.parquet(s"$dir/events.parquet"))
        .write.format("noop").mode("overwrite").save()
    }
    time("events + tsconv + repartition noop") {
      Tables.normalizeTs(spark.read.parquet(s"$dir/events.parquet"))
        .repartition(32)
        .write.format("noop").mode("overwrite").save()
    }
    val ev = time("events scan count") {
      val e = Tables.events(spark, dir); e.count(); e
    }
    time("staging compute (no persist)") {
      model.Staging.fromEvents(ev).write.format("noop").mode("overwrite").save()
    }
    val stg = time("staging persist") {
      val s = model.Staging.fromEvents(ev)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      s.count(); s
    }
    val valid = time("valid window+persist") {
      val v = model.Anomalies.validReadings(stg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      v.count(); v
    }
    time("anomalies build (no persist)") {
      model.Anomalies.fromStaging(stg).write.format("noop").mode("overwrite").save()
    }
    val mart = time("mart persist") {
      val m = model.MartReadings.fromStaging(stg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      m.count(); m
    }
    time("anomaly_breakdown from cache") {
      model.PipelineSummary.anomalyBreakdown(mart)
        .write.format("noop").mode("overwrite").save()
    }
    time("mart_summary from cache") {
      model.PipelineSummary.overall(mart)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
