package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

/** Streaming aggregation surfaces beyond the ingest chain: watermarked
  * event-time windows and explicit keyed state via mapGroupsWithState.
  *
  * The reference needs neither (its pipeline is a stateless full refresh
  * per run — SURVEY §2.9 T5); these are the north-star streaming operators
  * a general engine must offer. Both run identically under
  * `Trigger.AvailableNow` micro-batches and a continuous trigger.
  */
object StreamAggregates {

  /** Event-time tumbling-window counts with a watermark: late rows beyond
    * the delay are dropped and window state is reclaimed — the bounded-state
    * shape that survives unbounded streams. */
  def windowedTypeCounts(
      events: DataFrame, windowLen: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  case class UserTotal(user_id: Long, events: Long, total_value: Double)

  /** Explicit keyed running state: per-user event counts and value sums
    * maintained across micro-batches via GroupState (the
    * mapGroupsWithState custom-state surface). */
  def runningUserTotals(
      events: Dataset[(Long, Double)]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .mapGroupsWithState[UserTotal, UserTotal] {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(user, 0L, 0.0))
          val batch = rows.toSeq
          val next = UserTotal(
            user,
            prev.events + batch.size,
            prev.total_value + batch.map(_._2).sum)
          state.update(next)
          next
      }
  }
}
