package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Driver-side replays for the temporal sequence operators that aren't
  * already covered by RelationalSpec's as-of/sessionization checks. */
class TemporalSpec extends SparkSpec {

  test("rle_compress_stats matches a driver-side run-length replay") {
    val rows = Temporal.queries("rle_compress_stats")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    // replay: per user, sort by (ts, event_id), split into maximal runs.
    // ts is collected as unix MICROS, not Timestamp.getTime (millis): the
    // query's window orders by full-precision ts, and two same-user events
    // differing only in sub-millisecond micros would sort differently in a
    // millisecond replay (ADVICE r13)
    val events = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val runs = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val seq = es.sortBy(e => (e._2, e._3)).map(_._4)
      // fold into (type, runLength) pairs
      seq.foldLeft(List.empty[(String, Long)]) {
        case ((t, n) :: rest, e) if t == e => (t, n + 1) :: rest
        case (acc, e)                      => (e, 1L) :: acc
      }
    }
    val expect = runs.groupBy(_._1).map { case (t, rs) =>
      t -> ((rs.size.toLong, rs.map(_._2).sum, rs.map(_._2).max,
        rs.map(_._2).sum.toDouble / rs.size.toDouble))
    }
    assert(rows === expect)
    // vacuous unless some run is longer than 1 (compression actually bites)
    assert(rows.values.exists(_._3 > 1L))
    // total events across types must equal the event count
    assert(rows.values.map(_._2).sum === events.length.toLong)
  }
}
