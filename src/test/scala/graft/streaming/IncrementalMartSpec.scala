package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.model.{MartReadings, Staging}

/** The incremental mart state machine must equal the batch chain under
  * arbitrary batch slicing AND under re-delivery — including the subtle
  * dedup contract: an invalid row with a higher record_id shadows a valid
  * one in its (device, minute) group, so winner state competes over ALL
  * staged rows, and a later batch's winner retracts an earlier batch's
  * contribution from the moment partials. */
class IncrementalMartSpec extends SparkSpec {

  test("sliced incremental application + materialize equals the batch mart") {
    val root = StreamGate.tempDir("incr_spec_")
    val ev = Tables.events(spark, sf)
    // 3 deterministic slices that split (device, minute) groups across
    // batches (event_id mod), so cross-batch winner replacement happens
    val slices = (0 to 2).map(i => ev.filter(pmod(col("event_id"), lit(3)) === i))
    slices.zipWithIndex.foreach { case (b, i) =>
      IncrementalMart.applyBatch(spark, b, i.toLong, root)
    }
    // re-deliver every batch once under its OWN id (the applied-marker
    // fast path) and once under a FRESH id (the compare-and-set path: no
    // marker, winners already updated, so the delta must collapse to
    // empty) — both must be fixpoints
    slices.zipWithIndex.foreach { case (b, i) =>
      IncrementalMart.applyBatch(spark, b, i.toLong, root)
    }
    slices.zipWithIndex.foreach { case (b, i) =>
      IncrementalMart.applyBatch(spark, b, 100L + i, root)
    }
    val incr = IncrementalMart.materialize(spark, root)
    val batch = MartReadings.fromStaging(Staging.fromEvents(ev))
    assert(incr.schema.map(f => (f.name, f.dataType)) ===
      batch.schema.map(f => (f.name, f.dataType)))
    val diff = incr.exceptAll(batch).count() + batch.exceptAll(incr).count()
    assert(diff === 0L,
      s"incremental mart diverged from the batch chain by $diff rows")
  }
}
