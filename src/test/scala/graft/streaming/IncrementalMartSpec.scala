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

  test("incremental summary equals the batch summary WITHOUT the winner rows") {
    import graft.model.PipelineSummary
    val root = StreamGate.tempDir("incr_sum_")
    val ev = Tables.events(spark, sf)
    val slices = (0 to 2).map(i => ev.filter(pmod(col("event_id"), lit(3)) === i))
    slices.zipWithIndex.foreach { case (b, i) =>
      IncrementalMart.applyBatch(spark, b, i.toLong, root)
    }
    // redelivery fixpoints: same-id fast path and fresh-id compare-and-set
    IncrementalMart.applyBatch(spark, slices(1), 1L, root)
    IncrementalMart.applyBatch(spark, slices(1), 50L, root)
    // hard proof of "no winners scan": hide the winner rows entirely —
    // the summary must assemble from partials/spartials/tstats alone
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$root/winners"),
      new org.apache.hadoop.fs.Path(s"$root/winners_hidden")))
    val incr = IncrementalMart.materializeSummary(spark, root)
    val batch = PipelineSummary.overall(
      MartReadings.fromStaging(Staging.fromEvents(ev)))
    assert(incr.schema.map(f => (f.name, f.dataType)) ===
      batch.schema.map(f => (f.name, f.dataType)))
    val diff = incr.exceptAll(batch).count() + batch.exceptAll(incr).count()
    assert(diff === 0L,
      s"incremental summary diverged from the batch summary by $diff rows")
  }

  test("materialize on a never-written state returns an empty mart, not a throw") {
    val ev = Tables.events(spark, sf)
    val batchSchema = MartReadings.fromStaging(Staging.fromEvents(ev)).schema
    // no state at all (materialize before any batch)
    val root0 = StreamGate.tempDir("incr_empty0_")
    val m0 = IncrementalMart.materialize(spark, root0)
    assert(m0.count() === 0L)
    assert(m0.schema.map(f => (f.name, f.dataType)) ===
      batchSchema.map(f => (f.name, f.dataType)))
    // empty batches applied: partials dirs exist, winners dir never created
    val root1 = StreamGate.tempDir("incr_empty1_")
    IncrementalMart.applyBatch(spark, ev.filter(lit(false)), 0L, root1)
    val m1 = IncrementalMart.materialize(spark, root1)
    assert(m1.count() === 0L)
    assert(m1.schema.map(f => (f.name, f.dataType)) ===
      batchSchema.map(f => (f.name, f.dataType)))
  }

  test("sentinel partition is sub-bucketed and a batch touches only its own buckets") {
    val root = StreamGate.tempDir("incr_sent_")
    val ev = Tables.events(spark, sf)
    // null-timestamp rows: error events with user_id % 11 == 0 (the
    // Staging mapping's F5 branch) — these land in the sentinel date
    val nullTs = ev.filter(col("event_type") === "error" &&
      pmod(col("user_id"), lit(11)) === 0)
    assert(nullTs.count() > 0, "fixture needs null-timestamp rows")
    IncrementalMart.applyBatch(spark, nullTs, 0L, root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sentDir = new org.apache.hadoop.fs.Path(
      s"$root/winners/win_date=${IncrementalMart.SentinelDate}")
    assert(fs.exists(sentDir))
    val bktDirs = fs.listStatus(sentDir)
      .filter(_.getPath.getName.startsWith("win_bkt=")).map(_.getPath)
    assert(bktDirs.length > 1,
      "sentinel should spread across multiple hash buckets")
    // batch 2: null-ts rows of a single device — only that device's
    // bucket may be rewritten; every other sentinel bucket's content
    // must be byte-untouched (mtimes of the files inside unchanged)
    val oneUser = nullTs.select("user_id").limit(1).head().getLong(0)
    def fileTimes(): Map[String, Long] =
      bktDirs.flatMap(d => fs.listStatus(d).map(f =>
        f.getPath.toString -> f.getModificationTime)).toMap
    val before = fileTimes()
    val expectedBkt = spark.range(1).select(
      pmod(xxhash64(concat(lit("DEV_"),
        lpad(lit(oneUser).cast("string"), 4, "0"))),
        lit(IncrementalMart.SentinelBuckets.toLong)).cast("int")).head().getInt(0)
    IncrementalMart.applyBatch(spark, nullTs.filter(col("user_id") === oneUser),
      100L, root)
    val after = fileTimes()
    val untouched = before.filter { case (p, _) =>
      !p.contains(s"win_bkt=$expectedBkt") }
    assert(untouched.forall { case (p, t) => after.get(p).contains(t) },
      "a single-device sentinel batch rewrote buckets outside its own hash bucket")
  }

  test("a crashed stage commit rolls forward; an unmarked stage rolls back") {
    import org.apache.hadoop.fs.Path
    val root = StreamGate.tempDir("incr_stage_")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val df = spark.range(1).select(lit("a").as("k"), lit(1).as("v"))
      .withColumn("win_date", to_date(lit("2024-01-05")))
      .withColumn("win_bkt", lit(0))
    // marked stage (crash AFTER the _STAGED marker, before/mid-commit):
    // recovery must move its buckets into winners
    df.write.partitionBy("win_date", "win_bkt")
      .parquet(s"$root/stage/batch_id=7/data")
    fs.createNewFile(new Path(s"$root/stage/batch_id=7/_STAGED"))
    // unmarked stage (crash DURING the stage write): recovery must drop it
    df.write.partitionBy("win_date", "win_bkt")
      .parquet(s"$root/stage/batch_id=8/data")
    IncrementalMart.recoverStages(fs, root)
    assert(fs.exists(new Path(s"$root/winners/win_date=2024-01-05/win_bkt=0")))
    assert(!fs.exists(new Path(s"$root/stage/batch_id=7")))
    assert(!fs.exists(new Path(s"$root/stage/batch_id=8")))
    assert(spark.read.parquet(s"$root/winners").count() === 1L)
  }
}
