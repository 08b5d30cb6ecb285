package graft

import org.apache.spark.sql.SparkSession

/** Session construction shared by Verify / Bench / tests.
  *
  * All session-level semantics knobs live here (not hidden inside loaders —
  * see VERDICT round 1, "Tables.events mutates session config"):
  *
  *  - `spark.sql.legacy.parquet.nanosAsLong`: the driver testdata `events.ts`
  *    column is parquet TIMESTAMP(NANOS), which Spark's reader otherwise
  *    rejects ([PARQUET_TYPE_ILLEGAL]). With the flag the nanos arrive as a
  *    plain long and [[Tables.events]] truncates to microseconds — the same
  *    truncation DuckDB applies reading the same file, so the oracle sees
  *    identical timestamps.
  *  - `spark.sql.ansi.enabled=false`: the reference's semantics are
  *    PostgreSQL-with-silent-NULL at the points we need them (range-guarded
  *    casts, to_timestamp null-on-fail — reference:
  *    dbt_transform/models/staging/stg_raw_temperature_readings.sql:28-33,
  *    dlt_ingest/iot_temperature_pipeline.py:157). Queries still use guarded
  *    expressions / try_* so they'd also run under ANSI, but pinning the mode
  *    removes a whole class of run-time-crash drift vs Spark 4 defaults.
  *  - shuffle partitions sized to the local core count — on a real cluster
  *    this would be tuned to ~2-3x total executor cores / AQE-coalesced.
  */
object Sessions {
  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .withExtensions(new graft.expr.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // r17 (guide §2.2/§2.4): let AQE size CACHED plans too. By default
      // persist() pins the pre-adaptive shuffle partition count, so every
      // persisted layer materializes at spark.sql.shuffle.partitions
      // regardless of size, unions of persisted frames STACK those counts
      // (the superstep family's checkpointed `visited` frames reached ~100
      // near-empty partitions at sf0.1), and every downstream read pays
      // one task per pinned partition — measured as the dominant cost of
      // the graph queries (ProfileS: 40-60 ms task deserialize × ~100
      // tasks × ~25 stages with near-zero executor run time). With AQE
      // allowed to re-plan cached output partitioning, cached/persisted
      // frames coalesce to the advisory byte target like any other
      // exchange — scale-adaptive in both directions (few partitions at
      // sf0.1, many at 100 TB), not a local[32] constant.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Apply the semantics knobs to an externally built session (e.g. the
    * driver's own session invoking [[SparkEntry.entry]]). Runtime-settable
    * confs only; idempotent.
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark
  }
}
