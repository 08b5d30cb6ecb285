package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ingest.Standardize

/** Structured Streaming ingestion: the reference's micro-batch posture
  * re-expressed natively (SURVEY §2.9 rows T1-T7).
  *
  * Reference behavior: Airflow fires the whole ELT every 30 minutes
  * (iot_temperature_dag.py:203), a FileSensor watches the landing zone
  * (:215-222), and per-file SHA-256 hashes give skip-if-processed
  * idempotence (iot_temperature_pipeline.py:33-39). The Spark-native
  * equivalents, in order: `Trigger.AvailableNow` (process everything
  * pending, then stop — one "Airflow run"), the file-stream source's
  * directory polling, and the checkpointed file-source log (exactly-once
  * at *file* granularity, subsuming the hash-skip logic — T3).
  *
  * The model chain runs inside `foreachBatch` as a stateless full
  * recompute per batch, matching the reference's `full_refresh: True`
  * dbt invocation (T5 — no watermarks/stateful ops needed for parity).
  */
object IngestStream {

  /** T2/T6: file-stream source over the landing zone; `maxFilesPerTrigger`
    * mirrors dlt's extract buffering (config.toml:19-21). */
  def source(spark: SparkSession, landingZone: String, maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .option("header", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .schema(Standardize.KaggleSchema)
      .csv(landingZone)

  /** T1/T3/T5: one micro-batch "pipeline run" — standardize each batch and
    * append it to the raw layer, with checkpointed exactly-once file
    * tracking. `transform` defaults to the standardize mapping; callers
    * can compose the full staging→mart chain on top. */
  def run(
      spark: SparkSession,
      landingZone: String,
      rawOut: String,
      checkpoint: String,
      transform: DataFrame => DataFrame = Standardize.standardize): StreamingQuery = {
    source(spark, landingZone).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        transform(batch)
          .withColumn("_batch_id", org.apache.spark.sql.functions.lit(batchId))
          .write.mode("append").parquet(rawOut)
        ()
      }
      .start()
  }
}
