package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.{Anomalies, MartReadings, PipelineSummary, Staging}
import graft.sources.Sinks

/** The orchestrated end-to-end run — SURVEY §3.1's flagship entry point
  * re-expressed as one in-process driver program: CSV landing zone →
  * standardize (+ lineage metadata) → staging → anomaly intermediate →
  * mart (materialized) → summaries, with the raw layer appended for
  * idempotent re-runs.
  *
  * Where the reference crosses five process boundaries (Airflow → dlt
  * subprocess → Postgres → dbt → Postgres), this is function composition
  * over lazy DataFrames: the only materialization points are the two
  * writes, exactly the view-vs-table split of the reference's dbt configs.
  */
object IotPipeline {

  case class Result(
      rawCount: Long, stagedCount: Long, martCount: Long,
      mart: DataFrame, summary: DataFrame)

  /** One pipeline run (the 30-minute Airflow cycle's work). The staging→
    * mart chain here expects the standard reading schema; `asReadings`
    * adapts the standardized CSV rows to the staging contract. */
  def run(spark: SparkSession, landingZone: String, outDir: String): Result = {
    import org.apache.spark.sql.functions._

    val csv = Standardize.readCsv(spark, landingZone)
    val hashes = Standardize.fileHashes(spark, landingZone)
    // the hidden `_metadata` struct must be projected while the plan is
    // still the file scan
    val raw = Standardize.withFileMetadata(csv.select(col("*"), col("_metadata")), hashes)
    val std = Standardize.standardize(csv)

    // raw layer: append-only with deterministic keys (S5)
    Sinks.append(raw.drop("ingestion_timestamp"), s"$outDir/raw")

    // model chain over the standardized readings
    val readings = std.select(
      monotonically_increasing_id().as("record_id"),
      col("device_id"),
      col("timestamp").as("reading_timestamp"),
      col("temperature").as("temperature_raw"),
      col("location").as("location_raw"))
    val staged = Staging.fromRaw(readings)
    val mart = MartReadings.fromAnomalies(Anomalies.fromStaging(staged))

    // mart layer: full-refresh table materialization (S6)
    Sinks.overwrite(mart, s"$outDir/mart_temperature_readings")
    val martBack = spark.read.parquet(s"$outDir/mart_temperature_readings")

    Result(
      rawCount = raw.count(),
      stagedCount = staged.count(),
      martCount = martBack.count(),
      mart = martBack,
      summary = PipelineSummary.overall(martBack))
  }
}
