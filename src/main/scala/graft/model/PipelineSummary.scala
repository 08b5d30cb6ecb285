package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.Exact

/** Summary mart: pipeline observability statistics.
  *
  * Re-expresses the reference summary mart
  * (reference: dbt_transform/models/marts/mart_pipeline_summary.sql:10-154)
  * INCLUDING its four dead CTEs (`load_level_stats`, `device_level_stats`,
  * `location_level_stats`, `anomaly_analysis`) promoted to live queries per
  * SURVEY §1.3 — the reference defines them and its README queries them, but
  * its `final_summary` never references them.
  *
  * Scale shape: each function is a single groupBy (map-side partial agg +
  * one shuffle). `overall` and `anomalyBreakdown` aggregate to a handful of
  * rows; the caller should cache the mart once when running several of these
  * in one pass (SURVEY §4 materialization note).
  */
object PipelineSummary {

  private val t = col("temperature_celsius").cast("double")
  private val q = col("data_quality_score")

  /** One-row overall stats + derived percentages: A5/A7/A9/A12/A13 + P13
    * (reference: mart_pipeline_summary.sql:68-104,138-154). The reference's
    * `summary_generated_at`/`calculated_at` (current_timestamp) are omitted:
    * nondeterministic, excluded per SURVEY §5 oracle rules. */
  /** overall()'s output column set — the contract the incremental summary
    * materialization (streaming/IncrementalMart.materializeSummary)
    * projects to, so both paths stay column-identical. */
  val overallColumns: Seq[String] = Seq(
    "total_processed_records", "total_valid_records", "total_invalid_records",
    "total_anomalies", "global_avg_temperature", "global_min_temperature",
    "global_max_temperature", "global_temperature_stddev",
    "global_avg_quality_score", "global_min_quality_score",
    "global_max_quality_score", "total_unique_devices",
    "total_unique_locations", "total_environment_types", "total_load_batches",
    "earliest_reading_timestamp", "latest_reading_timestamp", "data_span_days",
    "indoor_readings", "outdoor_readings", "unknown_environment_readings",
    "valid_record_percentage", "anomaly_percentage", "indoor_percentage",
    "outdoor_percentage")

  def overall(mart: DataFrame): DataFrame = {
    val agg = mart.agg(
      count(lit(1)).as("total_processed_records"),
      Exact.cntIf(col("is_valid_record")).as("total_valid_records"),
      Exact.cntIf(!col("is_valid_record")).as("total_invalid_records"),
      Exact.cntIf(col("is_anomaly")).as("total_anomalies"),
      Exact.davg(t).as("global_avg_temperature"),
      min(col("temperature_celsius")).as("global_min_temperature"),
      max(col("temperature_celsius")).as("global_max_temperature"),
      Exact.dstd(t).as("global_temperature_stddev"),
      Exact.davg(q).as("global_avg_quality_score"),
      min(q).as("global_min_quality_score"),
      max(q).as("global_max_quality_score"),
      countDistinct(col("device_id")).as("total_unique_devices"),
      countDistinct(col("location")).as("total_unique_locations"),
      countDistinct(col("environment_type")).as("total_environment_types"),
      // load batch := ingest day (retarget of _dlt_load_id, SURVEY §7.3)
      countDistinct(to_date(col("reading_timestamp"))).as("total_load_batches"),
      min(col("reading_timestamp")).as("earliest_reading_timestamp"),
      max(col("reading_timestamp")).as("latest_reading_timestamp"),
      // A9/F9 epoch span — integer micros difference, one double divide
      ((unix_micros(max(col("reading_timestamp"))) -
        unix_micros(min(col("reading_timestamp")))) / lit(86400e6)).as("data_span_days"),
      Exact.cntIf(col("environment_type") === "Indoor").as("indoor_readings"),
      Exact.cntIf(col("environment_type") === "Outdoor").as("outdoor_readings"),
      Exact.cntIf(col("environment_type") === "Unknown").as("unknown_environment_readings")
    )
    // P13 percentages (reference: mart_pipeline_summary.sql:143-146)
    def pct(n: String) = round(
      col(n).cast("double") / col("total_processed_records").cast("double") * lit(100.0), 2)
    agg
      .withColumn("valid_record_percentage", pct("total_valid_records"))
      .withColumn("anomaly_percentage", pct("total_anomalies"))
      .withColumn("indoor_percentage", pct("indoor_readings"))
      .withColumn("outdoor_percentage", pct("outdoor_readings"))
      .select(overallColumns.map(col): _*)
  }

  /** Per-load-batch stats (the reference's dead `load_level_stats` CTE,
    * reference: mart_pipeline_summary.sql:10-29), run over STAGING so the
    * valid/invalid split is non-degenerate (the mart is all-valid by
    * construction). Load batch := ingest day. */
  def byLoad(staging: DataFrame): DataFrame =
    staging
      .groupBy(to_date(col("reading_timestamp")).as("load_day"))
      .agg(
        count(lit(1)).as("total_records"),
        Exact.cntIf(col("is_valid_record")).as("valid_records"),
        Exact.cntIf(!col("is_valid_record")).as("invalid_records"),
        Exact.davg(q).as("avg_data_quality_score"),
        min(q).as("min_data_quality_score"),
        max(q).as("max_data_quality_score"),
        countDistinct(col("device_id")).as("unique_devices"),
        countDistinct(col("location")).as("unique_locations"),
        countDistinct(col("environment_type")).as("unique_environments"),
        min(col("reading_timestamp")).as("earliest_reading"),
        max(col("reading_timestamp")).as("latest_reading")
      )

  /** Per-device stats (dead `device_level_stats` CTE,
    * reference: mart_pipeline_summary.sql:31-49): A8 distinct-days, A9
    * epoch-hours span, per-device anomaly counts. */
  def byDevice(mart: DataFrame): DataFrame =
    mart
      .groupBy("device_id")
      .agg(
        count(lit(1)).as("total_readings"),
        Exact.cntIf(col("is_anomaly")).as("anomaly_count"),
        Exact.davg(t).as("avg_temperature"),
        min(col("temperature_celsius")).as("min_temperature"),
        max(col("temperature_celsius")).as("max_temperature"),
        Exact.dstd(t).as("temperature_stddev"),
        Exact.davg(q).as("avg_quality_score"),
        min(col("reading_timestamp")).as("first_reading"),
        max(col("reading_timestamp")).as("last_reading"),
        ((unix_micros(max(col("reading_timestamp"))) -
          unix_micros(min(col("reading_timestamp")))) / lit(3600e6)).as("reading_span_hours"),
        countDistinct(to_date(col("reading_timestamp"))).as("active_days"),
        countDistinct(col("location")).as("locations_visited"),
        countDistinct(col("environment_type")).as("environments_recorded")
      )

  /** Per-(location, environment) stats (dead `location_level_stats` CTE,
    * reference: mart_pipeline_summary.sql:51-66): A10 multi-key groupBy. */
  def byLocation(mart: DataFrame): DataFrame =
    mart
      .filter(col("location").isNotNull && col("environment_type").isNotNull)
      .groupBy("location", "environment_type")
      .agg(
        count(lit(1)).as("total_readings"),
        countDistinct(col("device_id")).as("unique_devices"),
        Exact.davg(t).as("avg_temperature"),
        min(col("temperature_celsius")).as("min_temperature"),
        max(col("temperature_celsius")).as("max_temperature"),
        Exact.dstd(t).as("temperature_stddev"),
        Exact.cntIf(col("is_anomaly")).as("anomaly_count"),
        Exact.davg(q).as("avg_quality_score")
      )

  /** U1 4-way UNION ALL anomaly-type breakdown with A6 filtered averages
    * (dead `anomaly_analysis` CTE, reference: mart_pipeline_summary.sql:106-136).
    *
    * Computed as ONE aggregation over the mart (8 aggregate columns) then
    * unpivoted with `stack` — the reference's four scalar CTEs would scan
    * the mart four times; at 100 TB that is three scans saved for an
    * identical result set. */
  def anomalyBreakdown(mart: DataFrame): DataFrame = {
    val scopes = Seq(
      ("Global Anomalies", "is_global_anomaly", "global_z_score"),
      ("Device Anomalies", "is_device_anomaly", "device_z_score"),
      ("Location Anomalies", "is_location_anomaly", "location_z_score"),
      ("Environment Anomalies", "is_environment_anomaly", "environment_z_score"))
    val aggs = scopes.zipWithIndex.flatMap { case ((_, flag, z), i) =>
      Seq(
        Exact.cntIf(col(flag)).as(s"c$i"),
        Exact.davg(when(col(flag), col(z))).as(s"a$i"))
    }
    val stackArgs = scopes.zipWithIndex
      .map { case ((tag, _, _), i) => s"'$tag', c$i, a$i" }
      .mkString(", ")
    mart.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(4, $stackArgs) AS (anomaly_type, anomaly_count, avg_z_score)")
  }
}
