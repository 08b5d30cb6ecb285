package graft.model

import graft.expr.Exact._

/** DuckDB oracle SQL for the IoT model-chain queries.
  *
  * Each string mirrors the corresponding Spark implementation *expression by
  * expression* (same operand order, same explicit DOUBLE casts, same
  * Exact.* decimal-sum aggregates) so the driver's hash-compare sees
  * bit-identical floats. See [[graft.expr.Exact]] for why.
  *
  * Layer lineage mirrors the reference dbt DAG:
  * raw -> staging (stg_raw_temperature_readings.sql) -> valid/dedup + stats +
  * joins (int_temperature_anomalies.sql) -> mart (mart_temperature_readings
  * .sql) -> summaries (mart_pipeline_summary.sql).
  */
object IotOracle {

  /** events -> raw readings mapping; mirrors [[Staging.rawReadings]]. */
  private val rawReadings = """
raw_readings AS (
  SELECT
    event_id AS record_id,
    CASE WHEN user_id % 97 = 0 THEN NULL
         WHEN user_id % 89 = 0 THEN ' '
         ELSE 'DEV_' || lpad(CAST(user_id AS VARCHAR), 4, '0') END AS device_id,
    CASE WHEN event_type = 'error' AND user_id % 11 = 0 THEN NULL ELSE ts END AS reading_timestamp,
    (value % CAST(170.0 AS DOUBLE)) - CAST(60.0 AS DOUBLE) AS temperature_raw,
    CASE WHEN event_type = 'view' THEN NULL
         ELSE event_type || (CASE WHEN user_id % 3 = 0 THEN '_in'
                                  WHEN user_id % 3 = 1 THEN '_out'
                                  ELSE '' END) END AS location_raw
  FROM events
  WHERE event_id IS NOT NULL
)"""

  /** Mirrors [[Staging.fromRaw]]. */
  private val staging = s"""
cleaned AS (
  SELECT
    record_id, device_id, reading_timestamp,
    CASE WHEN temperature_raw IS NOT NULL
              AND temperature_raw BETWEEN CAST(-50.0 AS DOUBLE) AND CAST(100.0 AS DOUBLE)
         THEN CAST(CAST(temperature_raw AS DECIMAL(5,2)) AS DOUBLE) ELSE NULL END AS temperature_celsius,
    COALESCE(location_raw, 'Unknown_Room') AS location
  FROM raw_readings
),
staging AS (
  SELECT *,
    CASE WHEN contains(lower(location), '_out') OR contains(lower(location), 'outdoor') THEN 'Outdoor'
         WHEN contains(lower(location), '_in') OR contains(lower(location), 'indoor')
              OR contains(lower(location), 'office') THEN 'Indoor'
         ELSE 'Unknown' END AS environment_type,
    CASE WHEN device_id IS NULL OR trim(device_id) = '' THEN false
         WHEN reading_timestamp IS NULL THEN false
         WHEN temperature_celsius IS NULL THEN false
         ELSE true END AS is_valid_record,
    (CASE WHEN device_id IS NOT NULL AND trim(device_id) <> '' THEN 4 ELSE 0 END +
     CASE WHEN reading_timestamp IS NOT NULL THEN 4 ELSE 0 END +
     CASE WHEN temperature_celsius IS NOT NULL THEN 2 ELSE 0 END) / CAST(10.0 AS DOUBLE)
      AS data_quality_score
  FROM cleaned
)"""

  private val stagingCols =
    "record_id, device_id, reading_timestamp, temperature_celsius, location, " +
      "environment_type, is_valid_record, data_quality_score"

  /** Mirrors [[Anomalies.validReadings]]. */
  private val valid = s"""
dedup AS (
  SELECT *, row_number() OVER (
      PARTITION BY device_id, date_trunc('minute', reading_timestamp)
      ORDER BY record_id DESC) AS rn
  FROM staging
),
valid AS (
  SELECT $stagingCols
  FROM dedup
  WHERE rn = 1 AND is_valid_record AND temperature_celsius IS NOT NULL
)"""

  private val tD = "CAST(temperature_celsius AS DOUBLE)"

  /** Mirrors the stats + joins + scoring in [[Anomalies.fromStaging]]. */
  private val anomalies = s"""
global_stats AS (
  SELECT ${davgSql(tD)} AS global_mean_temp,
         ${dstdSql(tD)} AS global_stddev_temp
  FROM valid
),
device_stats AS (
  SELECT device_id,
         ${davgSql(tD)} AS device_mean_temp,
         ${dstdSql(tD)} AS device_stddev_temp,
         COUNT(*) AS device_reading_count
  FROM valid GROUP BY device_id HAVING COUNT(*) >= 5
),
location_stats AS (
  SELECT location,
         ${davgSql(tD)} AS location_mean_temp,
         ${dstdSql(tD)} AS location_stddev_temp
  FROM valid WHERE location IS NOT NULL
  GROUP BY location HAVING COUNT(*) >= 10
),
environment_stats AS (
  SELECT environment_type,
         ${davgSql(tD)} AS environment_mean_temp,
         ${dstdSql(tD)} AS environment_stddev_temp
  FROM valid WHERE environment_type IS NOT NULL
  GROUP BY environment_type HAVING COUNT(*) >= 5
),
calc AS (
  SELECT vr.*,
    gs.global_mean_temp, gs.global_stddev_temp,
    ds.device_mean_temp, ds.device_stddev_temp, ds.device_reading_count,
    ls.location_mean_temp, ls.location_stddev_temp,
    es.environment_mean_temp, es.environment_stddev_temp,
    CASE WHEN gs.global_stddev_temp > 0
         THEN abs(CAST(vr.temperature_celsius AS DOUBLE) - gs.global_mean_temp) / gs.global_stddev_temp
         ELSE CAST(0.0 AS DOUBLE) END AS global_z_score,
    CASE WHEN ds.device_stddev_temp > 0 AND ds.device_reading_count >= 5
         THEN abs(CAST(vr.temperature_celsius AS DOUBLE) - ds.device_mean_temp) / ds.device_stddev_temp
         ELSE NULL END AS device_z_score,
    CASE WHEN ls.location_stddev_temp > 0
         THEN abs(CAST(vr.temperature_celsius AS DOUBLE) - ls.location_mean_temp) / ls.location_stddev_temp
         ELSE NULL END AS location_z_score,
    CASE WHEN es.environment_stddev_temp > 0
         THEN abs(CAST(vr.temperature_celsius AS DOUBLE) - es.environment_mean_temp) / es.environment_stddev_temp
         ELSE NULL END AS environment_z_score
  FROM valid vr
  CROSS JOIN global_stats gs
  LEFT JOIN device_stats ds ON vr.device_id = ds.device_id
  LEFT JOIN location_stats ls ON vr.location = ls.location
  LEFT JOIN environment_stats es ON vr.environment_type = es.environment_type
),
anomalies AS (
  SELECT *,
    CASE WHEN global_z_score > 3.0 THEN true ELSE false END AS is_global_anomaly,
    CASE WHEN device_z_score > 2.5 THEN true ELSE false END AS is_device_anomaly,
    CASE WHEN location_z_score > 2.5 THEN true ELSE false END AS is_location_anomaly,
    CASE WHEN environment_z_score > 2.5 THEN true ELSE false END AS is_environment_anomaly,
    CASE WHEN global_z_score > 3.0 OR device_z_score > 2.5
           OR location_z_score > 2.5 OR environment_z_score > 2.5
         THEN true ELSE false END AS is_anomaly,
    greatest(COALESCE(global_z_score, CAST(0.0 AS DOUBLE)),
             COALESCE(device_z_score, CAST(0.0 AS DOUBLE)),
             COALESCE(location_z_score, CAST(0.0 AS DOUBLE)),
             COALESCE(environment_z_score, CAST(0.0 AS DOUBLE))) AS anomaly_score
  FROM calc
)"""

  /** Mirrors [[MartReadings.fromAnomalies]]. */
  private val mart = s"""
mart AS (
  SELECT *,
    CASE WHEN temperature_celsius < 0 THEN 'Freezing'
         WHEN temperature_celsius BETWEEN 0 AND 15 THEN 'Cold'
         WHEN temperature_celsius BETWEEN 16 AND 25 THEN 'Comfortable'
         WHEN temperature_celsius BETWEEN 26 AND 35 THEN 'Warm'
         WHEN temperature_celsius > 35 THEN 'Hot'
         ELSE 'Unknown' END AS temperature_category,
    CAST(hour(reading_timestamp) AS INT) AS reading_hour,
    CAST(dayofweek(reading_timestamp) AS INT) AS reading_day_of_week,
    CAST(reading_timestamp AS DATE) AS reading_date,
    CAST(month(reading_timestamp) AS INT) AS reading_month,
    CAST(year(reading_timestamp) AS INT) AS reading_year,
    CASE WHEN environment_type = 'Indoor' AND temperature_celsius < 15 THEN 'Cold_Indoor'
         WHEN environment_type = 'Indoor' AND temperature_celsius > 30 THEN 'Hot_Indoor'
         WHEN environment_type = 'Outdoor' AND temperature_celsius < 0 THEN 'Freezing_Outdoor'
         WHEN environment_type = 'Outdoor' AND temperature_celsius > 40 THEN 'Extreme_Heat_Outdoor'
         ELSE 'Normal' END AS environment_condition,
    CASE WHEN reading_timestamp >= TIMESTAMP '${MartReadings.PinnedNow}' - INTERVAL 1 DAY THEN 'Recent'
         WHEN reading_timestamp >= TIMESTAMP '${MartReadings.PinnedNow}' - INTERVAL 7 DAY THEN 'This_Week'
         WHEN reading_timestamp >= TIMESTAMP '${MartReadings.PinnedNow}' - INTERVAL 30 DAY THEN 'This_Month'
         ELSE 'Historical' END AS data_freshness
  FROM anomalies
)"""

  /** Raw-readings CTE prefix for row-level audits that sit BEFORE the
    * staging cleanup (the reference's `iot_metadata.data_quality_issues`
    * is keyed to `iot_raw.temperature_readings`,
    * sql/002_create_tables.sql:56-66). */
  val rawReadingsCte: String = s"WITH $rawReadings"

  private def chainTo(level: String): String = level match {
    case "staging"   => s"WITH $rawReadings, $staging"
    case "valid"     => s"WITH $rawReadings, $staging, $valid"
    case "anomalies" => s"WITH $rawReadings, $staging, $valid, $anomalies"
    case "mart"      => s"WITH $rawReadings, $staging, $valid, $anomalies, $mart"
  }

  val stgReadings: String =
    s"${chainTo("staging")} SELECT $stagingCols FROM staging"

  val intAnomalies: String =
    s"${chainTo("anomalies")} SELECT * FROM anomalies"

  val martReadings: String =
    s"${chainTo("mart")} SELECT * FROM mart"

  /** Mirrors [[PipelineSummary.overall]]. */
  val martSummary: String = {
    val qd = "data_quality_score"
    s"""${chainTo("mart")},
agg AS (
  SELECT
    COUNT(*) AS total_processed_records,
    ${cntIfSql("is_valid_record")} AS total_valid_records,
    ${cntIfSql("NOT is_valid_record")} AS total_invalid_records,
    ${cntIfSql("is_anomaly")} AS total_anomalies,
    ${davgSql(tD)} AS global_avg_temperature,
    MIN(temperature_celsius) AS global_min_temperature,
    MAX(temperature_celsius) AS global_max_temperature,
    ${dstdSql(tD)} AS global_temperature_stddev,
    ${davgSql(qd)} AS global_avg_quality_score,
    MIN($qd) AS global_min_quality_score,
    MAX($qd) AS global_max_quality_score,
    COUNT(DISTINCT device_id) AS total_unique_devices,
    COUNT(DISTINCT location) AS total_unique_locations,
    COUNT(DISTINCT environment_type) AS total_environment_types,
    COUNT(DISTINCT CAST(reading_timestamp AS DATE)) AS total_load_batches,
    MIN(reading_timestamp) AS earliest_reading_timestamp,
    MAX(reading_timestamp) AS latest_reading_timestamp,
    ((epoch_us(MAX(reading_timestamp)) - epoch_us(MIN(reading_timestamp)))
      / CAST(86400000000.0 AS DOUBLE)) AS data_span_days,
    ${cntIfSql("environment_type = 'Indoor'")} AS indoor_readings,
    ${cntIfSql("environment_type = 'Outdoor'")} AS outdoor_readings,
    ${cntIfSql("environment_type = 'Unknown'")} AS unknown_environment_readings
  FROM mart
)
SELECT *,
  round(CAST(total_valid_records AS DOUBLE) / CAST(total_processed_records AS DOUBLE) * CAST(100.0 AS DOUBLE), 2) AS valid_record_percentage,
  round(CAST(total_anomalies AS DOUBLE) / CAST(total_processed_records AS DOUBLE) * CAST(100.0 AS DOUBLE), 2) AS anomaly_percentage,
  round(CAST(indoor_readings AS DOUBLE) / CAST(total_processed_records AS DOUBLE) * CAST(100.0 AS DOUBLE), 2) AS indoor_percentage,
  round(CAST(outdoor_readings AS DOUBLE) / CAST(total_processed_records AS DOUBLE) * CAST(100.0 AS DOUBLE), 2) AS outdoor_percentage
FROM agg"""
  }

  /** Mirrors [[PipelineSummary.byLoad]] (over staging). */
  val summaryByLoad: String = {
    val qd = "data_quality_score"
    s"""${chainTo("staging")}
SELECT
  CAST(reading_timestamp AS DATE) AS load_day,
  COUNT(*) AS total_records,
  ${cntIfSql("is_valid_record")} AS valid_records,
  ${cntIfSql("NOT is_valid_record")} AS invalid_records,
  ${davgSql(qd)} AS avg_data_quality_score,
  MIN($qd) AS min_data_quality_score,
  MAX($qd) AS max_data_quality_score,
  COUNT(DISTINCT device_id) AS unique_devices,
  COUNT(DISTINCT location) AS unique_locations,
  COUNT(DISTINCT environment_type) AS unique_environments,
  MIN(reading_timestamp) AS earliest_reading,
  MAX(reading_timestamp) AS latest_reading
FROM staging
GROUP BY CAST(reading_timestamp AS DATE)"""
  }

  /** Mirrors [[PipelineSummary.byDevice]]. */
  val summaryByDevice: String =
    s"""${chainTo("mart")}
SELECT
  device_id,
  COUNT(*) AS total_readings,
  ${cntIfSql("is_anomaly")} AS anomaly_count,
  ${davgSql(tD)} AS avg_temperature,
  MIN(temperature_celsius) AS min_temperature,
  MAX(temperature_celsius) AS max_temperature,
  ${dstdSql(tD)} AS temperature_stddev,
  ${davgSql("data_quality_score")} AS avg_quality_score,
  MIN(reading_timestamp) AS first_reading,
  MAX(reading_timestamp) AS last_reading,
  ((epoch_us(MAX(reading_timestamp)) - epoch_us(MIN(reading_timestamp)))
    / CAST(3600000000.0 AS DOUBLE)) AS reading_span_hours,
  COUNT(DISTINCT CAST(reading_timestamp AS DATE)) AS active_days,
  COUNT(DISTINCT location) AS locations_visited,
  COUNT(DISTINCT environment_type) AS environments_recorded
FROM mart
GROUP BY device_id"""

  /** Mirrors [[PipelineSummary.byLocation]]. */
  val summaryByLocation: String =
    s"""${chainTo("mart")}
SELECT
  location, environment_type,
  COUNT(*) AS total_readings,
  COUNT(DISTINCT device_id) AS unique_devices,
  ${davgSql(tD)} AS avg_temperature,
  MIN(temperature_celsius) AS min_temperature,
  MAX(temperature_celsius) AS max_temperature,
  ${dstdSql(tD)} AS temperature_stddev,
  ${cntIfSql("is_anomaly")} AS anomaly_count,
  ${davgSql("data_quality_score")} AS avg_quality_score
FROM mart
WHERE location IS NOT NULL AND environment_type IS NOT NULL
GROUP BY location, environment_type"""

  /** Mirrors SparkEntry's `ops_row_counts` (U2, run-pipeline.sh:89-109). */
  val opsRowCounts: String =
    s"""${chainTo("anomalies")}
SELECT 'staging' AS layer, COUNT(*) AS row_count FROM staging
UNION ALL
SELECT 'valid', COUNT(*) FROM anomalies
UNION ALL
SELECT 'anomalous', COUNT(*) FROM anomalies WHERE is_anomaly"""

  /** Mirrors [[PipelineSummary.anomalyBreakdown]]. */
  val anomalyBreakdown: String = {
    def scope(tag: String, flag: String, z: String): String =
      s"""SELECT '$tag' AS anomaly_type,
  ${cntIfSql(flag)} AS anomaly_count,
  ${davgSql(s"CASE WHEN $flag THEN $z ELSE NULL END")} AS avg_z_score
FROM mart"""
    s"""${chainTo("mart")}
${scope("Global Anomalies", "is_global_anomaly", "global_z_score")}
UNION ALL
${scope("Device Anomalies", "is_device_anomaly", "device_z_score")}
UNION ALL
${scope("Location Anomalies", "is_location_anomaly", "location_z_score")}
UNION ALL
${scope("Environment Anomalies", "is_environment_anomaly", "environment_z_score")}"""
  }
}
