package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mart layer: enriched, analytics-ready readings.
  *
  * Re-expresses the reference mart
  * (reference: dbt_transform/models/marts/mart_temperature_readings.sql:18-106):
  * P7 temperature_category (with its faithful (15,16)/(25,26) fractional
  * gaps), F6/F7 time dimensions (with the Postgres `dow` 0=Sunday offset),
  * P8 environment_condition compound classifier, P9 freshness bucketing.
  *
  * "now" is pinned to a literal so the query is deterministic for the
  * DuckDB oracle (SURVEY §7.5.3); the reference uses `current_date`.
  * All derivations are narrow projections — they fuse into the parent
  * plan's final stage, adding zero shuffles at any scale.
  */
object MartReadings {

  /** Pinned "now" for freshness bucketing: inside the testdata's Jan-2024
    * span so all four freshness buckets are populated. */
  val PinnedNow = "2024-01-31 12:00:00"

  def fromAnomalies(anomalies: DataFrame): DataFrame = {
    val t  = col("temperature_celsius")
    val ts = col("reading_timestamp")
    val now: Column = to_timestamp(lit(PinnedNow))

    anomalies
      // P7 bucketing CASE — gaps faithful: a temperature of 15.5 or 25.5
      // matches no branch and falls to 'Unknown'
      // (reference: mart_temperature_readings.sql:72-79)
      .withColumn("temperature_category",
        when(t < 0, "Freezing")
          .when(t.between(0, 15), "Cold")
          .when(t.between(16, 25), "Comfortable")
          .when(t.between(26, 35), "Warm")
          .when(t > 35, "Hot")
          .otherwise("Unknown"))
      // F6/F7 time dimensions (reference: mart_temperature_readings.sql:82-86).
      // Postgres/DuckDB dow is 0=Sunday..6; Spark dayofweek is 1=Sunday..7.
      .withColumn("reading_hour", hour(ts))
      .withColumn("reading_day_of_week", dayofweek(ts) - 1)
      .withColumn("reading_date", to_date(ts))
      .withColumn("reading_month", month(ts))
      .withColumn("reading_year", year(ts))
      // P8 compound classifier (reference: mart_temperature_readings.sql:89-95)
      .withColumn("environment_condition",
        when(col("environment_type") === "Indoor" && t < 15, "Cold_Indoor")
          .when(col("environment_type") === "Indoor" && t > 30, "Hot_Indoor")
          .when(col("environment_type") === "Outdoor" && t < 0, "Freezing_Outdoor")
          .when(col("environment_type") === "Outdoor" && t > 40, "Extreme_Heat_Outdoor")
          .otherwise("Normal"))
      // P9 freshness vs pinned now + F8 interval arithmetic
      // (reference: mart_temperature_readings.sql:98-103)
      .withColumn("data_freshness",
        when(ts >= now - expr("INTERVAL 1 DAY"), "Recent")
          .when(ts >= now - expr("INTERVAL 7 DAY"), "This_Week")
          .when(ts >= now - expr("INTERVAL 30 DAY"), "This_Month")
          .otherwise("Historical"))
  }

  def fromStaging(staging: DataFrame): DataFrame =
    fromAnomalies(Anomalies.fromStaging(staging))
}
