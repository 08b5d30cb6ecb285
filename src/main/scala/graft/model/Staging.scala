package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.Functions

/** Staging layer: raw readings -> cleaned, validated, quality-scored rows.
  *
  * Re-expresses the reference's staging model
  * (reference: dbt_transform/models/staging/stg_raw_temperature_readings.sql:8-82):
  * range-validated temperature, location default via coalesce, case-insensitive
  * environment classification, multi-field validity flag, weighted quality
  * score. Retargeted at the driver `events` table (TESTDATA.md):
  * user_id -> device, ts -> reading_timestamp, value -> temperature,
  * event_type (+ a deterministic in/out suffix) -> location.
  */
object Staging {

  /** events(event_id, ts, user_id, event_type, value, props) -> standard
    * readings schema. Pure narrow ops — no shuffle; stays in one codegen stage
    * fused with the parquet scan.
    */
  def fromEvents(events: DataFrame): DataFrame = {
    // Deterministic in/out suffix so the Indoor/Outdoor classifier has all
    // three branches to exercise (reference locations end _in / _out).
    val suffix = when(col("user_id") % 3 === 0, lit("_in"))
      .when(col("user_id") % 3 === 1, lit("_out"))
      .otherwise(lit(""))
    // 'view' events act as the missing-location case -> coalesce default
    // (reference: stg_raw_temperature_readings.sql:36).
    val locRaw = when(col("event_type") === "view", lit(null).cast("string"))
      .otherwise(concat(col("event_type"), suffix))
    val location = coalesce(locRaw, lit("Unknown_Room"))

    val deviceId = concat(lit("DEV_"), lpad(col("user_id").cast("string"), 4, "0"))
    // Range-validated measurement: outside [-50, 100] -> NULL
    // (reference: stg_raw_temperature_readings.sql:28-33, vars dbt_project.yml:34-35).
    val temp = when(col("value").isNotNull && col("value").between(-50, 100), col("value"))
      .otherwise(lit(null).cast("double"))

    val loc = lower(location)
    // Case-insensitive containment classification
    // (reference: stg_raw_temperature_readings.sql:39-43).
    val envType = when(loc.contains("_out") || loc.contains("outdoor"), lit("Outdoor"))
      .when(loc.contains("_in") || loc.contains("indoor") || loc.contains("office"), lit("Indoor"))
      .otherwise(lit("Unknown"))

    val base = events.select(
      col("event_id").as("record_id"),
      deviceId.as("device_id"),
      col("ts").as("reading_timestamp"),
      temp.as("temperature_c"),
      location.as("location")
    )

    base
      .withColumn("environment_type", envType)
      // Multi-field validity flag (reference: stg_raw_temperature_readings.sql:64-69).
      .withColumn(
        "is_valid_record",
        when(col("device_id").isNull || trim(col("device_id")) === "", lit(false))
          .when(col("reading_timestamp").isNull, lit(false))
          .when(col("temperature_c").isNull, lit(false))
          .otherwise(lit(true))
      )
      .withColumn(
        "data_quality_score",
        Functions.coreQualityScore(col("device_id"), col("reading_timestamp"), col("temperature_c"))
      )
  }
}
