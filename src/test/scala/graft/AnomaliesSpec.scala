package graft

import org.apache.spark.sql.functions._

import graft.model.{Anomalies, Staging}

/** Semantics checks for the intermediate anomaly model
  * (reference: dbt_transform/models/intermediate/int_temperature_anomalies.sql). */
class AnomaliesSpec extends SparkSpec {

  private lazy val stg = Staging.fromEvents(Tables.events(spark, sf))
  private lazy val anom = Anomalies.fromStaging(stg).cache()

  test("dedup leaves one row per (device_id, minute)") {
    val dups = anom
      .groupBy(col("device_id"), date_trunc("minute", col("reading_timestamp")))
      .count().filter(col("count") > 1)
    assert(dups.count() === 0)
  }

  test("only valid readings survive") {
    assert(anom.filter(!col("is_valid_record") || col("temperature_celsius").isNull).count() === 0)
  }

  test("z-scores are non-negative where present") {
    for (c <- Seq("global_z_score", "device_z_score", "location_z_score", "environment_z_score"))
      assert(anom.filter(col(c) < 0).count() === 0, c)
  }

  test("flags match their thresholds (3.0 global, 2.5 scoped)") {
    assert(anom.filter(col("is_global_anomaly") =!=
      coalesce(col("global_z_score") > 3.0, lit(false))).count() === 0)
    for ((f, z) <- Seq("is_device_anomaly" -> "device_z_score",
                       "is_location_anomaly" -> "location_z_score",
                       "is_environment_anomaly" -> "environment_z_score"))
      assert(anom.filter(col(f) =!= coalesce(col(z) > 2.5, lit(false))).count() === 0, f)
  }

  test("is_anomaly is the OR of the four flags") {
    val or = col("is_global_anomaly") || col("is_device_anomaly") ||
      col("is_location_anomaly") || col("is_environment_anomaly")
    assert(anom.filter(col("is_anomaly") =!= or).count() === 0)
  }

  test("anomaly_score is the greatest coalesced z-score") {
    val g = greatest(
      coalesce(col("global_z_score"), lit(0.0)),
      coalesce(col("device_z_score"), lit(0.0)),
      coalesce(col("location_z_score"), lit(0.0)),
      coalesce(col("environment_z_score"), lit(0.0)))
    assert(anom.filter(abs(col("anomaly_score") - g) > 1e-12).count() === 0)
  }

  test("device stats only attach when the device has >= 5 readings (HAVING)") {
    val perDevice = anom.groupBy("device_id").count()
    val joined = anom.select("device_id", "device_mean_temp").distinct()
      .join(perDevice, "device_id")
    assert(joined.filter(col("device_mean_temp").isNotNull && col("count") < 5).count() === 0)
  }

  test("some anomalies are actually detected at sf0.001") {
    assert(anom.filter(col("is_anomaly")).count() > 0)
  }
}
