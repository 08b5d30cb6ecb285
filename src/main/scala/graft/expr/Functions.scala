package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression builders mirroring the reference's dbt macros.
  *
  * The reference's whole "UDF surface" is compile-time Jinja macros that
  * expand to plain SQL (reference: dbt_transform/macros/calculate_anomaly_score.sql:2-38),
  * so the Spark-native analog is plain `Column => Column` composition — these
  * stay inside whole-stage codegen, no UDF / custom Expression needed.
  */
object Functions {

  /** Z-score guarded by sigma>0, else 0.
    * Reference: macros/calculate_anomaly_score.sql:2-8 (`calculate_anomaly_score`). */
  def zScoreOrZero(value: Column, mean: Column, stddev: Column): Column =
    when(stddev > 0, abs(value - mean) / stddev).otherwise(lit(0.0))

  /** Z-score guarded by sigma>0, else NULL (the per-scope variant the
    * intermediate model inlines for device/location/environment scopes).
    * Reference: int_temperature_anomalies.sql:98-122. */
  def zScoreOrNull(value: Column, mean: Column, stddev: Column, extraGuard: Column = lit(true)): Column =
    when(stddev > 0 && extraGuard, abs(value - mean) / stddev)
      .otherwise(lit(null).cast("double"))

  /** Threshold flag, never null.
    * Reference: macros/calculate_anomaly_score.sql:11-16 (`is_anomaly`). */
  def isAnomaly(z: Column, threshold: Double): Column =
    when(z > threshold, lit(true)).otherwise(lit(false))

  /** Weighted presence score over required (0.7 total) / optional (0.3 total)
    * fields. Reference: macros/calculate_anomaly_score.sql:19-38
    * (`calculate_data_quality_score` — defined but never called by models;
    * implemented here as declared capability). */
  def dataQualityScore(required: Seq[Column], optional: Seq[Column]): Column = {
    // totality guard (round-1 ADVICE): empty `required` would divide by
    // zero and empty-both would make the reduce throw
    if (required.isEmpty && optional.isEmpty) return lit(0.0)
    require(required.nonEmpty, "dataQualityScore needs at least one required column")
    val rw = 0.7 / required.size
    val req = required.map(c => when(c.isNotNull, lit(rw)).otherwise(lit(0.0)))
    val opt =
      if (optional.isEmpty) Nil
      else {
        val ow = 0.3 / optional.size
        optional.map(c => when(c.isNotNull, lit(ow)).otherwise(lit(0.0)))
      }
    (req ++ opt).reduce(_ + _)
  }

  /** The staging model's 0.4/0.4/0.2 core-field quality score, computed in
    * exact integer tenths so Spark and the DuckDB oracle agree bit-for-bit.
    * Reference: stg_raw_temperature_readings.sql:72-76. */
  def coreQualityScore(deviceId: Column, ts: Column, temp: Column): Column =
    (when(deviceId.isNotNull && trim(deviceId) =!= "", lit(4)).otherwise(lit(0)) +
      when(ts.isNotNull, lit(4)).otherwise(lit(0)) +
      when(temp.isNotNull, lit(2)).otherwise(lit(0))) / lit(10.0)
}
