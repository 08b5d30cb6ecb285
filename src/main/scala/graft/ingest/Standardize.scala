package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion / standardization layer: CSV landing zone → the standard
  * reading schema, re-expressing the reference's dlt ingest job
  * (reference: dlt_ingest/iot_temperature_pipeline.py:27-233).
  *
  * Covers SURVEY §2.1/§2.8 rows S1 (glob scan), S2 (encoding fallback),
  * S4 (sha-256 file hash), S12 (audit log), F3 (device-id string surgery),
  * F5 (fixed-format timestamp parse, null-on-fail), F12 (seeded synthetic
  * enrichment via rand/randn).
  */
object Standardize {

  /** Kaggle CSV schema: `id, room_id/id, noted_date, temp, out/in`
    * (reference: iot_temperature_pipeline.py:136; schema.yml:11-20). */
  val KaggleSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("room_id/id", StringType),
    StructField("noted_date", StringType),
    StructField("temp", DoubleType),
    StructField("out/in", StringType)
  ))

  /** S1+S2: glob scan of a landing zone with encoding fallback — try each
    * encoding with FAILFAST and fall through on decode/parse failure
    * (reference: iot_temperature_pipeline.py:107-123 tries utf-8 →
    * utf-8-sig → latin1 → cp1252 → iso-8859-1). utf-8-sig is not a JVM
    * charset name; the BOM case is handled by Spark's UTF-8 reader. */
  val Encodings: Seq[String] = Seq("UTF-8", "ISO-8859-1", "windows-1252")

  def readCsv(spark: SparkSession, pathGlob: String): DataFrame = {
    val attempts = Encodings.iterator.map { enc =>
      scala.util.Try {
        val df = spark.read
          .option("header", "true")
          .option("mode", "FAILFAST")
          .option("encoding", enc)
          .schema(KaggleSchema)
          .csv(pathGlob)
        // Spark's charset decode substitutes U+FFFD for malformed bytes
        // rather than throwing (unlike Python's strict codecs), so "this
        // encoding failed" is detected by probing for replacement chars.
        val strCols = df.schema.collect {
          case f if f.dataType == StringType => col(f.name)
        }
        val mojibake = df
          .filter(concat_ws("", strCols: _*).contains("�")).limit(1).count()
        require(mojibake == 0, s"$enc produced replacement characters")
        df
      }
    }
    attempts.collectFirst { case scala.util.Success(df) => df }.getOrElse {
      throw new IllegalArgumentException(
        s"$pathGlob unreadable with any of ${Encodings.mkString(", ")}")
    }
  }

  /** F3+F5: the Kaggle-format mapping
    * (reference: iot_temperature_pipeline.py:146-209):
    *  - device_id = "IOT_TEMP_" + upper(first 8 chars of last '_'-token of
    *    id)  (:152-154)
    *  - timestamp parsed dd-MM-yyyy HH:mm, unparseable rows dropped
    *    (:157,203-207)
    *  - location = room_id with "Room " stripped, "Admin"→"Office",
    *    suffixed "_" + lower(out/in)  (:163-165)
    */
  def standardize(raw: DataFrame): DataFrame = {
    raw
      .withColumn("device_id",
        concat(lit("IOT_TEMP_"),
          upper(substring(element_at(split(col("id"), "_"), -1), 1, 8))))
      .withColumn("timestamp", try_to_timestamp(col("noted_date"), lit("dd-MM-yyyy HH:mm")))
      .filter(col("timestamp").isNotNull)
      .withColumn("temperature", col("temp").cast("double"))
      .withColumn("location",
        concat(
          regexp_replace(regexp_replace(col("room_id/id"), "Room ", ""), "Admin", "Office"),
          lit("_"), lower(col("out/in"))))
      .select("device_id", "timestamp", "temperature", "location")
  }

  /** F12: seeded synthetic enrichment
    * (reference: iot_temperature_pipeline.py:168-201, np.random.seed(42)).
    * Exact numpy RNG parity is impossible (different generators); what is
    * replicated is the *distributional contract*: seeded-deterministic
    * humidity/battery/signal/device-type columns with the reference's
    * means, spreads and clip bounds. Excluded from oracle queries per
    * SURVEY §5 determinism rules. */
  def enrich(std: DataFrame): DataFrame = {
    val indoor = lower(col("location")).contains("_in")
    def clip(c: org.apache.spark.sql.Column, lo: Double, hi: Double) =
      least(greatest(c, lit(lo)), lit(hi))
    val deviceTypes = Seq("DHT22", "DS18B20", "SHT30", "BME280", "TMP36")
    val firmwares = Seq("v1.2.3", "v1.2.4", "v1.3.0", "v1.3.1", "v2.0.0")
    def pick(options: Seq[String], seed: Int) =
      element_at(
        array(options.map(lit): _*),
        (floor(rand(seed) * options.size) + 1).cast("int"))
    std
      .withColumn("humidity", clip(
        when(indoor, 45.0).otherwise(65.0)
          - lit(1.2) * (col("temperature") - 25.0) + randn(42) * 8.0, 20.0, 95.0))
      .withColumn("battery_level", clip(
        lit(70.0) + rand(43) * 30.0 + randn(44) * 5.0, 10.0, 100.0))
      .withColumn("signal_strength", clip(
        when(indoor, -55.0).otherwise(-45.0) + randn(45) * 10.0, -90.0, -20.0))
      .withColumn("device_type", pick(deviceTypes, 46))
      .withColumn("firmware_version", pick(firmwares, 47))
  }

  /** Per-record lineage metadata (reference:
    * iot_temperature_pipeline.py:54-75 — `file_record_id`, `row_number`,
    * `file_name/path/size`, `ingestion_timestamp`, `total_records`), built
    * from the file source's `_metadata` struct plus per-file windows. The
    * reference's `file_record_id = "{file_hash}_{idx}"` keys idempotent
    * appends; here the content hash comes from [[fileHashes]] joined on
    * path. */
  def withFileMetadata(csvRows: DataFrame, hashes: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("file_path")).orderBy(monotonically_increasing_id())
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("file_path"))
    csvRows
      .withColumn("file_path", col("_metadata.file_path"))
      .withColumn("file_name", col("_metadata.file_name"))
      .withColumn("file_size_bytes", col("_metadata.file_size"))
      .drop("_metadata")
      .join(hashes.select(col("file_path"), col("file_hash")), Seq("file_path"), "left")
      .withColumn("row_number", row_number().over(w))
      .withColumn("total_records", count(lit(1)).over(wAll))
      .withColumn("file_record_id", concat(col("file_hash"), lit("_"), col("row_number")))
      .withColumn("ingestion_timestamp", current_timestamp())
  }

  /** S4: per-file SHA-256 content hashes via the binaryFile source
    * (reference: iot_temperature_pipeline.py:236-245) — the key for
    * incremental skip-if-processed ingestion. */
  def fileHashes(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)
      .select(
        col("path").as("file_path"),
        col("length").as("file_size_bytes"),
        sha2(col("content"), 256).as("file_hash"))

  /** S4: incremental file skip — anti-join the landing zone's hashes
    * against the processed log (reference: iot_temperature_pipeline.py:33-39,
    * 248-252 — the reference's lookup is stubbed; this one is real). */
  def unprocessedFiles(spark: SparkSession, pathGlob: String, processedLog: DataFrame): DataFrame =
    fileHashes(spark, pathGlob)
      .join(processedLog.select(col("file_hash")).distinct(), Seq("file_hash"), "left_anti")

  /** S12: per-file audit rows (reference: iot_temperature_pipeline.py:83-102). */
  def auditLog(files: DataFrame, status: String): DataFrame =
    files.select(
      col("file_path"),
      col("file_hash"),
      col("file_size_bytes"),
      lit(status).as("processing_status"),
      current_timestamp().as("processed_at"))
}
