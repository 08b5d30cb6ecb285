package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CSV ingestion: encoding fallback, Kaggle-format standardization (device
  * id surgery, timestamp parse-or-drop, location mapping), seeded
  * enrichment bounds, file hashing and incremental skip. */
class IngestSpec extends SparkSpec {

  private def tmpDir(): Path = Files.createTempDirectory("graft-ingest")

  private val KaggleRows =
    """id,room_id/id,noted_date,temp,out/in
      |__export__.temp_log_196134_bd201015,Room Admin,08-12-2018 09:30,29,In
      |__export__.temp_log_196131_7bca51bc,Room Admin,08-12-2018 09:30,29,In
      |__export__.temp_log_196127_522915e3,Room 1,09-12-2018 09:29,41,Out
      |__export__.temp_log_196128_bad-date,Room 2,not-a-date,35,Out
      |""".stripMargin

  test("utf-8 kaggle csv standardizes: device id, timestamp, location") {
    val dir = tmpDir()
    Files.write(dir.resolve("a.csv"), KaggleRows.getBytes(StandardCharsets.UTF_8))
    val std = Standardize.standardize(Standardize.readCsv(spark, dir.toString)).cache()
    // bad-date row dropped (F5 null-on-fail + drop)
    assert(std.count() === 3)
    val r = std.filter(col("device_id") === "IOT_TEMP_BD201015").head()
    // "Room Admin" -> "Office" (Admin mapping + Room strip), "_in" suffix
    assert(r.getAs[String]("location") === "Office_in")
    assert(r.getAs[Double]("temperature") === 29.0)
    assert(std.filter(col("location") === "1_out").count() === 1)
  }

  test("latin1 file falls back past utf-8 (S2 encoding fallback)") {
    val dir = tmpDir()
    val latin1 = "id,room_id/id,noted_date,temp,out/in\n" +
      "x_café,Room 1,08-12-2018 09:30,20,In\n"
    Files.write(dir.resolve("b.csv"), latin1.getBytes("ISO-8859-1"))
    val df = Standardize.readCsv(spark, dir.toString)
    assert(df.count() === 1)
    // 0xE9 is invalid standalone UTF-8; the fallback must land on latin1
    assert(df.head().getString(0).contains("café"))
  }

  test("seeded enrichment is deterministic and respects clip bounds (F12)") {
    val dir = tmpDir()
    Files.write(dir.resolve("a.csv"), KaggleRows.getBytes(StandardCharsets.UTF_8))
    val std = Standardize.standardize(Standardize.readCsv(spark, dir.toString))
    val e1 = Standardize.enrich(std).collect()
    val e2 = Standardize.enrich(std).collect()
    assert(e1.map(_.toString).sorted.sameElements(e2.map(_.toString).sorted), "seeded determinism")
    val e = Standardize.enrich(std)
    assert(e.filter(!col("humidity").between(20, 95)).count() === 0)
    assert(e.filter(!col("battery_level").between(10, 100)).count() === 0)
    assert(e.filter(!col("signal_strength").between(-90, -20)).count() === 0)
    assert(e.filter(!col("device_type").isin("DHT22", "DS18B20", "SHT30", "BME280", "TMP36")).count() === 0)
  }

  test("per-record lineage metadata (file_record_id, row_number, totals)") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir()
    Files.write(dir.resolve("a.csv"), KaggleRows.getBytes(StandardCharsets.UTF_8))
    val csv = Standardize.readCsv(spark, dir.toString)
    val withMeta = Standardize.withFileMetadata(
      csv.select(col("*"), col("_metadata")),
      Standardize.fileHashes(spark, dir.toString)).cache()
    assert(withMeta.count() === 4)
    assert(withMeta.filter(col("file_hash").isNull).count() === 0)
    assert(withMeta.select("total_records").distinct().head().getLong(0) === 4L)
    val ids = withMeta.select("file_record_id").collect().map(_.getString(0))
    assert(ids.distinct.length === 4)
    assert(ids.forall(_.matches("[0-9a-f]{64}_[0-9]+")))
    assert(withMeta.select("row_number").collect().map(_.getInt(0)).sorted.sameElements(1 to 4))
  }

  test("end-to-end IotPipeline run: raw append + mart materialization + summary") {
    val landing = tmpDir()
    Files.write(landing.resolve("a.csv"), KaggleRows.getBytes(StandardCharsets.UTF_8))
    val out = tmpDir().toString + "/pipeline"
    val res = IotPipeline.run(spark, landing.toString, out)
    assert(res.rawCount === 4)        // raw keeps the bad-date row
    assert(res.stagedCount === 3)     // standardize drops it
    assert(res.martCount > 0)
    val summary = res.summary.head()
    assert(summary.getAs[Long]("total_processed_records") === res.martCount)
    // a second run appends raw but fully refreshes the mart
    val res2 = IotPipeline.run(spark, landing.toString, out)
    assert(spark.read.parquet(s"$out/raw").count() === 8)
    assert(res2.martCount === res.martCount)
  }

  test("file hashing + incremental skip (S4)") {
    val dir = tmpDir()
    Files.write(dir.resolve("a.csv"), KaggleRows.getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("b.csv"), (KaggleRows + "extra").getBytes(StandardCharsets.UTF_8))
    val hashes = Standardize.fileHashes(spark, dir.toString).cache()
    assert(hashes.count() === 2)
    assert(hashes.select("file_hash").distinct().count() === 2)
    // mark a.csv processed -> only b.csv unprocessed
    val processed = hashes.filter(col("file_path").endsWith("a.csv")).select("file_hash")
    val todo = Standardize.unprocessedFiles(spark, dir.toString, processed)
    assert(todo.count() === 1)
    assert(todo.head().getAs[String]("file_path").endsWith("b.csv"))
    // audit rows carry status (S12)
    val audit = Standardize.auditLog(todo, "completed")
    assert(audit.head().getAs[String]("processing_status") === "completed")
  }
}
