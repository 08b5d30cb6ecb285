package graft.sources

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SinksSpec extends SparkSpec {

  test("append accumulates, overwrite replaces (S5/S6)") {
    val spark0 = spark
    import spark0.implicits._
    val path = Files.createTempDirectory("graft-sink").toString + "/t"
    Sinks.append(Seq((1, "a")).toDF("k", "v"), path)
    Sinks.append(Seq((2, "b")).toDF("k", "v"), path)
    assert(spark.read.parquet(path).count() === 2)
    Sinks.overwrite(Seq((3, "c")).toDF("k", "v"), path)
    assert(spark.read.parquet(path).as[(Int, String)].collect().toSeq === Seq((3, "c")))
  }

  test("retention rewrite keeps only young rows (S10/T7)") {
    val spark0 = spark
    import spark0.implicits._
    val path = Files.createTempDirectory("graft-ret").toString + "/t"
    val now = Timestamp.valueOf("2024-06-01 00:00:00")
    val rows = Seq(
      ("old", Timestamp.valueOf("2024-01-01 00:00:00")),
      ("edge", Timestamp.valueOf("2024-03-05 00:00:00")),
      ("young", Timestamp.valueOf("2024-05-30 00:00:00")))
    Sinks.overwrite(rows.toDF("tag", "ts"), path)
    Sinks.retentionRewrite(spark, path, "ts", days = 90, now = now)
    val kept = spark.read.parquet(path).select("tag").as[String].collect().toSet
    assert(kept === Set("edge", "young"))
  }

  test("JDBC sink round-trips through embedded Derby (S5 relational)") {
    val spark0 = spark
    import spark0.implicits._
    val db = Files.createTempDirectory("graft-jdbc").toString + "/derbydb"
    val url = s"jdbc:derby:$db;create=true"
    val props = new java.util.Properties
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val df = Seq((1L, "IOT_TEMP_A", 21.5), (2L, "IOT_TEMP_B", 35.0))
      .toDF("record_id", "device_id", "temperature")
    Sinks.jdbc(df, url, "readings", mode = "append", properties = props)
    Sinks.jdbc(df.filter($"record_id" === 1L), url, "readings",
      mode = "append", properties = props)
    val back = Sinks.readJdbc(spark, url, "readings", props)
    assert(back.count() === 3)
    assert(back.filter($"record_id" === 1L).count() === 2)
    assert(back.schema.fieldNames.map(_.toLowerCase).toSet ===
      Set("record_id", "device_id", "temperature"))
    // overwrite mode replaces the table (the mart full-refresh path)
    Sinks.jdbc(df, url, "readings", mode = "overwrite", properties = props)
    assert(Sinks.readJdbc(spark, url, "readings", props).count() === 2)
  }

  test("jdbcMerge lands idempotently by key (S5 exactly-once re-run)") {
    val spark0 = spark
    import spark0.implicits._
    val db = Files.createTempDirectory("graft-jdbc-merge").toString + "/derbydb"
    val url = s"jdbc:derby:$db;create=true"
    val props = new java.util.Properties
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val batch1 = Seq((1L, "IOT_TEMP_A", 21.5), (2L, "IOT_TEMP_B", 35.0))
      .toDF("record_id", "device_id", "temperature")
    // first run creates the target
    Sinks.jdbcMerge(batch1, url, "landing", keys = Seq("record_id"), properties = props)
    assert(Sinks.readJdbc(spark, url, "landing", props).count() === 2)
    // a TRUE re-run of the same batch must not duplicate anything
    Sinks.jdbcMerge(batch1, url, "landing", keys = Seq("record_id"), properties = props)
    val after = Sinks.readJdbc(spark, url, "landing", props)
    assert(after.count() === 2, "re-run duplicated rows")
    // a second batch: one updated key, one new key — upsert semantics
    val batch2 = Seq((2L, "IOT_TEMP_B", 36.25), (3L, "IOT_TEMP_C", 18.0))
      .toDF("record_id", "device_id", "temperature")
    Sinks.jdbcMerge(batch2, url, "landing", keys = Seq("record_id"), properties = props)
    val merged = Sinks.readJdbc(spark, url, "landing", props)
    assert(merged.count() === 3)
    assert(merged.filter($"record_id" === 2L)
      .select($"temperature").as[Double].head() === 36.25)
  }

  test("catalog table + ANALYZE + existence probe (S6/S11/M4)") {
    val spark0 = spark
    import spark0.implicits._
    assert(!Sinks.tableExists(spark, "graft_test_t"))
    Sinks.saveTable(Seq((1, 2.0), (3, 4.0)).toDF("k", "v"), "graft_test_t")
    assert(Sinks.tableExists(spark, "graft_test_t"))
    Sinks.analyze(spark, "graft_test_t")
    // stats land in the catalog and feed the CBO
    val stats = spark.sql("DESCRIBE EXTENDED graft_test_t")
      .filter(col("col_name") === "Statistics").collect()
    assert(stats.nonEmpty)
    spark.sql("DROP TABLE graft_test_t")
  }

  test("bucketed tables join without a shuffle exchange (S8 co-location)") {
    val spark0 = spark
    import spark0.implicits._
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    left.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("graft_bl")
    right.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("graft_br")
    val joined = spark.table("graft_bl").join(spark.table("graft_br"), "k")
    // disable broadcast so the join strategy must exploit bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() === 1000)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE graft_bl"); spark.sql("DROP TABLE graft_br")
    }
  }

  test("partition pruning: date-partitioned write scans only matching partitions (S8)") {
    val spark0 = spark
    import spark0.implicits._
    val path = Files.createTempDirectory("graft-part").toString + "/t"
    val rows = (1 to 100).map(i => (i, s"2024-01-${"%02d".format(i % 5 + 1)}"))
    Sinks.append(rows.toDF("v", "day"), path, partitionBy = Seq("day"))
    val pruned = spark.read.parquet(path).filter(col("day") === "2024-01-03")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() === 20)
    assert(scan.contains("PartitionFilters: [isnotnull(day"), s"expected partition filter:\n$scan")
  }

  test("alternate formats: JSON-lines and ORC round-trip losslessly") {
    val spark0 = spark
    import spark0.implicits._
    val base = Files.createTempDirectory("graft-fmt").toString
    val df = (1 to 50).map(i => (i.toLong, s"name$i", i * 1.5)).toDF("id", "name", "score")
    df.write.mode("overwrite").json(s"$base/j")
    df.write.mode("overwrite").orc(s"$base/o")
    val fromJson = spark.read.schema(df.schema).json(s"$base/j")
    val fromOrc = spark.read.orc(s"$base/o")
    assert(fromJson.exceptAll(df).count() === 0 && df.exceptAll(fromJson).count() === 0)
    assert(fromOrc.exceptAll(df).count() === 0 && df.exceptAll(fromOrc).count() === 0)
  }

  test("schema evolution: appended batches with new columns merge on read") {
    val spark0 = spark
    import spark0.implicits._
    val path = Files.createTempDirectory("graft-evolve").toString + "/t"
    // batch 1: the original schema; batch 2 adds a column (dlt-style
    // schema evolution, SURVEY §1.4)
    Seq((1L, "a")).toDF("id", "v").write.mode("append").parquet(path)
    Seq((2L, "b", 9.5)).toDF("id", "v", "score").write.mode("append").parquet(path)
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert(merged.columns.sorted.toSeq === Seq("id", "score", "v"))
    val byId = merged.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(merged.columns.indexOf("score")))
    assert(byId(2L).getDouble(merged.columns.indexOf("score")) === 9.5)
  }

  test("corrupt-record capture: PERMISSIVE keeps bad rows inspectable") {
    val path = Files.createTempDirectory("graft-corrupt")
    java.nio.file.Files.write(path.resolve("x.csv"),
      "id,temp\n1,20.5\nnot-a-long,xx\n3,30.0\n".getBytes("UTF-8"))
    val schema = "id LONG, temp DOUBLE, _corrupt_record STRING"
    val df = spark.read
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema).csv(path.toString).cache()
    assert(df.count() === 3)
    assert(df.filter(col("_corrupt_record").isNotNull).count() === 1)
    assert(df.filter(col("id").isNotNull).count() === 2)
  }

  test("compaction rewrites many small files into few (S8 maintenance)") {
    val spark0 = spark
    import spark0.implicits._
    val path = Files.createTempDirectory("graft-compact").toString + "/t"
    (1 to 10).foreach(i => Sinks.append(Seq((i, s"v$i")).toDF("k", "v"), path))
    def files() = new java.io.File(path).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files() >= 10)
    Sinks.compact(spark, path, targetFiles = 2)
    assert(files() <= 2)
    assert(spark.read.parquet(path).count() === 10)
  }

  test("dynamic partition overwrite touches only the written partitions") {
    val spark0 = spark
    import spark0.implicits._
    val path = Files.createTempDirectory("graft-dyn").toString + "/t"
    Sinks.append(Seq((1, "2024-01-01"), (2, "2024-01-02")).toDF("v", "day"), path, Seq("day"))
    // rewrite only day 2 with corrected data
    Sinks.overwritePartitions(Seq((99, "2024-01-02")).toDF("v", "day"), path, Seq("day"))
    // partition-column type inference reads "2024-01-01" back as DATE
    val got = spark.read.parquet(path)
      .selectExpr("CAST(day AS STRING) AS day", "v").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got === Map("2024-01-01" -> 1, "2024-01-02" -> 99))
  }

  test("temp view materialization is lazy and queryable (S7)") {
    val spark0 = spark
    import spark0.implicits._
    Sinks.asView(Seq(1, 2, 3).toDF("x"), "graft_v")
    assert(spark.sql("SELECT sum(x) FROM graft_v").head().getLong(0) === 6)
  }
}
