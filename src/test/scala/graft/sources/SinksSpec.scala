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

  test("temp view materialization is lazy and queryable (S7)") {
    val spark0 = spark
    import spark0.implicits._
    Sinks.asView(Seq(1, 2, 3).toDF("x"), "graft_v")
    assert(spark.sql("SELECT sum(x) FROM graft_v").head().getLong(0) === 6)
  }
}
