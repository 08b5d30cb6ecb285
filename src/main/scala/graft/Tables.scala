package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (see TESTDATA.md).
  *
  * All loads are plain parquet scans so Catalyst can push filters and prune
  * columns into the scan (verify via `.explain`: `PushedFilters`, `ReadSchema`).
  */
object Tables {

  /** The testdata files are each a SINGLE parquet row group, and a row group
    * is the parquet split unit — so every scan plans as one task and every
    * narrow pipeline above it (staging derivations, per-doc tokenize,
    * per-row hashing) serializes on one core of local[32]. Spread such
    * degenerate scans across the cluster with one cheap round-robin
    * exchange (the files are a few MB). Guarded: real deployments read
    * many-split inputs (getNumPartitions >= parallelism), where this no-ops
    * — large tables must NOT be blindly repartitioned at 100 TB.
    */
  private def spread(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Tables whose pipelines are per-row-compute heavy (staging string
    * derivations over events; tokenize/shingle/hash over documents; vector
    * kernels over embeddings) get the spread — there the serial scan
    * gates 32 cores. Pure scan→aggregate tables (lineitem, orders, ...)
    * do NOT: the row exchange costs more than the single-task scan saves
    * (measured +1s on q1_pricing at sf0.1). */
  private def spreadTable(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spread(spark, table(spark, sfDir, name))

  def region(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = table(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "lineitem")
  def documents(spark: SparkSession, sfDir: String): DataFrame = spreadTable(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = spreadTable(spark, sfDir, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects outright ([PARQUET_TYPE_ILLEGAL]). With
    * `spark.sql.legacy.parquet.nanosAsLong` (set at session construction —
    * see [[Sessions]]) the nanos arrive as a plain long; truncate to
    * microseconds — byte-for-byte the same truncation DuckDB applies when it
    * reads the same file, so the oracle sees identical timestamps.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    spreadTable(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
}
