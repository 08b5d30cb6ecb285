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

  /** Readers are memoized per (session, dir, table): `spark.read.parquet`
    * re-runs file listing + footer schema inference on every call — one
    * stray driver job per query construction, ~310 of them per bench
    * sweep. The cached value is a PLAN (scan + inferred schema), not
    * data; filters/pruning still push per-query. Evicted with the
    * session (SessionCache). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    SessionCache.getOrElseUpdate(spark, ("graft.table", sfDir, name)) {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** Tables whose pipelines are per-row-compute heavy (staging string
    * derivations over events; tokenize/shingle/hash over documents; vector
    * kernels over embeddings) get the spread — there the serial scan
    * gates 32 cores. Pure scan→aggregate tables (lineitem, orders, ...)
    * do NOT: the row exchange costs more than the single-task scan saves
    * (measured +1s on q1_pricing at sf0.1). */
  private def spreadTable(spark: SparkSession, sfDir: String, name: String): DataFrame =
    SessionCache.getOrElseUpdate(spark, ("graft.spreadTable", sfDir, name)) {
      spread(spark, table(spark, sfDir, name))
    }

  /** [[spread]] for a NARROW projection feeding a compute-heavy aggregate
    * (exact percentile buffers, sketch builds): the caller projects the
    * 1-3 columns the aggregate needs FIRST, so the round-robin exchange
    * this inserts carries only those bytes, then the per-partition buffer
    * build runs on every core instead of serializing on the scan's split
    * count. Same guard as [[spread]]: no-ops whenever the plan already has
    * at least half the session parallelism (any real multi-split input),
    * so at cluster scale this never adds an exchange. Only sound above
    * order-independent consumers (counts-map percentiles, Exact integer
    * aggregates) — round-robin changes row order within partitions. */
  def spreadNarrow(spark: SparkSession, df: DataFrame): DataFrame =
    spread(spark, df)

  /** [[spread]] by HASH of `cols` instead of round-robin — for
    * ALREADY-MATERIALIZED frames (localCheckpoint leaves) that feed
    * per-row-compute-heavy pipelines (gram explodes, candidate fan-outs,
    * array_intersect verification) where row placement must stay
    * deterministic without the round-robin pre-sort. Call it ON the
    * checkpointed frame: there `.rdd.getNumPartitions` is metadata (no
    * jobs — on an unmaterialized AQE frame it would execute every query
    * stage). Same guard as [[spread]]: no-ops whenever the frame already
    * carries at least half the session parallelism, so a cluster-scale
    * materialization is never re-shuffled. Keys must be high-cardinality
    * (content fingerprints, doc ids) so the hash spreads evenly (guide
    * §2.5). r17: cached/checkpointed frames materialize AQE-coalesced now
    * (canChangeCachedPlanOutputPartitioning) — right for exchange-bound
    * consumers, wrong for compute-heavy narrow ones, which re-spread here
    * exactly like the raw single-split scans. */
  def spreadKeyed(spark: SparkSession, df: DataFrame, cols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target, cols: _*) else df
  }

  def region(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = table(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "lineitem")
  def documents(spark: SparkSession, sfDir: String): DataFrame = spreadTable(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = spreadTable(spark, sfDir, "embeddings")

  /** `events.ts` arrives in one of two parquet encodings depending on the
    * testdata generation: TIMESTAMP(NANOS) — which Spark's reader rejects
    * ([PARQUET_TYPE_ILLEGAL]) unless `spark.sql.legacy.parquet.nanosAsLong`
    * (set at session construction — see [[Sessions]]) delivers it as a plain
    * long of nanos — or plain TIMESTAMP(MICROS) without timezone, which
    * Spark reads as TIMESTAMP_NTZ. Normalize both to session-zone TIMESTAMP
    * micros: the long path truncates nanos→micros (byte-for-byte the same
    * truncation DuckDB applies reading the same file), and the NTZ path is a
    * wall-clock-preserving cast (session tz is pinned UTC, so the instant is
    * unchanged and every downstream hour/date_trunc/unix_ts derivation sees
    * identical values on both engines).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeTs(spreadTable(spark, sfDir, "events"))

  /** Normalize an events frame's `ts` to session-zone TIMESTAMP micros
    * whatever encoding it arrived in (see [[events]]). Applied by every
    * reader of the events table — batch, streaming, and the `_metadata`
    * direct scans — so the encoding branch lives in exactly one place. */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType =>
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case org.apache.spark.sql.types.TimestampType => df
    case _ => // TIMESTAMP_NTZ from plain micros parquet
      df.withColumn("ts", col("ts").cast("timestamp"))
  }

  /** DDL type for the stream source's `ts` column, derived from the batch
    * reader's inferred type with the SAME three-way branch [[normalizeTs]]
    * handles — raw nanos long (legacy TIMESTAMP(NANOS) via `nanosAsLong`),
    * UTC-adjusted micros (TIMESTAMP), or plain micros (TIMESTAMP_NTZ).
    * Footer-only schema read — no data scan; used to pick the matching
    * user-schema for file-stream sources (streaming reads REQUIRE an
    * explicit schema, so the branch cannot be left to schema inference). */
  def eventsTsDdl(spark: SparkSession, sfDir: String): String =
    table(spark, sfDir, "events").schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType      => "BIGINT"
      case org.apache.spark.sql.types.TimestampType => "TIMESTAMP"
      case _                                        => "TIMESTAMP_NTZ"
    }

  /** Streaming twin of [[events]]: a file-stream source over the events
    * parquet (and only that file, via pathGlobFilter) with `ts` normalized
    * to session-zone TIMESTAMP micros under any testdata encoding. */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val tsDdl = eventsTsDdl(spark, sfDir)
    val schema = s"event_id BIGINT, ts $tsDdl, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING"
    streamSource(spark, sfDir, "events", schema).transform(normalizeTs)
  }

  /** File-stream source for one table under either testdata layout:
    * driver testdata ships `<name>.parquet` as a single FILE (so the
    * source must read the parent dir with a leaf-name filter — a bare
    * file path fails partition discovery's "basePath must be a
    * directory"), while scaled copies (ScaleGen) write a DIRECTORY of
    * part files (where the leaf-name filter silently matches ZERO files —
    * an empty stream masquerading as a fast one; caught in the round-11
    * sf1 battery). Branch on the layout. */
  private[graft] def streamSource(
      spark: SparkSession, sfDir: String, name: String, schema: String): DataFrame = {
    val r = spark.readStream.schema(schema)
    // layout probe through the Hadoop FileSystem API, not java.io.File: the
    // sfDir may live on any supported filesystem (HDFS, S3A, ...) where a
    // local-File probe always answers "not a directory" and the
    // pathGlobFilter branch would silently produce an empty stream for a
    // directory-per-table layout (ADVICE r11)
    val target = new org.apache.hadoop.fs.Path(s"$sfDir/$name.parquet")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // fail-fast is intended when NEITHER layout exists (the r11 empty-
    // stream-masquerading bug is worse than an error), but name the
    // expected layouts instead of surfacing a bare FileNotFoundException
    // (ADVICE r12)
    val status =
      try fs.getFileStatus(target)
      catch {
        case e: java.io.FileNotFoundException =>
          throw new java.io.FileNotFoundException(
            s"stream source for table '$name': expected either a parquet FILE " +
              s"or a DIRECTORY of part files at $target — neither exists " +
              s"(${e.getMessage})")
      }
    if (status.isDirectory) r.parquet(target.toString)
    else r.option("pathGlobFilter", s"$name.parquet").parquet(sfDir)
  }

  /** Streaming twin of [[documents]]: a file-stream source over the
    * documents parquet only ([[streamSource]] handles both layouts).
    * Streaming reads require an explicit schema; taken from the batch
    * reader's footer (no data scan). */
  def documentsStream(spark: SparkSession, sfDir: String): DataFrame =
    streamSource(spark, sfDir, "documents",
      table(spark, sfDir, "documents").schema.toDDL)

  /** Streaming twin of [[embeddings]], for the incremental-statistics
    * gates (arriving embedding shards folded into running aggregates). */
  def embeddingsStream(spark: SparkSession, sfDir: String): DataFrame =
    streamSource(spark, sfDir, "embeddings",
      table(spark, sfDir, "embeddings").schema.toDDL)
}
