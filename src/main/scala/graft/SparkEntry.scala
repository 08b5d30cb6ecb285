package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model._
import graft.queries.{Analytics, Diagnostics, Enrich, Graph, Linkage, Relational, ScaleOps, Stats, Temporal, Windowed}
import graft.llm.{AnnRecall, BatchPrep, CorpusClean, CorpusQuality, IvfAnn, KMeans, KnnLabel, LangModel, Lexicon, Multimodal, Pca, Perceptron, PhraseIndex, PqAnn, Retrieval, SemDeDup, Similarity, Stump, TextAnalysis, TextDedup, TrainPrep}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared capability surface: one named entry per
  * implemented operator from SURVEY §2, each paired (where ANSI-SQL can
  * express it) with DuckDB oracle SQL in `oracleSql` that the driver
  * hash-compares at sf0.01.
  */
object SparkEntry {

  /** Flagship: the full dedup -> stats -> broadcast-join -> z-score anomaly
    * pipeline (SURVEY §7.2) on sf0.001; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    Sessions.tune(spark)
    val sfDir = "/root/testdata/sf0.001"
    MartReadings.fromStaging(Staging.fromEvents(Tables.events(spark, sfDir)))
  }

  /** Layer memo: the reference materializes marts as TABLES precisely
    * because the summary queries scan them repeatedly
    * (dbt_project.yml:28-30; SURVEY §4 materialization note). The Spark
    * analog: persist each layer once per (session, sfDir) so the six
    * summary queries reuse one computed mart instead of re-running
    * dedup+stats+joins each. Layer row counts are bounded by the events
    * table — safe to MEMORY_AND_DISK at any tested SF. */
  // Build cost is recorded in LayerMetrics (VERDICT r10 #3) with an eager
  // count() so the layer's materialization — the thing the bench's
  // first_run/warm gap is made of — is charged to the named layer at build
  // time, not smeared over whichever consumer's action fires first.
  // Backed by SessionCache: entries evict with the session's context
  // (ADVICE r12).
  private def cached(key: String, s: SparkSession, dir: String)(mk: => DataFrame): DataFrame =
    SessionCache.layer(key, s, dir) {
      val df = mk.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    }

  // staging IS persisted even though it is a narrow projection: the layer
  // fans out to byLoad, ops_row_counts, AND every window/grouping-sets
  // consumer inside the anomaly build — re-measured in round 3 (with the
  // spread scans) and dropping this persist still regressed the chain
  // 7.3s → 9.3s at sf0.1.
  private def ev(s: SparkSession, dir: String): DataFrame =
    cached("staging", s, dir)(Staging.fromEvents(Tables.events(s, dir)))
  // Only the MART layer is persisted, not the intermediate anomalies frame:
  // the mart is the anomalies plus eight narrow derived columns, so the
  // anomalies view is recovered by dropping them from the cached mart — one
  // columnar encode instead of two for near-identical data (the round-2
  // chain persisted both and paid ~1.5s extra at sf0.1).
  private def martOf(s: SparkSession, dir: String): DataFrame =
    cached("mart", s, dir)(MartReadings.fromStaging(ev(s, dir)))
  private val martOnlyCols = Seq(
    "temperature_category", "reading_hour", "reading_day_of_week",
    "reading_date", "reading_month", "reading_year",
    "environment_condition", "data_freshness")
  private def anomOf(s: SparkSession, dir: String): DataFrame =
    martOf(s, dir).drop(martOnlyCols: _*)

  /** The incremental state machine shared by the two incremental gates:
    * the events stream is ingested ONCE per (session, dir) — each
    * micro-batch sliced into event-time weeks and applied as O(batch)
    * state maintenance, with batch 0 redelivered so every state write is
    * proven a fixpoint — and both gates then materialize their mart from
    * the same maintained state. This is the production posture (one state,
    * many derived marts), and the same build-once-per-(session, dir)
    * discipline as the batch layer cache.
    *
    * The file stream delivers whole files — single-part tiers arrive as
    * ONE batch, which would degenerate this gate into "full chain plus
    * state overhead". Slicing each physical batch into event-time weeks
    * (the production arrival cadence) makes the state machine process
    * genuinely incremental, time-clustered increments at every tier; the
    * IncrementalMartSpec proves ANY slicing converges to the batch chain,
    * so the slicing is a pacing choice, not a semantics one. */
  private val incrRoots =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def incrementalStateRoot(s: SparkSession, d: String): String =
    incrRoots.getOrElseUpdate((s, d), graft.streaming.StreamGate.scoped(s) {
      val root = graft.streaming.StreamGate.tempDir("iot_incr_")
      import org.apache.spark.sql.functions.{col, lit, to_date, to_timestamp}
      def applyAll(batch: DataFrame, batchId: Long): Unit = {
        val sentinel = col("win_date") ===
          to_date(lit(graft.streaming.IncrementalMart.SentinelDate))
        def tsOf(d: String) = to_timestamp(lit(d))
        // Week slices over the dedup key's MINUTE (a winner-frame column):
        // the physical batch is scanned and windowed ONCE and the winner
        // frame sliced from cache (IncrementalMart.applyBatchSliced); a
        // (device, minute) key's rows can never straddle minute-range
        // slices, and each week contests exactly its own win_date state
        // partitions. Null minutes (unparsable timestamps) and anything
        // outside Jan-2024 ride the remainder slice with the sentinel
        // partition.
        val weeks = (0 to 4).map { i =>
          val (lo, hi) = (i * 7 + 1, math.min(i * 7 + 8, 32))
          val (loD, hiD) = (f"2024-01-$lo%02d", if (hi == 32) "2024-02-01" else f"2024-01-$hi%02d")
          (col("minute").isNotNull && col("minute") >= tsOf(loD) && col("minute") < tsOf(hiD),
            col("win_date") >= to_date(lit(loD)) && col("win_date") < to_date(lit(hiD)))
        }
        val remainder = (
          col("minute").isNull || col("minute") < tsOf("2024-01-01") ||
            col("minute") >= tsOf("2024-02-01"),
          sentinel || col("win_date") < to_date(lit("2024-01-01")) ||
            col("win_date") >= to_date(lit("2024-02-01")))
        graft.streaming.IncrementalMart.applyBatchSliced(
          s, batch, batchId, root, weeks :+ remainder)
      }
      val q = Tables.eventsStream(s, d).writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          applyAll(batch, batchId)
          // duplicate delivery: every state write must be a fixpoint
          if (batchId == 0) applyAll(batch, batchId)
          ()
        }
        .start()
      q.awaitTermination()
      graft.streaming.StreamGate.recordState("stream_exec_iot_incremental", q)
      root
    })

  /** IoT model-chain queries (reference dbt DAG re-expressed). */
  private val iotQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stg_readings"        -> ((s, d) => ev(s, d)),
    "int_anomalies"       -> ((s, d) => anomOf(s, d)),
    "mart_readings"       -> ((s, d) => martOf(s, d)),
    "mart_summary"        -> ((s, d) => PipelineSummary.overall(martOf(s, d))),
    "summary_by_load"     -> ((s, d) => PipelineSummary.byLoad(ev(s, d))),
    "summary_by_device"   -> ((s, d) => PipelineSummary.byDevice(martOf(s, d))),
    "summary_by_location" -> ((s, d) => PipelineSummary.byLocation(martOf(s, d))),
    "anomaly_breakdown"   -> ((s, d) => PipelineSummary.anomalyBreakdown(martOf(s, d))),
    // §3.1's flagship orchestrated chain THROUGH the streaming engine
    // (VERDICT r11 #3 — the one §3 lifecycle previously proven only in
    // ScalaTest): events arrive as a checkpointed file stream, and each
    // Trigger.AvailableNow micro-batch appends to a raw accumulation
    // layer then recomputes the FULL staging → anomalies → mart chain
    // over it — the reference's stateless `full_refresh` dbt invocation
    // per Airflow run (T5), under which the final mart equals the batch
    // chain over all events whatever the micro-batch slicing, so the
    // oracle is the existing batch mart_readings SQL. Statelessness is
    // part of the contract: the gate records (0,0,0) in the state
    // manifest — all pipeline state lives in the raw table + checkpoint.
    "stream_exec_iot_chain" -> ((s, d) => graft.streaming.StreamGate.scoped(s) {
      val root = graft.streaming.StreamGate.tempDir("iot_chain_")
      val raw = s"$root/raw"; val mart = s"$root/mart"
      val q = Tables.eventsStream(s, d).writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // idempotent raw append: each micro-batch lands in a
          // batchId-named subdirectory, skipped when it already exists —
          // a re-delivered batch (driver recovery/retry) can no longer
          // double-append into the raw layer and silently diverge the
          // mart from the batch oracle (ADVICE r12)
          def deliver(): Unit = {
            val dst = new org.apache.hadoop.fs.Path(s"$raw/batch_id=$batchId")
            val fs = dst.getFileSystem(s.sparkContext.hadoopConfiguration)
            if (!fs.exists(dst)) batch.write.mode("append").parquet(dst.toString)
            MartReadings.fromStaging(Staging.fromEvents(
                s.read.option("basePath", raw).parquet(raw).drop("batch_id")))
              .write.mode("overwrite").parquet(mart)
          }
          deliver()
          // duplicate delivery of batch 0 (the jdbc_merge gate's trick):
          // the skip-if-exists append must be a fixpoint, so the gate's
          // oracle — the one-shot batch mart SQL — proves exactly-once
          // semantics under redelivery, not just under the happy path
          if (batchId == 0) deliver()
          ()
        }
        .start()
      q.awaitTermination()
      graft.streaming.StreamGate.recordState("stream_exec_iot_chain", q)
      s.read.parquet(mart)
    }),
    // The INCREMENTAL flavor of the flagship chain (VERDICT r14 #7): same
    // events stream, same oracle (the batch mart SQL, hash-checked), but
    // each micro-batch does O(batch) state maintenance — winner-state
    // upsert with retraction deltas + exact moment partials — and the
    // mart materializes once from state (streaming/IncrementalMart).
    // Batch 0 is delivered twice: the compare-and-set winner delta and
    // the batch-keyed partials write must both be fixpoints.
    "stream_exec_iot_incremental" -> ((s, d) =>
      graft.streaming.IncrementalMart.materialize(s, incrementalStateRoot(s, d))),
    // The SUMMARY reader over the SAME maintained state (VERDICT r15 #4):
    // mart_pipeline_summary assembled purely from the summary partials —
    // signed combo/quality/date counts + per-partition timestamp extremes
    // — with NO scan of the winner rows. One state machine, two marts: the
    // 100-TB shape where derived tables are views over maintained state,
    // not per-table recomputes. Same oracle as the batch mart_summary.
    "stream_exec_summary_incremental" -> ((s, d) =>
      graft.streaming.IncrementalMart.materializeSummary(s, incrementalStateRoot(s, d))),
    // U2: 3-way UNION ALL of per-layer row counts (the reference's ops
    // stats query, run-pipeline.sh:89-109)
    "ops_row_counts" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      def one(tag: String, df: DataFrame) =
        df.agg(count(lit(1)).as("row_count")).select(lit(tag).as("layer"), col("row_count"))
      one("staging", ev(s, d))
        .unionByName(one("valid", anomOf(s, d)))
        .unionByName(one("anomalous", anomOf(s, d).filter(col("is_anomaly"))))
    })
  )

  private val iotOracle: Map[String, String] = Map(
    "stg_readings"        -> IotOracle.stgReadings,
    "int_anomalies"       -> IotOracle.intAnomalies,
    "mart_readings"       -> IotOracle.martReadings,
    "stream_exec_iot_chain" -> IotOracle.martReadings,
    "stream_exec_iot_incremental" -> IotOracle.martReadings,
    "stream_exec_summary_incremental" -> IotOracle.martSummary,
    "mart_summary"        -> IotOracle.martSummary,
    "summary_by_load"     -> IotOracle.summaryByLoad,
    "summary_by_device"   -> IotOracle.summaryByDevice,
    "summary_by_location" -> IotOracle.summaryByLocation,
    "anomaly_breakdown"   -> IotOracle.anomalyBreakdown,
    "ops_row_counts"      -> IotOracle.opsRowCounts
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    iotQueries ++ Relational.queries ++ Temporal.queries ++ Analytics.queries ++
      Windowed.queries ++ Diagnostics.queries ++ Graph.queries ++ Linkage.queries ++
      TextAnalysis.queries ++ TextDedup.queries ++ LangModel.queries ++
      CorpusClean.queries ++ CorpusQuality.queries ++ TrainPrep.queries ++
      KMeans.queries ++
      Similarity.queries ++ Similarity.lshQueries ++
      IvfAnn.queries ++ PqAnn.queries ++ AnnRecall.queries ++ SemDeDup.queries ++ Multimodal.queries ++
      Retrieval.queries ++ Enrich.queries ++ Stats.queries ++ ScaleOps.queries ++
      PhraseIndex.queries ++ KnnLabel.queries ++ BatchPrep.queries ++ Lexicon.queries ++
      Perceptron.queries ++ Pca.queries ++ Stump.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops (those
    * queries get the driver's weaker rows-only check). */
  def oracleSql: Map[String, String] =
    iotOracle ++ Relational.oracles ++ Temporal.oracles ++ Analytics.oracles ++
      Windowed.oracles ++ Diagnostics.oracles ++ Graph.oracles ++ Linkage.oracles ++
      TextAnalysis.oracles ++ TextDedup.oracles ++ LangModel.oracles ++
      CorpusClean.oracles ++
      CorpusQuality.oracles ++ TrainPrep.oracles ++
      KMeans.oracles ++
      Similarity.oracles ++ Similarity.lshOracles ++ IvfAnn.oracles ++
      PqAnn.oracles ++ AnnRecall.oracles ++ SemDeDup.oracles ++ Multimodal.oracles ++
      Retrieval.oracles ++ Enrich.oracles ++ Stats.oracles ++ ScaleOps.oracles ++
      PhraseIndex.oracles ++ KnnLabel.oracles ++ BatchPrep.oracles ++ Lexicon.oracles ++
      Perceptron.oracles ++ Pca.oracles ++ Stump.oracles
}
