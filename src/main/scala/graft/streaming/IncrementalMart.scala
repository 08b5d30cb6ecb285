package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.{Exact, Sum128}
import graft.model.{Anomalies, MartReadings, Staging}

/** Incremental maintenance of the IoT mart (VERDICT r14 #7): the
  * full-refresh streaming gate rebuilds the whole staging → anomalies →
  * mart chain per micro-batch (faithful to the reference's `full_refresh`
  * dbt run, and O(total) per batch — 82 s at sf10). This is the 100-TB
  * posture instead: per batch the pipeline does O(batch)-sized work,
  * maintaining two pieces of state, and the mart is materialized once at
  * the end from that state — bit-identical to the batch chain (same
  * oracle SQL, hash-checked).
  *
  * State:
  *  1. winners/ — the current dedup winner per (device_id, minute) key
  *     (the W1 row_number dedup as maintained state, INCLUDING invalid
  *     rows: in the batch chain an invalid row with a higher record_id
  *     shadows a valid one in its key group, so the competition must run
  *     over all staged rows). Hash-bucketed into [[Buckets]] partitions;
  *     a batch rewrites ONLY the buckets its keys touch (dynamic
  *     partition overwrite) — at 100 TB the bucket count scales up and a
  *     batch's write cost stays proportional to its key spread, not to
  *     history.
  *  2. partials/batch_id=N/ — that batch's signed DELTA of the exact
  *     per-scope moment partials (n, Σq₆(t), Σq₄(t²)) for the four A1-A4
  *     stat scopes, quantized per row by [[graft.expr.Quant128]] — the
  *     SAME half-away-from-zero fixed-point step [[graft.expr.Sum128]]
  *     applies inside `Exact.davg`/`Exact.dstd`, so integer-summing
  *     partials across batches (including retractions when a winner is
  *     replaced) reconstructs the batch aggregate EXACTLY; the final
  *     divides/sqrt replay Exact's expression shape step for step.
  *
  * Exactly-once without a commit log: the winner delta is a compare-and-
  * set — a re-delivered (or crash-retried) batch recomputes its deltas
  * against the already-updated winners and gets an EMPTY delta, so both
  * state writes are natural fixpoints; the partials write is additionally
  * keyed by batch_id (skip-if-exists) so a crash between the partials
  * write and the winners write cannot double-count (partials land FIRST;
  * on retry the recomputed — identical — delta is skipped, then winners
  * apply).
  */
object IncrementalMart {

  /** Winner-state hash buckets. Sized so the sf tiers exercise multi-file
    * partition overwrite; a production deployment scales this with key
    * cardinality (or replaces the bucketed table with a lakehouse format
    * whose MERGE does the same thing transactionally). */
  val Buckets = 64

  private def bucketOf = pmod(xxhash64(col("device_id"), col("minute")), lit(Buckets))

  private val stagedCols = Seq("record_id", "device_id", "reading_timestamp",
    "temperature_celsius", "location", "environment_type", "is_valid_record",
    "data_quality_score")

  /** Apply one micro-batch of raw events to the state under `root`. */
  def applyBatch(s: SparkSession, batch: DataFrame, batchId: Long, root: String): Unit = {
    val winnersDir = s"$root/winners"
    val partialsDir = s"$root/partials"
    val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)

    // batch-local winner per key — same total order as the batch chain's
    // W1 window (record_id desc), so composing per-batch winners with the
    // stored winner under the same order equals the global dedup
    val staged = Staging.fromEvents(batch)
      .withColumn("minute", date_trunc("minute", col("reading_timestamp")))
    val w = Window.partitionBy(col("device_id"), col("minute"))
      .orderBy(col("record_id").desc)
    val batchWin = staged.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val hasState = fs.exists(new Path(winnersDir))
    val old = if (hasState) s.read.parquet(winnersDir)
              else s.emptyDataFrame // never read below when !hasState

    // compare-and-set delta: +new for unseen keys; (-old, +new) where the
    // batch winner beats the stored one. A re-delivered batch loses every
    // comparison (record_id equal, not greater) → empty delta → fixpoint.
    val winCols = (stagedCols :+ "minute").map(col)
    val contested =
      if (!hasState)
        (stagedCols :+ "minute").foldLeft(batchWin.limit(0).select(winCols: _*)) {
          (d, n) => d.withColumn(n + "__o", col(n))
        }
      else batchWin.select(winCols: _*).alias("b")
        .join(old.alias("o"),
          col("b.device_id") <=> col("o.device_id") &&
            col("b.minute") <=> col("o.minute"))
        .filter(col("b.record_id") > col("o.record_id"))
        .select(
          (stagedCols :+ "minute").map(n => col(s"b.$n").as(n)) ++
            (stagedCols :+ "minute").map(n => col(s"o.$n").as(n + "__o")): _*)
    val fresh =
      if (!hasState) batchWin.select(winCols: _*)
      else batchWin.select(winCols: _*).alias("b")
        .join(old.select(col("device_id"), col("minute")).alias("o"),
          col("b.device_id") <=> col("o.device_id") &&
            col("b.minute") <=> col("o.minute"), "left_anti")
    val contestedC = contested
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val freshC = fresh.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // signed stat-contribution rows: winners that are VALID readings add,
    // replaced valid winners retract; invalid winners contribute nothing
    def contrib(df: DataFrame, suffix: String, sign: Int): DataFrame = df
      .filter(col("is_valid_record" + suffix) &&
        col("temperature_celsius" + suffix).isNotNull)
      .select(
        col("device_id" + suffix).as("device_id"),
        col("location" + suffix).as("location"),
        col("environment_type" + suffix).as("environment_type"),
        col("temperature_celsius" + suffix).cast("double").as("t"),
        lit(sign.toLong).as("sign"))
    val deltaRows = contrib(freshC, "", 1)
      .unionByName(contrib(contestedC, "", 1))
      .unionByName(contrib(contestedC, "__o", -1))

    // per-scope signed partials (the statsOf grouping sets, as deltas)
    val deltaPartials = deltaRows
      .groupingSets(
        Seq(Seq.empty, Seq(col("device_id")), Seq(col("location")), Seq(col("environment_type"))),
        col("device_id"), col("location"), col("environment_type"))
      .agg(
        sum(col("sign")).as("n"),
        sum((Sum128.quant(col("t"), Exact.SumScale) * col("sign"))
          .cast("decimal(38,0)")).as("s1"),
        sum((Sum128.quant(col("t") * col("t"), Exact.SqScale) * col("sign"))
          .cast("decimal(38,0)")).as("s2"),
        grouping_id().as("gid"))

    // 1. partials first, keyed by batch id (idempotent skip)
    val pDst = new Path(s"$partialsDir/batch_id=$batchId")
    if (!fs.exists(pDst)) deltaPartials.write.mode("overwrite").parquet(pDst.toString)

    // 2. winners: rewrite only the touched buckets. The replacement rows
    //   for a bucket = stored rows with changed keys swapped for the new
    //   winners, plus the fresh keys.
    val changed = contestedC.select(winCols: _*).unionByName(freshC)
      .withColumn("bucket", bucketOf)
    if (!hasState) {
      changed.write.partitionBy("bucket").mode("overwrite").parquet(winnersDir)
    } else if (!changed.isEmpty) {
      val touched = changed.select("bucket").distinct()
      val kept = old.withColumn("bucket", bucketOf)
        .join(broadcast(touched), Seq("bucket"), "left_semi")
        .alias("o")
        .join(changed.alias("c"),
          col("o.device_id") <=> col("c.device_id") &&
            col("o.minute") <=> col("c.minute"), "left_anti")
        .select((stagedCols :+ "minute" :+ "bucket").map(n => col(s"o.$n").as(n)): _*)
      kept.unionByName(changed)
        .write.partitionBy("bucket").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(winnersDir)
    }
    batchWin.unpersist(false); contestedC.unpersist(false); freshC.unpersist(false)
  }

  /** Materialize the mart from the maintained state — the batch chain's
    * exact result: valid = stored winners filtered to valid readings;
    * stat dims reconstructed from the merged partials by replaying
    * Exact.davg/dstd's expression shape over the exact integer sums. */
  def materialize(s: SparkSession, root: String): DataFrame = {
    val valid = s.read.parquet(s"$root/winners")
      .filter(col("is_valid_record") && col("temperature_celsius").isNotNull)
      .select(stagedCols.map(col): _*)
    val merged = s.read.parquet(s"$root/partials")
      .groupBy("gid", "device_id", "location", "environment_type")
      .agg(sum("n").as("n"), sum("s1").as("s1"), sum("s2").as("s2"))
      .filter(col("n") > 0)
    // Exact.davg = ((int128→double)/1e^SumScale) / count-as-double;
    // Exact.dstd = sqrt(greatest((sq − s·s/n)/(n−1), 0)) with s, sq the
    // same two divides — replayed verbatim over the merged integers
    val nD = col("n").cast("double")
    val sD = col("s1").cast("double") / lit(math.pow(10.0, Exact.SumScale))
    val sqD = col("s2").cast("double") / lit(math.pow(10.0, Exact.SqScale))
    val mean = sD / nD
    val std = when(col("n") > 1,
      sqrt(greatest((sqD - sD * sD / nD) / (nD - lit(1.0)), lit(0.0))))
      .otherwise(lit(null).cast("double"))
    val stats = merged
      .withColumn("mean_temp", mean).withColumn("stddev_temp", std)
      .localCheckpoint(false) // tiny; feeds four broadcast dims
    val dims = Anomalies.StatDims(
      global = stats.filter(col("gid") === 7)
        .select(col("mean_temp").as("global_mean_temp"),
          col("stddev_temp").as("global_stddev_temp")),
      device = stats.filter(col("gid") === 3 && col("n") >= 5)
        .select(col("device_id"), col("mean_temp").as("device_mean_temp"),
          col("stddev_temp").as("device_stddev_temp"),
          col("n").as("device_reading_count")),
      location = stats.filter(col("gid") === 5 &&
          col("location").isNotNull && col("n") >= 10)
        .select(col("location"), col("mean_temp").as("location_mean_temp"),
          col("stddev_temp").as("location_stddev_temp")),
      env = stats.filter(col("gid") === 6 &&
          col("environment_type").isNotNull && col("n") >= 5)
        .select(col("environment_type"),
          col("mean_temp").as("environment_mean_temp"),
          col("stddev_temp").as("environment_stddev_temp")))
    MartReadings.fromAnomalies(Anomalies.scoreValid(valid, dims))
  }
}
