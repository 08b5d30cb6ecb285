package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.expr.Exact

/** Temporal operators beyond plain windows: as-of join and gap-based
  * sessionization — the two classic "Spark has no single operator for
  * this" cases, composed from union + ordered windows exactly as SURVEY
  * §7.4(a) prescribes (compose existing ops before reaching for a custom
  * SparkPlan).
  *
  * Scale posture: both are one shuffle on (user/key) + one ordered window
  * within partition — the same shape Flink/kdb-style as-of joins lower to.
  * No cross join, no per-row subqueries; partition keys are high-cardinality
  * user ids.
  */
object Temporal {

  /** As-of join: for every `error` event, the most recent `purchase` event
    * of the same user at-or-before it (inclusive). Implemented with the
    * union trick: tag both streams, sort each user's merged timeline, and
    * carry the last non-null purchase attributes forward. The tag sorts
    * purchases before errors at equal timestamps → inclusive semantics; the
    * trailing event_id makes tie order total, so the result is
    * deterministic on both engines. */
  def asofLastPurchase(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase").select(
      col("user_id"), col("ts"), lit(0).as("side"),
      col("event_id").as("p_event_id"), col("value").as("p_value"),
      lit(null).cast("long").as("e_event_id"), lit(null).cast("double").as("e_value"))
    val errors = ev.filter(col("event_type") === "error").select(
      col("user_id"), col("ts"), lit(1).as("side"),
      lit(null).cast("long").as("p_event_id"), lit(null).cast("double").as("p_value"),
      col("event_id").as("e_event_id"), col("value").as("e_value"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("side"), coalesce(col("p_event_id"), col("e_event_id")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(errors)
      .withColumn("asof_purchase_id", last(col("p_event_id"), ignoreNulls = true).over(w))
      .withColumn("asof_purchase_value", last(col("p_value"), ignoreNulls = true).over(w))
      .withColumn("asof_purchase_ts", last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(
        col("e_event_id").as("error_event_id"),
        col("user_id"),
        col("ts").as("error_ts"),
        col("asof_purchase_id"),
        col("asof_purchase_value"),
        ((unix_micros(col("ts")) - unix_micros(col("asof_purchase_ts"))) / lit(1e6))
          .as("secs_since_purchase"))
  }

  val asofSql: String = """
WITH u AS (
  SELECT user_id, ts, 0 AS side,
         event_id AS p_event_id, value AS p_value,
         CAST(NULL AS BIGINT) AS e_event_id, CAST(NULL AS DOUBLE) AS e_value
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, 1 AS side,
         CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
         event_id, value
  FROM events WHERE event_type = 'error'
),
m AS (
  SELECT *,
    last_value(p_event_id IGNORE NULLS) OVER w AS asof_purchase_id,
    last_value(p_value IGNORE NULLS) OVER w AS asof_purchase_value,
    last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER w AS asof_purchase_ts
  FROM u
  WINDOW w AS (PARTITION BY user_id
               ORDER BY ts, side, COALESCE(p_event_id, e_event_id)
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT e_event_id AS error_event_id, user_id, ts AS error_ts,
  asof_purchase_id, asof_purchase_value,
  (epoch_us(ts) - epoch_us(asof_purchase_ts)) / CAST(1e6 AS DOUBLE) AS secs_since_purchase
FROM m WHERE side = 1"""

  /** Gap-based sessionization: a new session starts when a user is idle
    * longer than the gap (6h). lag → boundary flag → running sum = session
    * index, then one aggregate per session. */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val GapUs = 6L * 3600 * 1000000
    val wOrd = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(wOrd))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > GapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_session")).over(wRun))
      .groupBy("user_id", "session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        ((unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))) / lit(1e6))
          .as("duration_secs"),
        countDistinct(col("event_type")).as("distinct_event_types"))
  }

  val sessionizeSql: String = """
WITH g AS (
  SELECT *,
    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
b AS (
  SELECT *,
    CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 21600000000
         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS new_session
  FROM g
),
sess AS (
  SELECT *,
    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
  FROM b
)
SELECT user_id, session_idx,
  COUNT(*) AS n_events,
  MIN(ts) AS session_start,
  MAX(ts) AS session_end,
  (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / CAST(1e6 AS DOUBLE) AS duration_secs,
  COUNT(DISTINCT event_type) AS distinct_event_types
FROM sess GROUP BY user_id, session_idx"""

  /** FORWARD as-of join with tolerance: for every `error` event, the
    * EARLIEST `purchase` of the same user at-or-after it, kept only when it
    * lands within 2h (the pandas merge_asof direction='forward' analog).
    * Same union trick as [[asofLastPurchase]] but the merged timeline is
    * processed in DESCENDING time order, so the running last-non-null is
    * the nearest later purchase; ids ordered DESC make ties resolve to the
    * smallest event_id on both engines. */
  def asofNextPurchase(s: SparkSession, d: String): DataFrame = {
    val TolUs = 2L * 3600 * 1000000
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase").select(
      col("user_id"), col("ts"), lit(0).as("side"),
      col("event_id").as("p_event_id"), col("value").as("p_value"),
      lit(null).cast("long").as("e_event_id"))
    val errors = ev.filter(col("event_type") === "error").select(
      col("user_id"), col("ts"), lit(1).as("side"),
      lit(null).cast("long").as("p_event_id"), lit(null).cast("double").as("p_value"),
      col("event_id").as("e_event_id"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("side").asc,
        coalesce(col("p_event_id"), col("e_event_id")).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hit = purchases.unionByName(errors)
      .withColumn("np_id", last(col("p_event_id"), ignoreNulls = true).over(w))
      .withColumn("np_value", last(col("p_value"), ignoreNulls = true).over(w))
      .withColumn("np_ts", last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
    val withinTol = col("np_id").isNotNull &&
      (unix_micros(col("np_ts")) - unix_micros(col("ts"))) <= TolUs
    hit.select(
      col("e_event_id").as("error_event_id"),
      col("user_id"),
      col("ts").as("error_ts"),
      when(withinTol, col("np_id")).as("next_purchase_id"),
      when(withinTol, col("np_value")).as("next_purchase_value"),
      when(withinTol,
        (unix_micros(col("np_ts")) - unix_micros(col("ts"))) / lit(1e6))
        .as("secs_until_purchase"))
  }

  val asofForwardSql: String = """
WITH u AS (
  SELECT user_id, ts, 0 AS side,
         event_id AS p_event_id, value AS p_value,
         CAST(NULL AS BIGINT) AS e_event_id
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, 1 AS side,
         CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
         event_id
  FROM events WHERE event_type = 'error'
),
m AS (
  SELECT *,
    last_value(p_event_id IGNORE NULLS) OVER w AS np_id,
    last_value(p_value IGNORE NULLS) OVER w AS np_value,
    last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER w AS np_ts
  FROM u
  WINDOW w AS (PARTITION BY user_id
               ORDER BY ts DESC, side ASC, COALESCE(p_event_id, e_event_id) DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT e_event_id AS error_event_id, user_id, ts AS error_ts,
  CASE WHEN np_id IS NOT NULL AND epoch_us(np_ts) - epoch_us(ts) <= 7200000000
       THEN np_id END AS next_purchase_id,
  CASE WHEN np_id IS NOT NULL AND epoch_us(np_ts) - epoch_us(ts) <= 7200000000
       THEN np_value END AS next_purchase_value,
  CASE WHEN np_id IS NOT NULL AND epoch_us(np_ts) - epoch_us(ts) <= 7200000000
       THEN (epoch_us(np_ts) - epoch_us(ts)) / CAST(1e6 AS DOUBLE) END AS secs_until_purchase
FROM m WHERE side = 1"""

  /** Sweep-line max concurrency: each event opens a half-open 30-minute
    * interval [ts, ts+30m); +1/-1 boundary deltas are ordered (t, delta,
    * event_id) — ends sort before starts at the same instant, so touching
    * intervals do not overlap — and a running sum's maximum is the peak
    * number of simultaneously open intervals per user. One union + one
    * window + one grouped agg; all arithmetic in exact epoch micros. */
  def maxConcurrency(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val starts = ev.select(col("user_id"), unix_micros(col("ts")).as("t"),
      lit(1L).as("delta"), col("event_id"))
    val ends = ev.select(col("user_id"),
      (unix_micros(col("ts")) + lit(1800000000L)).as("t"),
      lit(-1L).as("delta"), col("event_id"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("t"), col("delta"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    starts.unionByName(ends)
      .withColumn("open", sum(col("delta")).over(w))
      .groupBy("user_id")
      .agg(max(col("open")).as("max_concurrent"),
        Exact.cntIf(col("delta") === 1).as("n_intervals"))
  }

  val maxConcurrencySql: String = """
WITH deltas AS (
  SELECT user_id, epoch_us(ts) AS t, CAST(1 AS BIGINT) AS delta, event_id FROM events
  UNION ALL
  SELECT user_id, epoch_us(ts) + 1800000000 AS t, CAST(-1 AS BIGINT) AS delta, event_id FROM events
), running AS (
  SELECT user_id, delta,
    sum(delta) OVER (PARTITION BY user_id ORDER BY t, delta, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open
  FROM deltas
)
SELECT user_id, CAST(max(open) AS BIGINT) AS max_concurrent,
  CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_intervals
FROM running GROUP BY user_id"""

  /** Merged-interval coverage: the gaps-and-islands merge of overlapping
    * [ts, ts+30m) intervals per user — a new island starts when an
    * interval begins strictly after the running max of all previous ends —
    * then total covered time = Σ per-island (max end − min start), exact
    * BIGINT micros throughout. */
  def intervalCoverage(s: SparkSession, d: String): DataFrame = {
    val iv = Tables.events(s, d).select(
      col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("st"),
      (unix_micros(col("ts")) + lit(1800000000L)).as("en"))
    val wPrev = Window.partitionBy("user_id").orderBy(col("st"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("user_id").orderBy(col("st"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    iv.withColumn("prev_max_en", max(col("en")).over(wPrev))
      .withColumn("new_island",
        when(col("prev_max_en").isNull || col("st") > col("prev_max_en"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(wRun))
      .groupBy("user_id", "island")
      .agg(min(col("st")).as("isl_start"), max(col("en")).as("isl_end"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_islands"),
        sum(col("isl_end") - col("isl_start")).as("covered_us"))
  }

  val intervalCoverageSql: String = """
WITH iv AS (
  SELECT user_id, event_id, epoch_us(ts) AS st, epoch_us(ts) + 1800000000 AS en
  FROM events
), marked AS (
  SELECT user_id, st, en,
    CASE WHEN max(en) OVER (PARTITION BY user_id ORDER BY st, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
           OR st > max(en) OVER (PARTITION BY user_id ORDER BY st, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS new_island,
    event_id
  FROM iv
), isl AS (
  SELECT user_id, st, en,
    sum(new_island) OVER (PARTITION BY user_id ORDER BY st, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM marked
), merged AS (
  SELECT user_id, island, min(st) AS isl_start, max(en) AS isl_end
  FROM isl GROUP BY user_id, island
)
SELECT user_id, count(*) AS n_islands,
  CAST(sum(isl_end - isl_start) AS BIGINT) AS covered_us
FROM merged GROUP BY user_id"""

  /** Session-relative features per EVENT (the row-level companion of
    * [[sessionize]]'s per-session aggregate): session index, ordinal
    * position within the session, and seconds since session start — the
    * classic behavioral-feature triple. Same boundary construction, one
    * extra window per feature, all within the single user_id shuffle. */
  def sessionFeatures(s: SparkSession, d: String): DataFrame = {
    val GapUs = 6L * 3600 * 1000000
    val wOrd = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withIdx = Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(wOrd))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > GapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_session")).over(wRun))
    val wSess = Window.partitionBy("user_id", "session_idx")
      .orderBy(col("ts"), col("event_id"))
    val wSessAll = Window.partitionBy("user_id", "session_idx")
    withIdx.select(
      col("event_id"), col("user_id"), col("session_idx"),
      row_number().over(wSess).as("pos_in_session"),
      ((unix_micros(col("ts")) - min(unix_micros(col("ts"))).over(wSessAll))
        .cast("double") / lit(1e6)).as("secs_since_start"))
  }

  val sessionFeaturesSql: String = """
WITH g AS (
  SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
b AS (
  SELECT *,
    CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 21600000000
         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS new_session
  FROM g
),
sess AS (
  SELECT *,
    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
  FROM b
)
SELECT event_id, user_id, session_idx,
  CAST(row_number() OVER (PARTITION BY user_id, session_idx ORDER BY ts, event_id) AS INT)
    AS pos_in_session,
  CAST(epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY user_id, session_idx) AS DOUBLE)
    / CAST(1e6 AS DOUBLE) AS secs_since_start
FROM sess"""

  /** Time-series MOTIF discovery, discretized (SAX-style): each user's
    * value series in event order is reduced to up/down/flat symbols
    * (exact double comparisons — no float arithmetic crosses the engine
    * boundary), consecutive symbols form length-3 motifs, and the corpus
    * motif census (occurrences + distinct users) falls out of one grouped
    * count. The discretize-then-hash shape is how subsequence matching
    * runs at 100 TB: per-key windows are narrow (3 rows), the heavy state
    * is the tiny motif dictionary, and the only shuffle is the final
    * census. (Time-series similarity search per EDBT'19's streaming-
    * subsequence framing, with discretization standing in for z-normalized
    * distance — the float-free variant an oracle can replay.) */
  private def tsMotifs(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val withPrev = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("prev", lag(col("value"), 1).over(w))
    val withSym = withPrev.withColumn("sym",
      when(col("prev").isNull, lit(null).cast("string"))
        .when(col("value") > col("prev"), lit("U"))
        .when(col("value") < col("prev"), lit("D"))
        .otherwise(lit("F")))
    withSym
      .withColumn("s2", lag(col("sym"), 2).over(w))
      .withColumn("s1", lag(col("sym"), 1).over(w))
      .filter(col("s2").isNotNull && col("s1").isNotNull && col("sym").isNotNull)
      .select(col("user_id"), concat(col("s2"), col("s1"), col("sym")).as("motif"))
      .groupBy("motif")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("user_id")).as("n_users"))
  }

  private val tsMotifsSql: String = """
WITH sy AS (
  SELECT user_id,
    CASE WHEN prev IS NULL THEN NULL
         WHEN value > prev THEN 'U'
         WHEN value < prev THEN 'D'
         ELSE 'F' END AS sym,
    ts, event_id
  FROM (
    SELECT user_id, ts, event_id, value,
      lag(value, 1) OVER w AS prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
), tri AS (
  SELECT user_id,
    lag(sym, 2) OVER w AS s2, lag(sym, 1) OVER w AS s1, sym
  FROM sy
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT s2 || s1 || sym AS motif,
  COUNT(*) AS n_occurrences,
  COUNT(DISTINCT user_id) AS n_users
FROM tri
WHERE s2 IS NOT NULL AND s1 IS NOT NULL AND sym IS NOT NULL
GROUP BY s2 || s1 || sym"""

  /** Run-length encoding of each user's event-type SEQUENCE (the classic
    * sequence-compression / behavioral-segmentation primitive): a run is a
    * maximal streak of consecutive equal event types in (ts, event_id)
    * order. Change flags via lag, run ids via a per-user running sum of
    * flags (both windows partitioned on the high-cardinality user key —
    * never global), runs via one grouped count, then the report collapses
    * to the event-type-bounded summary: runs, total events, longest run,
    * and the compression ratio events/runs (one exact division after the
    * reduction). */
  def rleCompressStats(s: SparkSession, d: String): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wRun = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(wOrd).isNull ||
          lag(col("event_type"), 1).over(wOrd) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(wRun))
    flagged
      .groupBy(col("user_id"), col("run_id"))
      .agg(min(col("event_type")).as("event_type"), count(lit(1)).as("len"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_runs"),
        sum(col("len")).as("n_events"),
        max(col("len")).as("max_run_len"))
      .withColumn("compression_ratio",
        col("n_events").cast("double") / col("n_runs").cast("double"))
  }

  // Mirrors the Spark plan: same lag-based change flag over the same
  // (ts, event_id) total order, same per-user ROWS running sum for run
  // ids, same two grouped reductions, one division after the final one.
  private val rleCompressSql: String = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
    CASE WHEN lag(event_type) OVER w IS NULL
           OR lag(event_type) OVER w <> event_type
         THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), runs0 AS (
  SELECT user_id, event_type,
    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
  FROM flagged
), runs AS (
  SELECT user_id, run_id, min(event_type) AS event_type,
    CAST(count(*) AS BIGINT) AS len
  FROM runs0 GROUP BY user_id, run_id
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_runs,
  CAST(sum(len) AS BIGINT) AS n_events,
  CAST(max(len) AS BIGINT) AS max_run_len,
  CAST(sum(len) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS compression_ratio
FROM runs GROUP BY event_type"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_motifs"          -> ((s, d) => tsMotifs(s, d)),
    "session_features"   -> ((s, d) => sessionFeatures(s, d)),
    "asof_join_purchase" -> ((s, d) => asofLastPurchase(s, d)),
    "asof_next_purchase" -> ((s, d) => asofNextPurchase(s, d)),
    "sessionize_events"  -> ((s, d) => sessionize(s, d)),
    "max_concurrency"    -> ((s, d) => maxConcurrency(s, d)),
    "interval_coverage"  -> ((s, d) => intervalCoverage(s, d)),
    "rle_compress_stats" -> ((s, d) => rleCompressStats(s, d))
  )

  def oracles: Map[String, String] = Map(
    "ts_motifs"          -> tsMotifsSql,
    "session_features"   -> sessionFeaturesSql,
    "asof_join_purchase" -> asofSql,
    "asof_next_purchase" -> asofForwardSql,
    "sessionize_events"  -> sessionizeSql,
    "max_concurrency"    -> maxConcurrencySql,
    "interval_coverage"  -> intervalCoverageSql,
    "rle_compress_stats" -> rleCompressSql
  )
}
