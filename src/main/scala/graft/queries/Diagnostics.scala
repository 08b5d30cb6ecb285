package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.Text

/** Data-quality diagnostics and similarity operators a production pipeline
  * runs continuously over incoming data: Benford first-digit drift, a
  * chi-square independence test, heavy-hitter detection with a mergeable
  * sketch plus exact verification, exact rolling medians, and a blocked
  * edit-distance similarity self-join.
  *
  * Scale shapes:
  *  - Benford / chi-square reduce to tiny grouped counts (9 / |types|×4
  *    rows) — one map-side-combinable shuffle each, float math only on the
  *    reduced cells;
  *  - heavy hitters is the sketch-then-verify pattern: a per-partition
  *    Misra–Gries pass (bounded memory, superset guarantee) nominates
  *    candidates, and only candidate tokens are exactly counted — the full
  *    token shuffle is replaced by a broadcast-filtered one;
  *  - the edit-distance join blocks on (first token, ±2 length band) so
  *    candidate generation is an equi-join, never an all-pairs cross join;
  *    Spark's thresholded levenshtein stops each comparison at distance 2;
  *  - the rolling median sorts only the 5-row frame, never the partition.
  */
object Diagnostics {

  /** Benford expected first-digit proportions log10(1+1/d), d=1..9, as
    * shared literals (both engines parse the identical decimal string). */
  private val benfordExpected: IndexedSeq[Double] =
    (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  /** Out-of-order delivery audit: treating event_id as arrival order, an
    * event is late if its event time precedes the max event time already
    * seen for its user; report per-user out-of-order counts and the worst
    * skew — the measurement that calibrates a stream's watermark delay.
    * One (user) shuffle + one ordered window. */
  private def oooAudit(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .withColumn("prior_max", max(col("ts")).over(w))
      .withColumn("is_late", col("prior_max").isNotNull && col("ts") < col("prior_max"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("is_late"), 1L).otherwise(0L)).as("n_ooo"),
        max(when(col("is_late"),
          (unix_micros(col("prior_max")) - unix_micros(col("ts"))))).as("max_skew_us"))
      .withColumn("max_skew_secs",
        col("max_skew_us").cast("double") / lit(1e6).cast("double"))
      .drop("max_skew_us")
  }

  private val oooSql: String = """
WITH marked AS (
  SELECT user_id, ts,
    max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max
  FROM events
)
SELECT user_id,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(CASE WHEN prior_max IS NOT NULL AND ts < prior_max THEN 1 ELSE 0 END) AS BIGINT) AS n_ooo,
  CAST(max(CASE WHEN prior_max IS NOT NULL AND ts < prior_max
                THEN epoch_us(prior_max) - epoch_us(ts) END) AS DOUBLE)
    / CAST(1e6 AS DOUBLE) AS max_skew_secs
FROM marked GROUP BY user_id"""

  /** Backfill gap detection: which calendar dates are MISSING from a
    * sparse feed (purchases of every-50th user)? Date spine from the
    * feed's own min/max (generated from a 1-row aggregate, never
    * collected) anti-joined against the dates present — the partition
    * audit a scheduler runs before queueing backfills. */
  private def backfillGaps(s: SparkSession, d: String): DataFrame = {
    val feed = Tables.events(s, d)
      .filter(col("event_type") === "purchase" && col("user_id") % 50 === 0)
      .select(to_date(col("ts")).as("dt"))
    val spine = feed.agg(min(col("dt")).as("lo"), max(col("dt")).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("dt"))
    spine.join(feed.distinct(), Seq("dt"), "left_anti")
      .select(col("dt").as("missing_date"))
  }

  private val backfillSql: String = """
WITH feed AS (
  SELECT CAST(ts AS DATE) AS dt FROM events
  WHERE event_type = 'purchase' AND user_id % 50 = 0
), spine AS (
  SELECT CAST(unnest(generate_series(CAST(min(dt) AS TIMESTAMP),
                                     CAST(max(dt) AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS dt
  FROM feed
)
SELECT dt AS missing_date FROM spine
WHERE dt NOT IN (SELECT dt FROM feed)"""

  /** Join-key skew report: the heaviest keys of a prospective join key
    * with their load relative to the mean — the measurement that decides
    * between a plain shuffle join, AQE skew handling, or explicit salting
    * (operators/Skew.scala). One aggregation + a 1-row stats broadcast +
    * TakeOrdered. */
  private def keySkewReport(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.orders(s, d).groupBy("o_custkey")
      .agg(count(lit(1)).as("n_rows"))
    val stats = counts.agg(
      sum(col("n_rows")).as("total_rows"), count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(stats))
      .withColumn("avg_rows",
        col("total_rows").cast("double") / col("n_keys").cast("double"))
      .withColumn("skew_ratio", col("n_rows").cast("double") / col("avg_rows"))
      .select(col("o_custkey"), col("n_rows"), col("avg_rows"), col("skew_ratio"))
      .orderBy(col("n_rows").desc, col("o_custkey"))
      .limit(5)
  }

  private val keySkewSql: String = """
WITH counts AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_rows FROM orders GROUP BY 1
), stats AS (
  SELECT CAST(sum(n_rows) AS BIGINT) AS total_rows,
         CAST(count(*) AS BIGINT) AS n_keys FROM counts
)
SELECT o_custkey, n_rows,
  CAST(total_rows AS DOUBLE) / CAST(n_keys AS DOUBLE) AS avg_rows,
  CAST(n_rows AS DOUBLE) / (CAST(total_rows AS DOUBLE) / CAST(n_keys AS DOUBLE)) AS skew_ratio
FROM counts, stats
ORDER BY n_rows DESC, o_custkey
LIMIT 5"""

  /** Retraction-aware incremental aggregation (the Flink retract-stream
    * model): purchases emit (+1, +value) deltas, errors emit (−1, −value),
    * and the maintained per-user aggregate is the signed sum of deltas.
    * The query also PROVES merge consistency in-plan: partials computed
    * per arbitrary sub-batch (event_id mod 4) and re-merged must equal the
    * direct aggregate — exactly, because the decimal-exact Exact.dsum is
    * associative where a float sum is not. The oracle asserts the flag as
    * a TRUE literal (the approx_* oracle pattern). */
  private def incrementalRetract(s: SparkSession, d: String): DataFrame = {
    val deltas = Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("user_id"), col("event_id"),
        when(col("event_type") === "purchase", 1L).otherwise(-1L).as("dc"),
        when(col("event_type") === "purchase", col("value"))
          .otherwise(-col("value")).as("dv"))
    val direct = deltas.groupBy("user_id").agg(
      sum(col("dc")).as("net_count"),
      graft.expr.Exact.dsum(col("dv")).as("net_sum"))
    val merged = deltas.withColumn("batch", col("event_id") % 4)
      .groupBy("user_id", "batch")
      .agg(sum(col("dc")).as("pc"), graft.expr.Exact.dsum(col("dv")).as("pv"))
      .groupBy("user_id")
      .agg(sum(col("pc")).as("m_count"), graft.expr.Exact.dsum(col("pv")).as("m_sum"))
    direct.join(merged, Seq("user_id"))
      .select(col("user_id"), col("net_count"), col("net_sum"),
        (col("net_count") === col("m_count") && col("net_sum") === col("m_sum"))
          .as("merge_consistent"))
  }

  private val incrementalRetractSql: String = s"""
WITH deltas AS (
  SELECT user_id,
    CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END AS dc,
    CASE WHEN event_type = 'purchase' THEN value ELSE -value END AS dv
  FROM events WHERE event_type IN ('purchase', 'error')
)
SELECT user_id,
  CAST(sum(dc) AS BIGINT) AS net_count,
  ${graft.expr.Exact.dsumSql("dv")} AS net_sum,
  TRUE AS merge_consistent
FROM deltas GROUP BY user_id"""

  /** Right-to-be-forgotten cascade audit: one subject-deletion rule
    * (every 77th principal id) applied across every table keyed by a
    * principal, reporting per-table before/deleted/after counts — the
    * manifest a GDPR erasure job emits before the anti-join rewrite (the
    * retention_filter mechanism) actually drops the rows. Counting the
    * deletes as a conditional aggregate means ONE scan per table and no
    * join against a tombstone list (the id rule is computable); with an
    * explicit tombstone table the same audit is a broadcast semi-join. */
  private def gdprCascade(s: SparkSession, d: String): DataFrame = {
    def audit(name: String, df: DataFrame, key: String): DataFrame =
      df.agg(
        count(lit(1)).as("rows_before"),
        sum(when(col(key) % 77 === 0, 1L).otherwise(0L)).as("rows_deleted"))
        .select(lit(name).as("table_name"), col("rows_before"), col("rows_deleted"),
          (col("rows_before") - col("rows_deleted")).as("rows_after"))
    audit("events", Tables.events(s, d), "user_id")
      .unionByName(audit("orders", Tables.orders(s, d), "o_custkey"))
      .unionByName(audit("customer", Tables.customer(s, d), "c_custkey"))
  }

  private val gdprSql: String = """
SELECT 'events' AS table_name, CAST(count(*) AS BIGINT) AS rows_before,
  CAST(sum(CASE WHEN user_id % 77 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS rows_deleted,
  CAST(count(*) AS BIGINT) - CAST(sum(CASE WHEN user_id % 77 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS rows_after
FROM events
UNION ALL
SELECT 'orders', CAST(count(*) AS BIGINT),
  CAST(sum(CASE WHEN o_custkey % 77 = 0 THEN 1 ELSE 0 END) AS BIGINT),
  CAST(count(*) AS BIGINT) - CAST(sum(CASE WHEN o_custkey % 77 = 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'customer', CAST(count(*) AS BIGINT),
  CAST(sum(CASE WHEN c_custkey % 77 = 0 THEN 1 ELSE 0 END) AS BIGINT),
  CAST(count(*) AS BIGINT) - CAST(sum(CASE WHEN c_custkey % 77 = 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM customer"""

  /** One row per (raw record, failed validation rule) — the population of
    * the reference's row-level DQ issue table. Shape: ONE narrow scan of
    * the raw frame builds a 4-slot issue array inline (each slot a `when`
    * guard mirroring a staging validation branch), then a null-pruning
    * explode emits 0..4 issue rows per record — zero shuffles, zero extra
    * scans however many rules are declared, and the whole thing stays in
    * whole-stage codegen. The alternative (one filtered scan per rule,
    * UNION ALL — the literal dbt-test shape, and the oracle's) reads the
    * fact table once per rule; at 100 TB that multiplier is the audit's
    * whole cost. Severities follow the reference DDL's vocabulary
    * (CRITICAL > HIGH > LOW): an unusable identity is CRITICAL, dropped
    * measurements HIGH, an auto-repaired default LOW. The out-of-range
    * temperature is rendered through DECIMAL(6,2) (HALF_UP from DOUBLE in
    * both engines, scale-preserving toString in both) so the text column
    * hash-matches DuckDB. */
  def rowIssues(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def issue(cond: Column, typ: String, desc: String, field: String,
        value: Column, sev: String): Column =
      when(cond, struct(lit(typ).as("issue_type"),
        lit(desc).as("issue_description"), lit(field).as("field_name"),
        value.as("invalid_value"), lit(sev).as("severity")))
    val issues = array(
      issue(col("device_id").isNull || trim(col("device_id")) === "",
        "missing_device_id", "device identifier null or blank; record unusable",
        "device_id", col("device_id"), "CRITICAL"),
      issue(col("reading_timestamp").isNull,
        "missing_timestamp", "reading timestamp absent; record excluded from time series",
        "reading_timestamp", lit(null).cast("string"), "HIGH"),
      issue(col("temperature_raw").isNotNull &&
          !col("temperature_raw").between(-50.0, 100.0),
        "temperature_out_of_range", "temperature outside accepted bounds [-50, 100] C",
        "temperature_celsius",
        col("temperature_raw").cast(DecimalType(6, 2)).cast("string"), "HIGH"),
      issue(col("location_raw").isNull,
        "missing_location", "location absent; defaulted to Unknown_Room",
        "location_raw", lit(null).cast("string"), "LOW"))
    raw
      .select(col("record_id").as("raw_record_id"), issues.as("issues"))
      .select(col("raw_record_id"),
        explode(filter(col("issues"), i => i.isNotNull)).as("i"))
      .select(col("raw_record_id"), col("i.issue_type"),
        col("i.issue_description"), col("i.field_name"),
        col("i.invalid_value"), col("i.severity"))
  }

  /** Whole-distribution key-skew inequality as the exact Gini coefficient
    * of the l_partkey frequency distribution — the shuffle-planning
    * diagnostic that [[keySkewReport]]'s top-5 ratio view cannot give
    * (a 0.05 Gini says hash partitioning is safe; 0.7 says salt).
    *
    * Never ranks raw keys: with counts c sorted ascending and 1-based
    * rank i, Gini = (2·Σ i·c_i − (n+1)·Σc) / (n·Σc), and because the
    * rank sum is invariant under permutations of TIED counts, it reduces
    * exactly to blocks over the frequency-of-frequencies table: a block
    * of m keys sharing count c after M lower-ranked keys contributes
    * c·(m·M + m(m+1)/2). So the plan is: per-key counts (one shuffle),
    * counts-of-counts (second tiny shuffle), a cumulative window over the
    * BOUNDED distinct-count table (PlanShapeSpec aggBounded — the
    * frequency-of-frequencies domain, a few hundred rows at any sf), one
    * grand aggregate of BIGINT sums, one division.
    *
    * Int64 bound: the doubled rank sum is ≤ 2·c̄·n² for n distinct keys of
    * mean count c̄ — safe to n ≈ 10⁹ keys at c̄ ≈ 30; past that, promote
    * the two block products to [[graft.expr.Sum128]] (same plan shape). */
  private def keySkewGini(s: SparkSession, d: String): DataFrame = {
    val cnts = Tables.lineitem(s, d).groupBy("l_partkey")
      .agg(count(lit(1)).as("c"))
    val byC = cnts.groupBy("c").agg(count(lit(1)).as("m"))
    val wb = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    val blocks = byC
      .withColumn("mcum", coalesce(sum(col("m")).over(wb), lit(0L)))
      // doubled block rank-sum keeps m(m+1)/2 integer (Column `/` on
      // BIGINTs is a double divide)
      .withColumn("s1x2",
        col("c") * (lit(2L) * col("m") * col("mcum") +
          col("m") * (col("m") + 1L)))
    blocks
      .agg(sum(col("m")).as("n"), sum(col("c") * col("m")).as("t"),
        sum(col("s1x2")).as("s1x2"))
      .select(
        col("n").as("n_keys"), col("t").as("total_rows"),
        (col("s1x2") - (col("n") + 1L) * col("t")).as("gini_num"),
        (col("n") * col("t")).as("gini_den"),
        ((col("s1x2") - (col("n") + 1L) * col("t")).cast("double") /
          (col("n") * col("t")).cast("double")).as("gini"))
  }

  private val keySkewGiniSql: String = """
WITH cnts AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY 1
), byc AS (
  SELECT c, CAST(count(*) AS BIGINT) AS m FROM cnts GROUP BY 1
), blocks AS (
  SELECT c, m,
    COALESCE(SUM(m) OVER (ORDER BY c
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS mcum
  FROM byc
), agg AS (
  SELECT CAST(SUM(m) AS BIGINT) AS n, CAST(SUM(c * m) AS BIGINT) AS t,
    CAST(SUM(c * (2 * m * mcum + m * (m + 1))) AS BIGINT) AS s1x2
  FROM blocks
)
SELECT n AS n_keys, t AS total_rows,
  s1x2 - (n + 1) * t AS gini_num, n * t AS gini_den,
  CAST(s1x2 - (n + 1) * t AS DOUBLE) / CAST(n * t AS DOUBLE) AS gini
FROM agg"""

  /** Referential-integrity audit across every FK edge of the star schema
    * (the relationship half of a schema-test suite, generalized from the
    * single `dq_expectations` relationship check): one row per edge with
    * child row count, NULL-FK count, and orphan count (non-null FK with
    * no parent). Scale shape: each CHILD table is scanned ONCE however
    * many edges leave it — the three lineitem edges ride one scan with
    * three left joins against DISTINCT key-projected parents (never
    * trusting parent-key uniqueness — see the in-body note) and one
    * conditional aggregate; a literal test-per-edge runner would issue
    * three full fact scans. Dim parents
    * (nation, region) are broadcast; the big parents shuffle on the join
    * key, which is exactly the co-partitioning a bucketed layout would
    * make free. */
  private def fkIntegrityAudit(s: SparkSession, d: String): DataFrame = {
    import graft.expr.Exact.cntIf
    def row(rel: String, agg: DataFrame): DataFrame =
      agg.select(lit(rel).as("relation"), col("child_rows"), col("null_fk"),
        col("orphan_rows"),
        (col("null_fk") === 0L && col("orphan_rows") === 0L).as("ref_ok"))
    // lineitem: three FK edges, ONE scan; the 1-row aggregate unpivots
    // into three edge rows via stack (the dq_expectations idiom) so the
    // shared compute stays one lazy plan branch — no checkpoint needed
    // Parent keys are DISTINCT-ed before each probe join (ADVICE r14): an
    // integrity audit cannot assume the parent side is clean — a
    // duplicated parent key would fan the left join out and silently
    // inflate child_rows/null_fk/orphan counts on every edge sharing the
    // scan. The distinct is partial-aggregable and rides the same shuffle
    // key as the join.
    val liEdges = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey")).distinct(),
        col("l_orderkey") === col("o_orderkey"), "left")
      .join(Tables.part(s, d).select(col("p_partkey")).distinct(),
        col("l_partkey") === col("p_partkey"), "left")
      .join(Tables.supplier(s, d).select(col("s_suppkey")).distinct(),
        col("l_suppkey") === col("s_suppkey"), "left")
      .agg(
        count(lit(1)).as("n"),
        cntIf(col("l_orderkey").isNull).as("no"),
        cntIf(col("l_orderkey").isNotNull && col("o_orderkey").isNull).as("oo"),
        cntIf(col("l_partkey").isNull).as("np"),
        cntIf(col("l_partkey").isNotNull && col("p_partkey").isNull).as("op"),
        cntIf(col("l_suppkey").isNull).as("ns"),
        cntIf(col("l_suppkey").isNotNull && col("s_suppkey").isNull).as("os"))
      .select(expr(
        "stack(3, " +
          "'lineitem->orders', n, no, oo, " +
          "'lineitem->part', n, np, op, " +
          "'lineitem->supplier', n, ns, os) " +
          "AS (relation, child_rows, null_fk, orphan_rows)"))
      .select(col("relation"), col("child_rows"), col("null_fk"),
        col("orphan_rows"),
        (col("null_fk") === 0L && col("orphan_rows") === 0L).as("ref_ok"))
    def edge(rel: String, child: DataFrame, fk: String,
             parent: DataFrame, pk: String, bcast: Boolean): DataFrame = {
      val par = parent.select(col(pk)).distinct()
      row(rel, child.select(col(fk))
        .join(if (bcast) broadcast(par) else par, col(fk) === col(pk), "left")
        .agg(count(lit(1)).as("child_rows"),
          cntIf(col(fk).isNull).as("null_fk"),
          cntIf(col(fk).isNotNull && col(pk).isNull).as("orphan_rows")))
    }
    liEdges
      .unionByName(edge("orders->customer", Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d), "c_custkey", bcast = false))
      .unionByName(edge("customer->nation", Tables.customer(s, d), "c_nationkey",
        Tables.nation(s, d), "n_nationkey", bcast = true))
      .unionByName(edge("supplier->nation", Tables.supplier(s, d), "s_nationkey",
        Tables.nation(s, d), "n_nationkey", bcast = true))
      .unionByName(edge("nation->region", Tables.nation(s, d), "n_regionkey",
        Tables.region(s, d), "r_regionkey", bcast = true))
  }

  private val fkIntegritySql: String = """
WITH li AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS no,
    CAST(sum(CASE WHEN l_orderkey IS NOT NULL AND o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oo,
    CAST(sum(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS np,
    CAST(sum(CASE WHEN l_partkey IS NOT NULL AND p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS op,
    CAST(sum(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ns,
    CAST(sum(CASE WHEN l_suppkey IS NOT NULL AND s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS os
  FROM lineitem l
  LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o ON l.l_orderkey = o.o_orderkey
  LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p ON l.l_partkey = p.p_partkey
  LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) s ON l.l_suppkey = s.s_suppkey
), oc AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nf,
    CAST(sum(CASE WHEN o_custkey IS NOT NULL AND c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orf
  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c ON o.o_custkey = c.c_custkey
), cn AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nf,
    CAST(sum(CASE WHEN c_nationkey IS NOT NULL AND nt.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orf
  FROM customer c LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) nt ON c.c_nationkey = nt.n_nationkey
), sn AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN s_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nf,
    CAST(sum(CASE WHEN s_nationkey IS NOT NULL AND nt.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orf
  FROM supplier s LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) nt ON s.s_nationkey = nt.n_nationkey
), nr AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN n_regionkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nf,
    CAST(sum(CASE WHEN n_regionkey IS NOT NULL AND r.r_regionkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orf
  FROM nation nt LEFT JOIN (SELECT DISTINCT r_regionkey FROM region) r ON nt.n_regionkey = r.r_regionkey
)
SELECT 'lineitem->orders' AS relation, n AS child_rows, no AS null_fk,
  oo AS orphan_rows, (no = 0 AND oo = 0) AS ref_ok FROM li
UNION ALL SELECT 'lineitem->part', n, np, op, (np = 0 AND op = 0) FROM li
UNION ALL SELECT 'lineitem->supplier', n, ns, os, (ns = 0 AND os = 0) FROM li
UNION ALL SELECT 'orders->customer', n, nf, orf, (nf = 0 AND orf = 0) FROM oc
UNION ALL SELECT 'customer->nation', n, nf, orf, (nf = 0 AND orf = 0) FROM cn
UNION ALL SELECT 'supplier->nation', n, nf, orf, (nf = 0 AND orf = 0) FROM sn
UNION ALL SELECT 'nation->region', n, nf, orf, (nf = 0 AND orf = 0) FROM nr"""

  /** Temporal train/test leakage audit: split the event stream at 80% of
    * the covered time RANGE (an exact integer cutoff that stays in-plan
    * as a broadcast 1-row frame — the drift_tvd pattern) and report how
    * many users straddle the boundary. User overlap between a temporal
    * train split and its evaluation window is the classic silent leak in
    * behavioral-model training. One scan, one user-keyed groupBy, one
    * grand aggregate — partial-aggregable end to end. */
  private def splitLeakageAudit(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("t"))
    val cut = ev.agg(min(col("t")).as("lo"), max(col("t")).as("hi"))
      .select(expr("lo + ((hi - lo) div 5) * 4").as("cutoff"))
    val per = ev.crossJoin(broadcast(cut))
      .groupBy("user_id", "cutoff")
      .agg(
        sum(when(col("t") < col("cutoff"), 1L).otherwise(0L)).as("tr"),
        sum(when(col("t") >= col("cutoff"), 1L).otherwise(0L)).as("te"))
    per.groupBy("cutoff")
      .agg(
        sum(col("tr")).as("n_train_events"),
        sum(col("te")).as("n_test_events"),
        sum(when(col("tr") > 0L, 1L).otherwise(0L)).as("n_users_train"),
        sum(when(col("te") > 0L, 1L).otherwise(0L)).as("n_users_test"),
        sum(when(col("tr") > 0L && col("te") > 0L, 1L).otherwise(0L))
          .as("n_users_both"))
      .select(
        col("cutoff"), col("n_train_events"), col("n_test_events"),
        col("n_users_train"), col("n_users_test"), col("n_users_both"),
        when(col("n_users_test") === 0L, lit(0.0))
          .otherwise(col("n_users_both").cast("double") /
            col("n_users_test").cast("double")).as("leakage_rate"))
  }

  private val splitLeakageSql: String = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t FROM events
), c AS (
  SELECT min(t) + ((max(t) - min(t)) // 5) * 4 AS cutoff FROM e
), p AS (
  SELECT user_id, cutoff,
    CAST(sum(CASE WHEN t < cutoff THEN 1 ELSE 0 END) AS BIGINT) AS tr,
    CAST(sum(CASE WHEN t >= cutoff THEN 1 ELSE 0 END) AS BIGINT) AS te
  FROM e CROSS JOIN c GROUP BY 1, 2
)
SELECT CAST(cutoff AS BIGINT) AS cutoff,
  CAST(sum(tr) AS BIGINT) AS n_train_events,
  CAST(sum(te) AS BIGINT) AS n_test_events,
  CAST(sum(CASE WHEN tr > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_users_train,
  CAST(sum(CASE WHEN te > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_users_test,
  CAST(sum(CASE WHEN tr > 0 AND te > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_users_both,
  CASE WHEN sum(CASE WHEN te > 0 THEN 1 ELSE 0 END) = 0 THEN CAST(0.0 AS DOUBLE)
    ELSE CAST(sum(CASE WHEN tr > 0 AND te > 0 THEN 1 ELSE 0 END) AS DOUBLE)
      / CAST(sum(CASE WHEN te > 0 THEN 1 ELSE 0 END) AS DOUBLE) END AS leakage_rate
FROM p GROUP BY cutoff"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "split_leakage_audit" -> ((s, d) => splitLeakageAudit(s, d)),
    "fk_integrity_audit"  -> ((s, d) => fkIntegrityAudit(s, d)),
    "key_skew_gini"       -> ((s, d) => keySkewGini(s, d)),
    "ooo_audit"           -> ((s, d) => oooAudit(s, d)),
    "gdpr_cascade"        -> ((s, d) => gdprCascade(s, d)),
    "backfill_gaps"       -> ((s, d) => backfillGaps(s, d)),
    "key_skew_report"     -> ((s, d) => keySkewReport(s, d)),
    "incremental_retract" -> ((s, d) => incrementalRetract(s, d)),
    // Per-run ingest report (reference: generate_pipeline_report,
    // airflow/dags/iot_temperature_dag.py:165-195, surfaced with the
    // per-file metadata the reference's file_processing_log carries,
    // iot_temperature_pipeline.py:83-102): one row per landing-zone file
    // with record count, distinct sources, and the covered time range.
    // The file identity comes from the scan's _metadata struct, so on a
    // multi-file landing zone this reports per file with zero extra I/O;
    // the grouped agg is one shuffle over (file, tiny payload).
    "pipeline_report" -> ((s, d) => {
      // the memoized reader serves _metadata too (it's a pseudo-column of
      // the file relation, not a projection baked at read time)
      Tables.normalizeTs(Tables.table(s, d, "events"))
        .select(
          col("_metadata.file_name").as("file_name"),
          col("ts"),
          col("user_id"))
        .groupBy("file_name")
        .agg(
          count(lit(1)).as("n_records"),
          countDistinct(col("user_id")).as("n_users"),
          min(col("ts")).as("first_ts"),
          max(col("ts")).as("last_ts"))
        .withColumn("processing_status", lit("completed"))
    }),

    // Declarative data-quality expectations — the engine-side equivalent
    // of the reference's `dbt test` DAG step (schema.yml: not_null /
    // unique / accepted_values / relationships,
    // dbt_transform/models/staging/schema.yml): the four built-in test
    // shapes as ONE conditional-aggregation pass over the table plus one
    // anti-join count for referential integrity, stacked into
    // (test_name, failures) rows. At scale this is a single fact scan +
    // one broadcast anti join, however many column expectations are
    // declared — never one scan per test the way a literal dbt test run
    // issues one query per expectation.
    "dq_expectations" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val base = o.agg(
        graft.expr.Exact.cntIf(col("o_custkey").isNull).as("nn"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("uq"),
        graft.expr.Exact.cntIf(!col("o_orderstatus").isin("O", "F", "P")).as("av"))
      val rel = o.join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("rel"))
      base.crossJoin(broadcast(rel))
        .select(expr(
          "stack(4, " +
            "'not_null_o_custkey', nn, " +
            "'unique_o_orderkey', uq, " +
            "'accepted_values_o_orderstatus', av, " +
            "'relationships_o_custkey', rel) AS (test_name, failures)"))
    }),

    // Row-level data-quality issue audit — the reference's
    // `iot_metadata.data_quality_issues` model (sql/002_create_tables.sql:
    // 56-66: one row per flagged raw record with issue_type, description,
    // field, invalid value, severity), populated from the same validation
    // rules the staging model's validity flag and coalesce repair encode.
    // `dq_expectations` reports per-rule failure COUNTS; this keeps the
    // offending ROWS for triage — the first thing an operator debugging a
    // bad load reaches for. See [[rowIssues]] for the one-scan shape.
    "dq_row_issues" -> ((s, d) =>
      rowIssues(graft.model.Staging.rawReadings(Tables.events(s, d)))),

    // k-anonymity audit over the customer dimension — the privacy screen a
    // training-data pipeline runs before releasing user-adjacent features:
    // rows whose quasi-identifier combination (market segment, nation,
    // account-balance band) lands in a group smaller than k are
    // re-identifiable at that k. One grouped count builds the group-size
    // table (the only shuffle, on the QI key); the audit itself is a
    // single aggregate over groups — at any corpus size the group table is
    // bounded by the QI-combination cardinality, not the row count.
    "k_anonymity_audit" -> ((s, d) => {
      val groups = Tables.customer(s, d)
        .groupBy(col("c_mktsegment"), col("c_nationkey"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"))
        .agg(count(lit(1)).as("gsz"))
      def below(k: Int) = Seq(
        sum(when(col("gsz") < k, 1L).otherwise(0L)).as(s"g$k"),
        sum(when(col("gsz") < k, col("gsz")).otherwise(0L)).as(s"r$k"))
      val aggs = Seq(count(lit(1)).as("n_groups"), sum(col("gsz")).as("n_rows"),
        min(col("gsz")).as("min_gsz")) ++ below(2) ++ below(5) ++ below(10)
      groups
        .agg(aggs.head, aggs.tail: _*)
        .selectExpr(
          """stack(3,
               2,  g2,  r2,
               5,  g5,  r5,
               10, g10, r10) AS (k, groups_below_k, rows_below_k)""",
          "n_groups", "n_rows", "min_gsz AS min_group_size")
        .withColumn("risk_frac",
          col("rows_below_k").cast("double") / col("n_rows").cast("double"))
    }),

    // l-diversity audit — k-anonymity's sibling on the SENSITIVE
    // attribute: a QI group can be large (k-safe) yet expose everyone in
    // it when all members share one sensitive value. Per QI group
    // (nationkey × balance band) count rows AND distinct sensitive values
    // (market segment); the audit reports, for l ∈ {2,3,5}, how many
    // groups/rows sit below that diversity. Same scale shape as
    // k_anonymity_audit: one grouped count (shuffle on the QI key,
    // distinct-aggregate expansion map-side combinable), then a single
    // aggregate over the QI-cardinality-bounded group table.
    "l_diversity_audit" -> ((s, d) => {
      val groups = Tables.customer(s, d)
        .groupBy(col("c_nationkey"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"))
        .agg(count(lit(1)).as("gsz"),
          countDistinct(col("c_mktsegment")).as("l"))
      def below(l: Int) = Seq(
        sum(when(col("l") < l, 1L).otherwise(0L)).as(s"g$l"),
        sum(when(col("l") < l, col("gsz")).otherwise(0L)).as(s"r$l"))
      val aggs = Seq(count(lit(1)).as("n_groups"), sum(col("gsz")).as("n_rows"),
        min(col("l")).as("min_l")) ++ below(2) ++ below(3) ++ below(5)
      groups
        .agg(aggs.head, aggs.tail: _*)
        .selectExpr(
          """stack(3,
               2, g2, r2,
               3, g3, r3,
               5, g5, r5) AS (l, groups_below_l, rows_below_l)""",
          "n_groups", "n_rows", "min_l")
        .withColumn("risk_frac",
          col("rows_below_l").cast("double") / col("n_rows").cast("double"))
    }),

    // t-closeness audit — the third privacy sibling: a QI group passes
    // k-anonymity and l-diversity yet still leaks when its sensitive-value
    // DISTRIBUTION deviates from the global one. For the ORDERED sensitive
    // attribute (balance band) the t-closeness distance is the Earth
    // Mover's Distance = (1/(m−1))·Σᵢ |CumP(i) − CumQ(i)| over the m-value
    // ordered domain; everything stays exact integers by scaling: per
    // group g, emd_num = Σ_band |cum_g·N − cum_all·n_g| with denominator
    // n_g·N·(m−1) (the last band's term is identically 0, so summing all m
    // bands equals the textbook m−1 terms). Shape: one grouped count on
    // (QI, band) — the only row-scale shuffle — then everything runs on
    // the QI-cardinality × domain-cardinality grid (bounded by the QI
    // design, NOT the row count): the grid is a broadcast cross join of
    // two aggregate-bounded dims, cum_g is a window partitioned per group
    // over ≤m rows, and cum_all = Σ_g cum_g is a grouped sum over the grid
    // — no global window anywhere.
    "t_closeness_audit" -> ((s, d) => {
      val cnt = Tables.customer(s, d)
        .groupBy(col("c_nationkey").cast("long").as("g"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("band"))
        .agg(count(lit(1)).as("c"))
      val groups = cnt.groupBy("g").agg(sum(col("c")).as("n_g"))
      val bands  = cnt.select("band").distinct()
      val m = bands.agg(count(lit(1)).as("m"))
      val total = cnt.agg(sum(col("c")).as("n_all"))
      val grid = groups.crossJoin(broadcast(bands))
        .join(cnt, Seq("g", "band"), "left")
        .select(col("g"), col("band"), col("n_g"),
          coalesce(col("c"), lit(0L)).as("c"))
      val wg = Window.partitionBy("g").orderBy("band")
      val cum = grid.withColumn("cum_g", sum(col("c")).over(wg))
      val cumAll = cum.groupBy("band").agg(sum(col("cum_g")).as("cum_all"))
      cum.join(cumAll, "band")
        .crossJoin(broadcast(total))
        .groupBy(col("g").as("c_nationkey"), col("n_g"), col("n_all"))
        .agg(sum(abs(col("cum_g") * col("n_all") - col("cum_all") * col("n_g")))
          .as("emd_num"))
        .crossJoin(broadcast(m))
        .select(col("c_nationkey"), col("n_g").as("n_rows"), col("emd_num"),
          (col("n_g") * col("n_all") * (col("m") - 1)).as("emd_den"))
        .withColumn("emd",
          col("emd_num").cast("double") / col("emd_den").cast("double"))
    }),

    // Benford's-law first-digit profile of order totals: exact per-digit
    // counts, observed fraction, and the quantized deviation from the
    // Benford expectation — the classic fraud/drift screen. The aggregate
    // is 9 rows; all float math happens after the reduction.
    "benford_digits" -> ((s, d) => {
      val digits = Tables.orders(s, d)
        .filter(col("o_totalprice") >= 1.0)
        .select(substring(floor(col("o_totalprice")).cast("string"), 1, 1)
          .cast("int").as("lead_digit"))
        .groupBy("lead_digit").agg(count(lit(1)).as("n"))
      val wAll = Window.partitionBy()
      val expected = element_at(
        array(benfordExpected.map(lit): _*), col("lead_digit"))
      digits
        .withColumn("frac",
          col("n").cast("double") / sum(col("n")).over(wAll).cast("double"))
        .select(
          col("lead_digit"), col("n"), col("frac"),
          round((col("frac") - expected) * lit(1e9), 0).cast("long")
            .as("dev_benford_q"))
    }),

    // Chi-square test of independence between event_type and a user
    // cohort (user_id % 4): contingency cells by one grouped count,
    // marginals by windows over the tiny cell table, per-cell statistic
    // quantized to 1e-6 so the final sum is integer-exact and
    // order-independent.
    "chi_square_independence" -> ((s, d) => {
      val cells = Tables.events(s, d)
        .select(col("event_type"), (col("user_id") % 4).as("grp"))
        .groupBy("event_type", "grp").agg(count(lit(1)).as("n_cell"))
      val rt  = sum(col("n_cell")).over(Window.partitionBy("event_type"))
      val ct  = sum(col("n_cell")).over(Window.partitionBy("grp"))
      val tot = sum(col("n_cell")).over(Window.partitionBy())
      val e = rt.cast("double") * ct.cast("double") / tot.cast("double")
      val o = col("n_cell").cast("double")
      val cellStat = (o - e) * (o - e) / e
      cells
        .withColumn("q", round(cellStat * lit(1e6), 0).cast("long"))
        .agg(
          (sum(col("q")).cast("double") / lit(1e6)).as("chi2"),
          ((countDistinct(col("event_type")) - 1) *
            (countDistinct(col("grp")) - 1)).as("dof"),
          count(lit(1)).as("n_cells"))
    }),

    // Heavy hitters over document tokens: a per-partition Misra–Gries
    // sketch (64 counters — bounded memory regardless of vocabulary size)
    // nominates candidates, which is a guaranteed superset of every token
    // with frequency > N/50 (pigeonhole across partitions); only the
    // candidates are then exactly counted and thresholded, so the answer
    // is exact while the shuffle carries candidate tokens only. The
    // threshold compare is integer (cnt*50 > N) — no float boundary.
    "heavy_hitters_tokens" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val toks = Tables.documents(s, d)
        .select(explode(Text.tokens(col("text"))).as("tok"))
      val cands = toks.as[String].mapPartitions(misraGries(64, _)).toDF("tok")
        .distinct()
      val tot = toks.agg(count(lit(1)).as("n_tokens"))
      toks.join(broadcast(cands), "tok")
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(tot))
        .filter(col("cnt") * 50 > col("n_tokens"))
        .select(col("tok"), col("cnt"))
    }),

    // Exact rolling median of event values over the trailing 5-row frame
    // per user — robust smoothing where a windowed mean would chase
    // outliers. Only the 5-element frame is collected and sorted; the
    // even-count interpolation lo + (hi-lo)*0.5 is written identically on
    // both engines (IEEE ops are deterministic; expression shape matters).
    "rolling_median_value" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id")).rowsBetween(-4, 0)
      val ev = Tables.events(s, d).filter(col("value").isNotNull)
      val arr = sort_array(collect_list(col("value")).over(w))
      val df = ev.select(col("event_id"), col("user_id"), col("value"),
        arr.as("arr"))
        .withColumn("n", size(col("arr")))
      val mid  = element_at(col("arr"), ((col("n") + 1) / 2).cast("int"))
      val lo   = element_at(col("arr"), (col("n") / 2).cast("int"))
      val hi   = element_at(col("arr"), (col("n") / 2 + 1).cast("int"))
      df.select(
        col("event_id"), col("user_id"), col("value"),
        when(col("n") % 2 === 1, mid)
          .otherwise(lo + (hi - lo) * lit(0.5)).as("roll_median"))
    }),

    // Edit-distance similarity self-join over part names, dedupe-before-
    // join: rows collapse to DISTINCT names with multiplicities first (the
    // id-level pair set is inherently quadratic when values repeat — at
    // sf0.1 it is 3.1M pairs over only 64 distinct names), then distinct
    // names are candidate-blocked on (first token, length within ±2) — an
    // equi-join, never a cross join — and verified with a threshold-bounded
    // levenshtein (Spark's 3-arg form abandons each cell at distance > 2).
    // The ±2 band is emitted on ONE side only, so each unordered pair is
    // produced exactly once under name_a < name_b; pair_count = n_a·n_b
    // recovers the row-level pair cardinality without materializing it.
    "editdist_simjoin" -> ((s, d) => {
      val names = Tables.part(s, d)
        .select(concat(col("p_name"), lit("#"),
          col("p_size").cast("string")).as("key"))
        .groupBy("key").agg(count(lit(1)).as("n"))
        .select(col("key").as("name"), col("n"),
          split(col("key"), " ").getItem(0).as("tok1"),
          length(col("key")).as("len"))
      val a = names
        .withColumn("klen", explode(sequence(col("len") - 2, col("len") + 2)))
        .select(col("name").as("name_a"), col("n").as("n_a"),
          col("tok1").as("tok_a"), col("klen"))
      val b = names.select(col("name").as("name_b"), col("n").as("n_b"),
        col("tok1").as("tok_b"), col("len").as("len_b"))
      a.join(b,
          col("tok_a") === col("tok_b") && col("klen") === col("len_b") &&
            col("name_a") < col("name_b"))
        .withColumn("dist", levenshtein(col("name_a"), col("name_b"), 2))
        .filter(col("dist") >= 0)
        .select(col("name_a"), col("name_b"), col("dist"),
          col("n_a"), col("n_b"), (col("n_a") * col("n_b")).as("pair_count"))
    })
  )

  /** Misra–Gries frequent-items pass over one partition: at most k live
    * counters; survivors are every element whose partition-local count
    * exceeds (partition size)/(k+1). Deterministic output SET (the exact
    * recount downstream makes counter values irrelevant). */
  private def misraGries(k: Int, it: Iterator[String]): Iterator[String] = {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { x =>
      counters.get(x) match {
        case Some(c) => counters.update(x, c + 1)
        case None if counters.size < k => counters.update(x, 1L)
        case None =>
          val dead = List.newBuilder[String]
          counters.mapValuesInPlace((_, c) => c - 1)
          counters.foreach { case (key, c) => if (c == 0) dead += key }
          dead.result().foreach(counters.remove)
      }
    }
    counters.keysIterator
  }

  def oracles: Map[String, String] = Map(
    "split_leakage_audit" -> splitLeakageSql,
    "fk_integrity_audit"  -> fkIntegritySql,
    "key_skew_gini"       -> keySkewGiniSql,
    "ooo_audit"           -> oooSql,
    "gdpr_cascade"        -> gdprSql,
    "backfill_gaps"       -> backfillSql,
    "key_skew_report"     -> keySkewSql,
    "incremental_retract" -> incrementalRetractSql,
    // The view hides file paths, but the testdata landing zone is exactly
    // one file per table, so the expected report instantiates to a single
    // literal-named row; ts is TIMESTAMP_NS in DuckDB — CAST to micros
    // matches the Spark side's nanos->micros truncation.
    "dq_expectations" -> s"""
WITH base AS (
  SELECT
    ${graft.expr.Exact.cntIfSql("o_custkey IS NULL")} AS nn,
    CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS uq,
    ${graft.expr.Exact.cntIfSql("o_orderstatus NOT IN ('O','F','P')")} AS av
  FROM orders
), rel AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS rel FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
)
SELECT 'not_null_o_custkey' AS test_name, nn AS failures FROM base
UNION ALL SELECT 'unique_o_orderkey', uq FROM base
UNION ALL SELECT 'accepted_values_o_orderstatus', av FROM base
UNION ALL SELECT 'relationships_o_custkey', rel FROM rel""",

    // Literal one-arm-per-rule form over the shared raw-readings CTE (the
    // engine's single-scan explode and this 4-scan union are the same
    // relation; the driver sorts rows before hashing).
    "dq_row_issues" -> s"""
${graft.model.IotOracle.rawReadingsCte}
SELECT record_id AS raw_record_id, 'missing_device_id' AS issue_type,
  'device identifier null or blank; record unusable' AS issue_description,
  'device_id' AS field_name, device_id AS invalid_value,
  'CRITICAL' AS severity
FROM raw_readings WHERE device_id IS NULL OR trim(device_id) = ''
UNION ALL
SELECT record_id, 'missing_timestamp',
  'reading timestamp absent; record excluded from time series',
  'reading_timestamp', NULL, 'HIGH'
FROM raw_readings WHERE reading_timestamp IS NULL
UNION ALL
SELECT record_id, 'temperature_out_of_range',
  'temperature outside accepted bounds [-50, 100] C',
  'temperature_celsius', CAST(CAST(temperature_raw AS DECIMAL(6,2)) AS VARCHAR), 'HIGH'
FROM raw_readings WHERE temperature_raw IS NOT NULL
  AND temperature_raw NOT BETWEEN CAST(-50.0 AS DOUBLE) AND CAST(100.0 AS DOUBLE)
UNION ALL
SELECT record_id, 'missing_location',
  'location absent; defaulted to Unknown_Room',
  'location_raw', NULL, 'LOW'
FROM raw_readings WHERE location_raw IS NULL""",

    // Mirrors the Spark audit: same QI grouping, same ELSE-0 sums (an
    // empty below-k set must count 0, not NULL), same single division.
    "k_anonymity_audit" -> """
WITH groups AS (
  SELECT c_mktsegment, c_nationkey,
    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
    CAST(count(*) AS BIGINT) AS gsz
  FROM customer GROUP BY 1, 2, 3
), a AS (
  SELECT CAST(count(*) AS BIGINT) AS n_groups,
    CAST(sum(gsz) AS BIGINT) AS n_rows,
    CAST(min(gsz) AS BIGINT) AS min_group_size,
    CAST(sum(CASE WHEN gsz < 2  THEN 1   ELSE 0 END) AS BIGINT) AS g2,
    CAST(sum(CASE WHEN gsz < 2  THEN gsz ELSE 0 END) AS BIGINT) AS r2,
    CAST(sum(CASE WHEN gsz < 5  THEN 1   ELSE 0 END) AS BIGINT) AS g5,
    CAST(sum(CASE WHEN gsz < 5  THEN gsz ELSE 0 END) AS BIGINT) AS r5,
    CAST(sum(CASE WHEN gsz < 10 THEN 1   ELSE 0 END) AS BIGINT) AS g10,
    CAST(sum(CASE WHEN gsz < 10 THEN gsz ELSE 0 END) AS BIGINT) AS r10
  FROM groups
)
SELECT k, groups_below_k, rows_below_k, n_groups, n_rows, min_group_size,
  CAST(rows_below_k AS DOUBLE) / CAST(n_rows AS DOUBLE) AS risk_frac
FROM (
  SELECT 2 AS k, g2 AS groups_below_k, r2 AS rows_below_k, n_groups, n_rows, min_group_size FROM a
  UNION ALL SELECT 5, g5, r5, n_groups, n_rows, min_group_size FROM a
  UNION ALL SELECT 10, g10, r10, n_groups, n_rows, min_group_size FROM a
)""",

    // Mirrors the Spark audit: same QI grouping, same distinct-count of
    // the sensitive attribute, same ELSE-0 sums and single division.
    "l_diversity_audit" -> """
WITH groups AS (
  SELECT c_nationkey,
    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
    CAST(count(*) AS BIGINT) AS gsz,
    CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l
  FROM customer GROUP BY 1, 2
), a AS (
  SELECT CAST(count(*) AS BIGINT) AS n_groups,
    CAST(sum(gsz) AS BIGINT) AS n_rows,
    CAST(min(l) AS BIGINT) AS min_l,
    CAST(sum(CASE WHEN l < 2 THEN 1   ELSE 0 END) AS BIGINT) AS g2,
    CAST(sum(CASE WHEN l < 2 THEN gsz ELSE 0 END) AS BIGINT) AS r2,
    CAST(sum(CASE WHEN l < 3 THEN 1   ELSE 0 END) AS BIGINT) AS g3,
    CAST(sum(CASE WHEN l < 3 THEN gsz ELSE 0 END) AS BIGINT) AS r3,
    CAST(sum(CASE WHEN l < 5 THEN 1   ELSE 0 END) AS BIGINT) AS g5,
    CAST(sum(CASE WHEN l < 5 THEN gsz ELSE 0 END) AS BIGINT) AS r5
  FROM groups
)
SELECT l, groups_below_l, rows_below_l, n_groups, n_rows, min_l,
  CAST(rows_below_l AS DOUBLE) / CAST(n_rows AS DOUBLE) AS risk_frac
FROM (
  SELECT 2 AS l, g2 AS groups_below_l, r2 AS rows_below_l, n_groups, n_rows, min_l FROM a
  UNION ALL SELECT 3, g3, r3, n_groups, n_rows, min_l FROM a
  UNION ALL SELECT 5, g5, r5, n_groups, n_rows, min_l FROM a
)""",

    // Mirrors the Spark audit exactly: same (QI, band) count, same grid
    // completion with 0-filled missing cells, same per-group cumulative,
    // cum_all derived as Σ_g cum_g, same integer-scaled EMD numerator and
    // n_g·N·(m−1) denominator, one final division.
    "t_closeness_audit" -> """
WITH cnt AS (
  SELECT CAST(c_nationkey AS BIGINT) AS g,
    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band,
    CAST(count(*) AS BIGINT) AS c
  FROM customer GROUP BY 1, 2
), groups AS (
  SELECT g, CAST(sum(c) AS BIGINT) AS n_g FROM cnt GROUP BY g
), bands AS (
  SELECT DISTINCT band FROM cnt
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS m FROM bands
), total AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_all FROM cnt
), grid AS (
  SELECT groups.g, bands.band, groups.n_g, coalesce(cnt.c, 0) AS c
  FROM groups CROSS JOIN bands
  LEFT JOIN cnt ON cnt.g = groups.g AND cnt.band = bands.band
), cum AS (
  SELECT g, band, n_g,
    CAST(sum(c) OVER (PARTITION BY g ORDER BY band) AS BIGINT) AS cum_g
  FROM grid
), cum_all AS (
  SELECT band, CAST(sum(cum_g) AS BIGINT) AS cum_all FROM cum GROUP BY band
), e AS (
  SELECT cum.g AS c_nationkey, cum.n_g, total.n_all,
    CAST(sum(abs(cum.cum_g * total.n_all - cum_all.cum_all * cum.n_g)) AS BIGINT)
      AS emd_num
  FROM cum JOIN cum_all ON cum.band = cum_all.band CROSS JOIN total
  GROUP BY 1, 2, 3
)
SELECT c_nationkey, n_g AS n_rows, emd_num,
  n_g * n_all * ((SELECT m FROM m) - 1) AS emd_den,
  CAST(emd_num AS DOUBLE)
    / CAST(n_g * n_all * ((SELECT m FROM m) - 1) AS DOUBLE) AS emd
FROM e""",

    "pipeline_report" -> """
SELECT 'events.parquet' AS file_name,
  count(*) AS n_records,
  count(DISTINCT user_id) AS n_users,
  CAST(min(ts) AS TIMESTAMP) AS first_ts,
  CAST(max(ts) AS TIMESTAMP) AS last_ts,
  'completed' AS processing_status
FROM events""",

    "benford_digits" -> {
      val cases = benfordExpected.zipWithIndex
        .map { case (e, i) => s"WHEN ${i + 1} THEN $e" }.mkString(" ")
      s"""
WITH digits AS (
  SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS lead_digit,
         count(*) AS n
  FROM orders WHERE o_totalprice >= 1.0
  GROUP BY 1
), f AS (
  SELECT lead_digit, n,
    CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) AS frac,
    CASE lead_digit $cases END AS expected
  FROM digits
)
SELECT lead_digit, n, frac,
  CAST(round((frac - expected) * 1e9, 0) AS BIGINT) AS dev_benford_q
FROM f"""
    },

    "chi_square_independence" -> """
WITH cells AS (
  SELECT event_type, user_id % 4 AS grp, count(*) AS n_cell
  FROM events GROUP BY 1, 2
), m AS (
  SELECT n_cell,
    event_type, grp,
    CAST(sum(n_cell) OVER (PARTITION BY event_type) AS DOUBLE) AS rt,
    CAST(sum(n_cell) OVER (PARTITION BY grp) AS DOUBLE) AS ct,
    CAST(sum(n_cell) OVER () AS DOUBLE) AS tot
  FROM cells
), q AS (
  SELECT event_type, grp,
    CAST(round(
      (CAST(n_cell AS DOUBLE) - rt * ct / tot) *
      (CAST(n_cell AS DOUBLE) - rt * ct / tot) / (rt * ct / tot) * 1e6, 0)
    AS BIGINT) AS qv
  FROM m
)
SELECT CAST(sum(qv) AS DOUBLE) / 1e6 AS chi2,
  (count(DISTINCT event_type) - 1) * (count(DISTINCT grp) - 1) AS dof,
  count(*) AS n_cells
FROM q""",

    "heavy_hitters_tokens" -> s"""
WITH toks AS (
  SELECT unnest(${Text.tokensSql("text")}) AS tok FROM documents
)
SELECT tok, count(*) AS cnt
FROM toks
GROUP BY tok
HAVING count(*) * 50 > (SELECT count(*) FROM toks)""",

    "rolling_median_value" -> """
WITH m AS (
  SELECT event_id, user_id, value,
    list_sort(list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS arr
  FROM events WHERE value IS NOT NULL
), n AS (
  SELECT event_id, user_id, value, arr, len(arr) AS nn FROM m
)
SELECT event_id, user_id, value,
  CASE WHEN nn % 2 = 1 THEN arr[(nn + 1) // 2]
       ELSE arr[nn // 2] + (arr[nn // 2 + 1] - arr[nn // 2]) * 0.5
  END AS roll_median
FROM n""",

    "editdist_simjoin" -> """
WITH keys AS (
  SELECT p_name || '#' || CAST(p_size AS VARCHAR) AS name FROM part
), names AS (
  SELECT name, count(*) AS n,
    split_part(name, ' ', 1) AS tok1, length(name) AS len
  FROM keys GROUP BY 1, 3, 4
)
SELECT a.name AS name_a, b.name AS name_b,
  CAST(levenshtein(a.name, b.name) AS INT) AS dist,
  a.n AS n_a, b.n AS n_b, a.n * b.n AS pair_count
FROM names a JOIN names b
  ON a.tok1 = b.tok1
 AND a.name < b.name
 AND abs(a.len - b.len) <= 2
 AND levenshtein(a.name, b.name) <= 2"""
  )
}
