package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic ("bit-exact across engines") aggregate builders.
  *
  * Plain `sum`/`avg`/`stddev` over doubles are summation-order dependent —
  * Spark's partial/final hash aggregation and DuckDB's single-threaded scan
  * accumulate in different orders, so the last few bits differ and the
  * driver's hash-compare would flake. These builders make the float math
  * order-independent:
  *
  *  - sums quantize to fixed-point and accumulate exactly on an int128
  *    ([[Sum128]] — associative, allocation-free, mergeable);
  *  - averages divide that exact sum by the exact count (one double divide,
  *    identical on both engines);
  *  - stddev_samp / covar_samp / corr are expanded to the textbook
  *    sum-of-squares forms with every Σ exact — numerically "naive" but
  *    bit-reproducible, and fine at the value magnitudes of the
  *    testdata/reference (IoT temperatures, TPC-H prices).
  *
  * Each builder has a `...Sql` twin that renders the *same arithmetic* in
  * DuckDB dialect for `SparkEntry.oracleSql`, keeping the two expression
  * trees in lock-step (same operand order → same IEEE results).
  *
  * At 100 TB this costs nothing extra: the sums are one map-side partial +
  * one 16-byte merge per partition, and the int128 range covers ~10^22 rows
  * at these scales.
  */
object Exact {

  /** Fixed-point scales. Plain sums quantize at 1e-6 (range contract:
    * |x| < 9e8); product sums (x², x·y) at 1e-4 (|x·y| < 9e11). Inputs
    * here are ≤2-decimal business values (prices, temperatures, rates), so
    * the quantization is value-aligned — it drops no real information —
    * and the identical `round(x·10^s)` happens on both engines. See
    * [[Sum128]] for the accumulator and the parity argument. */
  private[graft] val SumScale = 6
  private[graft] val SqScale  = 4

  /** Order-independent SUM over a double column, returned as double. */
  def dsum(c: Column): Column = Sum128.sum128(c, SumScale)
  def dsumSql(e: String): String = Sum128.sql(e, SumScale)

  /** Order-independent AVG (sum-exact / count). Null-skipping like AVG. */
  def davg(c: Column): Column = dsum(c) / count(c).cast("double")
  def davgSql(e: String): String =
    s"(${dsumSql(e)} / CAST(COUNT($e) AS DOUBLE))"

  /** Order-independent sample standard deviation (stddev_samp semantics:
    * null below 2 observations). */
  def dstd(c: Column): Column = {
    val n  = count(c).cast("double")
    val s  = dsum(c)
    val sq = Sum128.sum128(c * c, SqScale)
    when(count(c) > 1,
      sqrt(greatest((sq - s * s / n) / (n - lit(1.0)), lit(0.0)))
    ).otherwise(lit(null).cast("double"))
  }
  def dstdSql(e: String): String = {
    val n  = s"CAST(COUNT($e) AS DOUBLE)"
    val s  = dsumSql(e)
    val sq = Sum128.sql(s"($e) * ($e)", SqScale)
    s"CASE WHEN COUNT($e) > 1 THEN sqrt(greatest(($sq - $s * $s / $n) / ($n - CAST(1.0 AS DOUBLE)), CAST(0.0 AS DOUBLE))) ELSE NULL END"
  }

  /** Order-independent sample covariance: (Σxy − ΣxΣy/n) / (n−1), all Σ
    * exact. Pairwise-complete semantics are NOT replicated — callers pass
    * non-null columns (the testdata facts have no nulls in these fields). */
  def dcovarSamp(x: Column, y: Column): Column = {
    val n  = count(lit(1)).cast("double")
    val sx = dsum(x)
    val sy = dsum(y)
    val sxy = Sum128.sum128(x * y, SqScale)
    when(count(lit(1)) > 1, (sxy - sx * sy / n) / (n - lit(1.0)))
      .otherwise(lit(null).cast("double"))
  }
  def dcovarSampSql(xe: String, ye: String): String = {
    val n  = "CAST(COUNT(*) AS DOUBLE)"
    val sx = dsumSql(xe)
    val sy = dsumSql(ye)
    val sxy = Sum128.sql(s"($xe) * ($ye)", SqScale)
    s"CASE WHEN COUNT(*) > 1 THEN ($sxy - $sx * $sy / $n) / ($n - CAST(1.0 AS DOUBLE)) ELSE NULL END"
  }

  /** Order-independent Pearson correlation: covar_samp / (σx · σy), exact
    * sums throughout, NULL when either σ is 0 or n < 2. */
  def dcorr(x: Column, y: Column): Column =
    when(count(lit(1)) > 1 && dstd(x) > 0 && dstd(y) > 0,
      dcovarSamp(x, y) / (dstd(x) * dstd(y)))
      .otherwise(lit(null).cast("double"))
  def dcorrSql(xe: String, ye: String): String =
    s"CASE WHEN COUNT(*) > 1 AND ${dstdSql(xe)} > 0 AND ${dstdSql(ye)} > 0 THEN ${dcovarSampSql(xe, ye)} / (${dstdSql(xe)} * ${dstdSql(ye)}) ELSE NULL END"

  /** Exact SUM over a window frame. Uses the DECIMAL accumulator (not
    * [[Sum128]] — windowed imperative aggregates re-evaluate per frame):
    * per-frame sums are small enough that decimal cost is irrelevant, and
    * the VARCHAR hop in the twin keeps the final conversion single-rounded. */
  def winSum(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast(org.apache.spark.sql.types.DecimalType(27, 6))).over(w).cast("double")

  /** DuckDB twin of [[winSum]]; interpolate as `winSumSql(e, "w")` with the
    * WINDOW clause named in the query. */
  def winSumSql(e: String, win: String = "w"): String =
    s"CAST(CAST(SUM(CAST(($e) AS DECIMAL(27,6))) OVER $win AS VARCHAR) AS DOUBLE)"

  /** Integer SUM as BIGINT on both engines (DuckDB SUM(int) is HUGEINT;
    * Spark is LONG — align on LONG/BIGINT). */
  def dsumLong(c: Column): Column = sum(c.cast("long"))

  /** SUM of a 0/1 CASE as BIGINT on both engines (DuckDB SUM(int) is
    * HUGEINT; Spark is LONG — align on LONG/BIGINT). */
  def cntIf(flag: Column): Column = sum(when(flag, 1L).otherwise(0L))
  def cntIfSql(e: String): String =
    s"CAST(SUM(CASE WHEN $e THEN 1 ELSE 0 END) AS BIGINT)"
}
