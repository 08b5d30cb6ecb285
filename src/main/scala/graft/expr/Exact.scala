package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic ("bit-exact across engines") aggregate builders.
  *
  * Plain `sum`/`avg`/`stddev` over doubles are summation-order dependent —
  * Spark's partial/final hash aggregation and DuckDB's single-threaded scan
  * accumulate in different orders, so the last few bits differ and the
  * driver's hash-compare would flake. These builders make the float math
  * order-independent:
  *
  *  - sums go through a fixed-scale DECIMAL (exact, associative), then cast
  *    back to double;
  *  - averages divide that exact sum by the exact count (one double divide,
  *    identical on both engines);
  *  - stddev_samp is expanded to the textbook `sqrt((Σx² − (Σx)²/n)/(n−1))`
  *    with both Σ computed exactly — numerically "naive" but bit-reproducible,
  *    and fine at the value magnitudes of the testdata/reference (IoT
  *    temperatures, TPC-H prices).
  *
  * Each builder has a `...Sql` twin that renders the *same arithmetic* in
  * DuckDB dialect for `SparkEntry.oracleSql`, keeping the two expression
  * trees in lock-step (same operand order → same IEEE results).
  *
  * At 100 TB this costs nothing extra: decimal sums are still one map-side
  * partial + one merge, stay inside whole-stage codegen, and shuffle the same
  * bytes as a double sum.
  */
object Exact {
  private val SumDec = DecimalType(27, 6)
  private val SqDec  = DecimalType(38, 10)

  /** Order-independent SUM over a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(SumDec)).cast("double")
  def dsumSql(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(27,6))) AS DOUBLE)"

  /** Order-independent AVG (sum-exact / count). Null-skipping like AVG. */
  def davg(c: Column): Column = dsum(c) / count(c).cast("double")
  def davgSql(e: String): String =
    s"(${dsumSql(e)} / CAST(COUNT($e) AS DOUBLE))"

  /** Order-independent sample standard deviation (stddev_samp semantics:
    * null below 2 observations). */
  def dstd(c: Column): Column = {
    val n  = count(c).cast("double")
    val s  = dsum(c)
    val sq = sum((c * c).cast(SqDec)).cast("double")
    when(count(c) > 1,
      sqrt(greatest((sq - s * s / n) / (n - lit(1.0)), lit(0.0)))
    ).otherwise(lit(null).cast("double"))
  }
  def dstdSql(e: String): String = {
    val n  = s"CAST(COUNT($e) AS DOUBLE)"
    val s  = dsumSql(e)
    val sq = s"CAST(SUM(CAST(($e) * ($e) AS DECIMAL(38,10))) AS DOUBLE)"
    s"CASE WHEN COUNT($e) > 1 THEN sqrt(greatest(($sq - $s * $s / $n) / ($n - CAST(1.0 AS DOUBLE)), CAST(0.0 AS DOUBLE))) ELSE NULL END"
  }

  /** Integer SUM as BIGINT on both engines (DuckDB SUM(int) is HUGEINT;
    * Spark is LONG — align on LONG/BIGINT). */
  def dsumLong(c: Column): Column = sum(c.cast("long"))

  /** SUM of a 0/1 CASE as BIGINT on both engines (DuckDB SUM(int) is
    * HUGEINT; Spark is LONG — align on LONG/BIGINT). */
  def cntIf(flag: Column): Column = sum(when(flag, 1L).otherwise(0L))
  def cntIfSql(e: String): String =
    s"CAST(SUM(CASE WHEN $e THEN 1 ELSE 0 END) AS BIGINT)"
}
