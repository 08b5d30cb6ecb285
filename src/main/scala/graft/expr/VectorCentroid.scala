package graft.expr

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface: element-wise centroid of float vectors via
  * `org.apache.spark.sql.expressions.Aggregator` — the custom-aggregate
  * extension point SURVEY §7.4 reserves for vector ops Spark lacks.
  *
  * Accumulation is DECIMAL-exact per element (the [[Exact]] trick):
  * partial-aggregation merge order is non-deterministic across partitions,
  * so double sums would drift in the low bits and break the DuckDB oracle
  * hash-compare. Each element is widened float→decimal(scale 10,
  * HALF_UP — DuckDB's cast rounds ties the same way, verified), summed
  * associatively, and divided once at finish — bit-identical to the
  * oracle's `SUM(CAST(embedding[i] AS DECIMAL(27,10))) / COUNT(*)`.
  */
object VectorCentroid extends Aggregator[Array[Float], (Array[JBigDecimal], Long), Array[Double]] {

  private val Dim = 64

  override def zero: (Array[JBigDecimal], Long) =
    (Array.fill(Dim)(JBigDecimal.ZERO), 0L)

  override def reduce(b: (Array[JBigDecimal], Long), v: Array[Float]): (Array[JBigDecimal], Long) = {
    val (sums, n) = b
    var i = 0
    while (i < Dim && i < v.length) {
      // DuckDB converts FLOAT→DECIMAL via the float's SHORTEST decimal
      // representation (0.1f → 0.1000000000, not 0.1000000014901…);
      // Float.toString has the same shortest-repr contract, so parsing it
      // reproduces DuckDB's cast exactly
      sums(i) = sums(i).add(
        new JBigDecimal(java.lang.Float.toString(v(i)))
          .setScale(10, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    (sums, n + 1)
  }

  override def merge(a: (Array[JBigDecimal], Long), b: (Array[JBigDecimal], Long)): (Array[JBigDecimal], Long) = {
    val out = new Array[JBigDecimal](Dim)
    var i = 0
    while (i < Dim) { out(i) = a._1(i).add(b._1(i)); i += 1 }
    (out, a._2 + b._2)
  }

  override def finish(r: (Array[JBigDecimal], Long)): Array[Double] = {
    val (sums, n) = r
    if (n == 0) Array.empty[Double]
    else sums.map(s => s.doubleValue() / n.toDouble)
  }

  override def bufferEncoder: Encoder[(Array[JBigDecimal], Long)] =
    ExpressionEncoder[(Array[JBigDecimal], Long)]()

  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
