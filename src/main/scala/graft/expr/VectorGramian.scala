package graft.expr

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass distributed Gramian: Σ_rows v·vᵀ over quantized embedding
  * vectors — the covariance/PCA building block (SURVEY §7.4's custom-
  * aggregate extension point, same surface as [[VectorCentroid]]).
  *
  * The scale argument: computing X ᵀX by self-joining the exploded
  * (row, dim, value) stream shuffles n·d² rows (the DuckDB oracle does
  * exactly that — fine at sf0.01, lethal at 100 TB). This aggregate
  * instead carries ONE fixed d²-slot buffer per partition: each input row
  * folds its outer product in place, partitions merge buffers pairwise,
  * and the shuffle moves `#partitions` buffers of 32 KiB regardless of
  * row count — the map-side-combine shape that makes a single pass over
  * 100 TB produce a 64×64 matrix.
  *
  * Arithmetic is pure int64: inputs are pre-quantized (round(e·1000) as
  * BIGINT, done in Spark SQL so the rounding engine is identical to every
  * other oracle-checked query), so sums are associative and exact in any
  * merge order — no float drift across the non-deterministic partition
  * merge. Only the upper triangle (i ≤ j) is filled; the symmetric half
  * is reconstructed by the consumer. Magnitude headroom: |e_q| ≤ ~500,
  * so each product is < 2.5e5 and int64 overflows only past ~3.7e13
  * rows — beyond 100 TB of 64-dim vectors; lower QScale one decade to
  * buy 100× more.
  */
object VectorGramian extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  private val Dim = 64

  override def zero: Array[Long] = new Array[Long](Dim * Dim)

  override def reduce(buf: Array[Long], v: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Dim && i < v.length) {
      val vi = v(i)
      var j = i
      while (j < Dim && j < v.length) {
        buf(i * Dim + j) += vi * v(j)
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < a.length) { a(k) += b(k); k += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
