package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed exact global ranking.
  *
  * `row_number()` over an empty window partition serializes the whole
  * input through ONE task — the classic 100 TB scale-killer (PlanShapeSpec
  * pins that no registered query does it over unbounded input). The exact
  * same total order can be computed distributed with the standard two-pass
  * shape every large-scale engine uses:
  *
  *   1. range-partition + sort by the order keys (a distributed sort —
  *      Spark samples split points, every partition sorts in parallel);
  *   2. assign indices from per-partition offsets (`zipWithIndex` — one
  *      lightweight count job, then a narrow map).
  *
  * The order must be TOTAL (include a tiebreaker column) for the result to
  * be deterministic and oracle-comparable; range partitioning never splits
  * equal keys across partitions, so a total order guarantees the global
  * index equals the single-task `row_number`.
  */
object Ranks {

  /** Append a 1-based BIGINT `out` column holding the exact global
    * row_number of the TOTAL order `order`. Project `df` to the minimal
    * columns first — the two passes carry every column through the sort. */
  def globalRowNumber(df: DataFrame, order: Seq[Column], out: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = StructType(sorted.schema.fields :+ StructField(out, LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked, schema)
  }
}
