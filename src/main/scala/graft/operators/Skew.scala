package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators (SURVEY §7.5.6; the "salting for skew" leg of
  * the 100 TB posture — AQE's skew-join split covers joins, these cover
  * aggregations and hot-key joins AQE can't rewrite).
  */
object Skew {

  /** Two-phase salted aggregation: spread each hot key over `salts`
    * sub-keys for the partial aggregate, then merge. Result is identical
    * to a direct groupBy-count/sum (counts and decimal-exact sums are
    * associative); the first shuffle fans a hot key to `salts` reducers
    * instead of one. */
  def saltedCount(df: DataFrame, key: Column, salts: Int): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("key"), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy("key")
      .agg(sum("_partial").as("n"))

  /** Replicated (broadcast-salted) join for a skewed fact against a small
    * dim: explode the dim over the salt domain so each salted fact row
    * finds its match without concentrating a hot key on one reducer.
    * Equivalent rows to a plain inner equi-join on `key`. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val explodedDim = dim.withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(explodedDim, Seq(key, "_salt")).drop("_salt")
  }
}
