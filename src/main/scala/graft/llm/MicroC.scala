package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Throwaway dev A/B for dedup_containment's vocabulary rank (r17):
  * window row_number vs Ranks.globalRowNumber vs range-sort + mid.
  * Usage: runMain graft.llm.MicroC <sfDir>
  */
object MicroC {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local("graft-microc")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    def t(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"MICROC $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    def run(rankFn: DataFrame => DataFrame): DataFrame = {
      val (members, reps) = TextDedup.collapsedOf(spark, dir)
      val flat = reps.select(col("fp"), explode(col("grams")).as("g"))
      val gdf = flat.groupBy("g").agg(count(lit(1)).as("df"))
      val grk = rankFn(gdf)
      val perRep = flat.join(grk.select("g", "rk"), "g")
        .groupBy("fp")
        .agg(sort_array(collect_list(col("rk"))).as("arr"),
          count(lit(1)).as("n1c"))
        .withColumn("plen",
          (col("n1c") - expr("(n1c * 4 + 4) div 5") + 1).cast("int"))
        .localCheckpoint()
      val prefix = perRep.select(col("fp").as("fp1"),
        explode(slice(col("arr"), lit(1), col("plen"))).as("rk"))
      val cands = prefix
        .join(perRep.select(col("fp").as("fp2"), explode(col("arr")).as("rk")), "rk")
        .filter(col("fp1") =!= col("fp2"))
        .select("fp1", "fp2").distinct()
      val repPairs = cands
        .join(perRep.select(col("fp").as("fp1"), col("arr").as("arr1")), "fp1")
        .join(perRep.select(col("fp").as("fp2"), col("arr").as("arr2")), "fp2")
        .withColumn("n_shared",
          size(array_intersect(col("arr1"), col("arr2"))))
        .withColumn("containment",
          col("n_shared").cast("double") / size(col("arr1")).cast("double"))
        .filter(col("containment") >= TextDedup.ContainmentThreshold)
        .select("fp1", "fp2", "n_shared", "containment")
      repPairs
        .join(members.select(col("fp").as("fp1"), col("doc_id").as("contained_doc")), "fp1")
        .join(members.select(col("fp").as("fp2"), col("doc_id").as("container_doc")), "fp2")
        .select("contained_doc", "container_doc", "n_shared", "containment")
    }
    val winFn: DataFrame => DataFrame = gdf =>
      gdf.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("df"), col("g"))).cast("long"))
    val grnFn: DataFrame => DataFrame = gdf =>
      graft.operators.Ranks.globalRowNumber(gdf, Seq(col("df"), col("g")), "rk")
    val midFn: DataFrame => DataFrame = gdf =>
      gdf.repartitionByRange(col("df"), col("g"))
        .sortWithinPartitions("df", "g")
        .withColumn("rk", monotonically_increasing_id())
    for (pass <- 1 to 4) {
      t(s"A window      p$pass") { run(winFn).write.format("noop").mode("overwrite").save() }
      t(s"B globalRowNo p$pass") { run(grnFn).write.format("noop").mode("overwrite").save() }
      t(s"C mid         p$pass") { run(midFn).write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
