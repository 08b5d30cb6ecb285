package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The custom bounded-heap top-k operator must (a) return exactly the rows
  * the window row_number pattern returns under the same total order, (b)
  * plan as partial -> exchange -> final with NO sort, and (c) prune
  * map-side so the exchange carries at most k rows per (partition, group). */
class TopKSpec extends SparkSpec {

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
    Tables.part(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  private def heapTopK(k: Int) =
    TopK.perKey(Tables.part(spark, sf),
      Seq("p_brand"),
      Seq("p_retailprice" -> false, "p_partkey" -> true), k)

  test("returns exactly the window row_number rows for several k") {
    for (k <- Seq(1, 3, 7)) {
      val expected = windowTopK(k).collect().map(_.toSeq).toSet
      val got = heapTopK(k).collect().map(_.toSeq).toSet
      assert(got === expected, s"k=$k")
    }
  }

  test("plans partial -> exchange -> final, with no Sort operator") {
    val plan = heapTopK(3).queryExecution.executedPlan.toString
    assert("TopKPerGroup ".r.findAllIn(plan).size == 2, "partial + final stages")
    assert(plan.contains("Exchange"))
    assert(!plan.contains("Sort "), "bounded heaps, not a per-group sort")
  }

  test("property: matches the window pattern on random data for random k") {
    val s0 = spark
    import s0.implicits._
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 5) {
      val n = 200 + rnd.nextInt(800)
      val rows = Seq.fill(n)((rnd.nextInt(12), rnd.nextInt(100).toDouble, rnd.nextLong()))
      val df = rows.toDF("key", "score", "id").repartition(1 + rnd.nextInt(15))
      val k = 1 + rnd.nextInt(9)
      val w = Window.partitionBy("key").orderBy(col("score").desc, col("id").asc)
      val expected = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .drop("rn").collect().map(_.toSeq).toSet
      val got = TopK.perKey(df, Seq("key"), Seq("score" -> false, "id" -> true), k)
        .collect().map(_.toSeq).toSet
      assert(got === expected, s"trial=$trial k=$k n=$n")
    }
  }

  test("ranked variant matches the window row_number column exactly") {
    val w = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
    val expected = Tables.part(spark, sf)
      .withColumn("rank_in_brand", row_number().over(w))
      .filter(col("rank_in_brand") <= 5)
      .collect().map(_.toSeq).toSet
    val got = TopK.perKeyRanked(Tables.part(spark, sf),
      Seq("p_brand"), Seq("p_retailprice" -> false, "p_partkey" -> true), 5,
      rankCol = "rank_in_brand")
      .collect().map(_.toSeq).toSet
    assert(got === expected)
  }

  test("partial-stage flush keeps results exact (forced tiny threshold)") {
    val saved = TopKPerGroupExec.PartialFlushRows
    try {
      // force a flush every 8 retained rows: the map-side prune degrades
      // to near-passthrough, the final stage must still be exact
      TopKPerGroupExec.PartialFlushRows = 8L
      for (k <- Seq(1, 3)) {
        val expected = windowTopK(k).collect().map(_.toSeq).toSet
        val got = heapTopK(k).collect().map(_.toSeq).toSet
        assert(got === expected, s"k=$k under forced flush")
      }
    } finally TopKPerGroupExec.PartialFlushRows = saved
  }

  test("optimizer rule rewrites the SQL window idiom to TopKPerGroup, same rows") {
    Tables.part(spark, sf).createOrReplaceTempView("graft_part_rule")
    val sql = """
      SELECT * FROM (
        SELECT p_partkey, p_brand, p_retailprice,
               row_number() OVER (PARTITION BY p_brand
                 ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
        FROM graft_part_rule) WHERE rn <= 3"""
    val off = spark.sql(sql)
    val offPlan = off.queryExecution.executedPlan.toString
    val offRows = off.collect().map(_.toSeq).toSet
    assert(!offPlan.contains("TopKPerGroup"), "rule must be off by default")
    spark.conf.set(RewriteWindowTopK.ConfKey, "true")
    try {
      val on = spark.sql(sql)
      val onPlan = on.queryExecution.executedPlan.toString
      assert(onPlan.contains("TopKPerGroup"), s"rewrite did not fire:\n$onPlan")
      assert(!onPlan.contains("Window"), s"window survived the rewrite:\n$onPlan")
      assert(on.collect().map(_.toSeq).toSet === offRows)
    } finally spark.conf.set(RewriteWindowTopK.ConfKey, "false")
  }

  test("optimizer rule leaves rank/multi-window/global patterns alone") {
    Tables.part(spark, sf).createOrReplaceTempView("graft_part_rule2")
    spark.conf.set(RewriteWindowTopK.ConfKey, "true")
    try {
      // rank() is not row_number: ties semantics differ — must not rewrite
      val rank = spark.sql("""
        SELECT * FROM (
          SELECT p_partkey, rank() OVER (PARTITION BY p_brand
            ORDER BY p_retailprice DESC) AS r
          FROM graft_part_rule2) WHERE r <= 3""")
      assert(!rank.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
      // no PARTITION BY: global top-k is TakeOrdered's job — must not rewrite
      val global = spark.sql("""
        SELECT * FROM (
          SELECT p_partkey, row_number() OVER (
            ORDER BY p_retailprice DESC, p_partkey) AS rn
          FROM graft_part_rule2) WHERE rn <= 3""")
      assert(!global.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    } finally spark.conf.set(RewriteWindowTopK.ConfKey, "false")
  }

  test("handles groups smaller than k and a single group") {
    val withG = Tables.region(spark, sf).withColumn("g", lit(1))
    val all = TopK.perKey(withG, Seq("g"), Seq("r_regionkey" -> true), 100)
    assert(all.count() === Tables.region(spark, sf).count())
    val two = TopK.perKey(withG, Seq("g"), Seq("r_regionkey" -> true), 2)
    assert(two.select("r_regionkey").collect().map(_.get(0).toString.toLong).sorted.toSeq === Seq(0L, 1L))
  }
}
