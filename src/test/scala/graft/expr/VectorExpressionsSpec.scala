package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorExpressionsSpec extends SparkSpec {

  test("graft_dot is callable from SQL via the session extension") {
    val r = spark.sql(
      "SELECT graft_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(0.5 AS FLOAT)))").head().getDouble(0)
    assert(r === 1.5f.toDouble * 3.0f.toDouble + 2.0f.toDouble * 0.5f.toDouble)
  }

  test("VectorCentroid is invariant under partitioning (decimal-exact merge)") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(300)((rnd.nextInt(4), Array.fill(64)(rnd.nextFloat() - 0.5f)))
    val centroid = udaf(VectorCentroid,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
    def run(parts: Int): Map[Int, Seq[Double]] =
      rows.toDF("label", "embedding").repartition(parts)
        .groupBy("label").agg(centroid(col("embedding")).as("c"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val a = run(1); val b = run(13)
    assert(a.keySet === b.keySet)
    a.keys.foreach(k => assert(a(k) === b(k), s"label $k"))
  }

  test("codegen path matches the interpreted eval and the JVM kernel") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(1)
    val rows = Seq.fill(100)((
      Array.fill(64)(rnd.nextFloat() - 0.5f),
      Array.fill(64)(rnd.nextFloat() - 0.5f)))
    val df = rows.toDF("a", "b")
    val got = df.select(VectorExpressions.dotF(col("a"), col("b"))).as[Double].collect()
    val expected = rows.map { case (a, b) =>
      var acc = 0.0; var i = 0
      while (i < 64) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    assert(got.toSeq === expected)
  }
}
