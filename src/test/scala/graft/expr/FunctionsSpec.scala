package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FunctionsSpec extends SparkSpec {

  test("dataQualityScore spans [0,1] and weights 0.7/0.3 (M3)") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(
      (Some(1), Some(2), Some(3)),
      (Some(1), None, None),
      (None: Option[Int], None: Option[Int], None: Option[Int])
    ).toDF("r1", "r2", "o1")
    val scored = df.select(
      Functions.dataQualityScore(Seq(col("r1"), col("r2")), Seq(col("o1"))).as("q"))
      .as[Double].collect()
    assert(math.abs(scored(0) - 1.0) < 1e-9)   // all present
    assert(math.abs(scored(1) - 0.35) < 1e-9)  // one of two required
    assert(math.abs(scored(2) - 0.0) < 1e-9)   // none present
  }

  test("dataQualityScore is total on degenerate inputs (round-1 ADVICE)") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(1).toDF("x")
    // both empty -> constant 0.0, no exception
    val r = df.select(Functions.dataQualityScore(Nil, Nil).as("q")).head().getDouble(0)
    assert(r === 0.0)
    // empty required with optional present is rejected, not Infinity
    intercept[IllegalArgumentException] {
      Functions.dataQualityScore(Nil, Seq(col("x")))
    }
  }
}
