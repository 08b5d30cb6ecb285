package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {

  private lazy val skewed = {
    val spark0 = spark
    import spark0.implicits._
    // 90% of rows share one hot key
    (1 to 10000).map(i => (if (i % 10 == 0) s"key${i % 100}" else "HOT", i)).toDF("k", "v")
  }

  test("salted count equals direct groupBy count") {
    val direct = skewed.groupBy(col("k")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(skewed, col("k"), salts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === direct)
  }

  test("salted join equals plain join") {
    val spark0 = spark
    import spark0.implicits._
    val dim = Seq(("HOT", "hot-dim"), ("key10", "cold-dim")).toDF("k", "label")
    val plain = skewed.join(dim, "k").groupBy("label").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 8).groupBy("label").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }
}
