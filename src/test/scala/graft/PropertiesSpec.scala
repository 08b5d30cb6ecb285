package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.expr.{Exact, Functions}

/** Property-based checks (SURVEY §5b) for the pure column builders, driven
  * through real Spark plans over ScalaCheck-generated rows. Generators are
  * sampled with fixed seeds (no scalatestplus bridge in the offline cache),
  * so runs are deterministic. */
class PropertiesSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n * 3).iterator
      .flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))
      .take(n).toSeq

  test("property: coreQualityScore is always one of the 6 valid weight sums") {
    val s0 = spark; import s0.implicits._
    val gen = Gen.listOfN(64, Gen.zip(
      Gen.option(Gen.alphaStr),
      Gen.option(Gen.choose(0L, 2000000000000L)),
      Gen.option(Gen.choose(-49.0, 99.0))))
    samples(gen, 12).foreach { rows =>
      val df = rows.map { case (d, ts, t) =>
        (d.orNull, ts.map(new java.sql.Timestamp(_)).orNull,
          t.map(BigDecimal(_)).map(_.setScale(2, BigDecimal.RoundingMode.HALF_UP)).orNull)
      }.toDF("device_id", "reading_timestamp", "temperature_celsius")
      val scores = df.select(Functions.coreQualityScore(
        col("device_id"), col("reading_timestamp"), col("temperature_celsius")).as("q"))
        .as[Double].collect()
      val valid = Set(0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
      assert(scores.forall(s => valid.exists(v => math.abs(s - v) < 1e-12)))
    }
  }

  test("property: zScore builders are non-negative (or null) for any stats") {
    val s0 = spark; import s0.implicits._
    val gen = Gen.listOfN(32, Gen.zip(
      Gen.choose(-60.0, 110.0), Gen.choose(-60.0, 110.0), Gen.choose(-5.0, 40.0)))
    samples(gen, 12).foreach { rows =>
      val df = rows.toDF("v", "m", "s")
      val out = df.select(
        Functions.zScoreOrZero(col("v"), col("m"), col("s")).as("z0"),
        Functions.zScoreOrNull(col("v"), col("m"), col("s")).as("zn")).collect()
      assert(out.forall(r => r.getDouble(0) >= 0.0))
      assert(out.forall(r => r.isNullAt(1) || r.getDouble(1) >= 0.0))
    }
  }

  test("property: Exact.dsum is invariant under row permutation and partitioning") {
    val s0 = spark; import s0.implicits._
    val gen = Gen.zip(Gen.listOfN(200, Gen.choose(-1e6, 1e6)), Gen.choose(1, 16))
    samples(gen, 8).foreach { case (xs, parts) =>
      val a = xs.toDF("v").repartition(parts)
        .agg(Exact.dsum(col("v"))).head().getDouble(0)
      val shuffled = new scala.util.Random(7).shuffle(xs)
      val b = shuffled.toDF("v").repartition(math.max(1, 17 - parts))
        .agg(Exact.dsum(col("v"))).head().getDouble(0)
      assert(a === b)
    }
  }

  test("property: Sum128 equals a driver-side BigDecimal reference") {
    val s0 = spark; import s0.implicits._
    val gen = Gen.zip(Gen.listOfN(300, Gen.choose(-9e8, 9e8)), Gen.choose(1, 32))
    samples(gen, 8).foreach { case (xs, parts) =>
      val got = xs.toDF("v").repartition(parts)
        .agg(graft.expr.Sum128.sum128(col("v"), 6)).head().getDouble(0)
      // reference: identical quantization, exact integer sum, same 2-step final
      val total = xs.map { x =>
        val scaled = x * 1e6
        if (scaled >= 0) BigInt(math.floor(scaled + 0.5).toLong)
        else BigInt(-math.floor(-scaled + 0.5).toLong)
      }.sum
      val expected = new java.math.BigDecimal(total.bigInteger).doubleValue() / 1e6
      assert(got === expected)
    }
  }

  test("property: temperature_category maps every temperature to exactly one bucket") {
    val s0 = spark; import s0.implicits._
    samples(Gen.listOfN(64, Gen.choose(-80.0, 130.0)), 12).foreach { temps =>
      val df = temps.map(t => BigDecimal(t).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .toDF("temperature_celsius")
      val t = col("temperature_celsius")
      val cat = when(t < 0, "Freezing")
        .when(t.between(0, 15), "Cold")
        .when(t.between(16, 25), "Comfortable")
        .when(t.between(26, 35), "Warm")
        .when(t > 35, "Hot")
        .otherwise("Unknown")
      val got = df.select(cat.as("c")).as[String].collect()
      assert(got.forall(Set("Freezing", "Cold", "Comfortable", "Warm", "Hot", "Unknown")))
      // the faithful gaps: fractional temps in (15,16) or (25,26) are Unknown
      val gaps = df.filter((t > 15 && t < 16) || (t > 25 && t < 26))
        .select(cat.as("c")).as[String].collect()
      assert(gaps.forall(_ == "Unknown"))
    }
  }

  test("property: globalRunningSum matches a sequential scan for any data") {
    val s0 = spark; import s0.implicits._
    val gen = Gen.listOfN(257, Gen.zip(Gen.choose(-1000L, 1000L), Gen.choose(0L, 50L)))
    samples(gen, 6).foreach { rows =>
      val df = rows.zipWithIndex
        .map { case ((key, v), i) => (i.toLong, key, v) }
        .toDF("id", "key", "v").repartition(5)
      val got = graft.operators.Ranks
        .globalRunningSum(df, Seq(col("key"), col("id")), col("v"), "cum")
        .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = rows.zipWithIndex
        .map { case ((key, v), i) => (key, i.toLong, v) }
        .sortBy { case (key, id, _) => (key, id) }
        .scanLeft((0L, 0L)) { case ((_, cum), (_, id, v)) => (id, cum + v) }
        .drop(1).toMap
      assert(got === expected)
    }
  }
}
