package graft.expr

import graft.SparkSpec

/** ZOrder16 kernel guarantees: the magic-mask interleave matches a naive
  * bit-loop reference, the interpreted and codegen paths agree, and the
  * SQL registration works. */
class ZOrderSpec extends SparkSpec {

  private def naive(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("interleave matches the naive bit-loop on random and corner inputs") {
    val rnd = new scala.util.Random(7)
    val cases = Seq((0L, 0L), (0xFFFFL, 0xFFFFL), (1L, 0L), (0L, 1L),
      (0x12345L, 0xFEDCBL)) ++ Seq.fill(1000)((rnd.nextLong(), rnd.nextLong()))
    cases.foreach { case (x, y) =>
      assert(ZOrder16.interleave(x, y) === naive(x & 0xFFFFL, y & 0xFFFFL))
    }
  }

  test("z-order groups both dimensions: high bits of z = high bits of x and y") {
    // rows whose z shares a long prefix are close in BOTH x and y — the
    // data-skipping property: check the top 2·k bits of z determine the
    // top k bits of each coordinate
    val (x, y) = (0xABCDL, 0x1234L)
    val z = ZOrder16.interleave(x, y)
    var rx = 0L; var ry = 0L
    for (i <- 0 until 16) {
      rx |= ((z >> (2 * i)) & 1L) << i
      ry |= ((z >> (2 * i + 1)) & 1L) << i
    }
    assert(rx === x && ry === y) // perfect deinterleave: z is a bijection
  }

  test("codegen and SQL registration produce the same values") {
    val s = spark
    import s.implicits._
    val df = Seq((3L, 5L), (65535L, 0L), (40000L, 20000L)).toDF("x", "y")
    df.createOrReplaceTempView("graft_zorder_probe")
    val viaColumn = df.select(ZOrder16.zorder($"x", $"y")).as[Long].collect().toSeq
    val viaSql = spark.sql(
      "SELECT graft_zorder(x, y) FROM graft_zorder_probe").as[Long].collect().toSeq
    val expected = Seq((3L, 5L), (65535L, 0L), (40000L, 20000L))
      .map { case (x, y) => ZOrder16.interleave(x, y) }
    assert(viaColumn === expected)
    assert(viaSql === expected)
  }
}
