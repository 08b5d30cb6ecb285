package graft.queries

import graft.{SparkSpec, Tables}

/** The SymSpell deletion-neighborhood join's correctness claim is
  * COMPLETENESS: the blocked equi-join must find exactly the pairs the
  * naive all-pairs comparison finds. At sf0.001 the brute force is 150²/2
  * driver-side DP evaluations — cheap enough to be the ground truth. */
class LinkageSpec extends SparkSpec {

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("symspell_fuzzy_join equals the brute-force levenshtein<=1 all-pairs") {
    val got = Linkage.queries("symspell_fuzzy_join")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("dist"),
        r.getAs[Long]("n1"), r.getAs[Long]("n2"),
        r.getAs[Long]("pair_count"))).toSet
    val counts = Tables.customer(spark, sf)
      .select("c_name").collect().map(_.getString(0))
      .groupBy(identity).map { case (n, xs) => n -> xs.length.toLong }
    val names = counts.keys.toSeq
    val want = (for {
      n1 <- names; n2 <- names if n1 < n2
      d = lev(n1, n2) if d <= 1
    } yield (n1, n2, d.toLong, counts(n1), counts(n2),
      counts(n1) * counts(n2))).toSet
    assert(got.nonEmpty, "distance-1 neighbors must exist in the id-typo domain")
    assert(got === want)
    // no reflexive rows survive the name1 < name2 guard
    assert(got.forall { case (a, b, _, _, _, _) => a < b })
  }
}
