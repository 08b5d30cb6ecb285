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
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("dist"))).toSet
    val names = Tables.customer(spark, sf)
      .select("c_custkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = (for {
      (k1, n1) <- names; (k2, n2) <- names if k1 < k2
      d = lev(n1, n2) if d <= 1
    } yield (k1, k2, d.toLong)).toSet
    assert(got.nonEmpty, "distance-1 neighbors must exist in the id-typo domain")
    assert(got === want)
    // no same-key or reflexive rows survive the c1 < c2 guard
    assert(got.forall { case (a, b, _) => a < b })
  }
}
