package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Entity-resolution blocking: the SymSpell deletion-neighborhood fuzzy
  * self-join (Garbe's symmetric-delete algorithm, public domain). Two
  * strings are within Levenshtein distance 1 if and only if they share a
  * member of their {self} ∪ {1-deletion variants} neighborhoods — so
  * candidate generation is an EQUI-join on variant strings, complete by
  * construction for the distance bound, wherever the edit falls.
  *
  * Contrast with [[Diagnostics]]' `editdist_simjoin`, which blocks on
  * (first token, ±2 length band): that heuristic misses pairs whose edit
  * is inside the first token; the deletion neighborhood provably cannot
  * miss, at the cost of L+1 index rows per string of length L.
  *
  * Scale shape: explode L+1 neighborhood keys per name (linear in total
  * characters), ONE hash shuffle on the variant string, per-key pairing
  * (a variant deleting digit position p is shared by at most |alphabet|
  * names — bounded fan-out, never quadratic), a distinct on the pair key,
  * and a Levenshtein verification on candidates only. At 100 TB the index
  * is ~(L+1)× the name column and every stage is a keyed shuffle — the
  * same posture as the MinHash band join in [[graft.llm.TextDedup]].
  */
object Linkage {

  /** All distance-≤1 customer-name pairs (c1 < c2) with the verified
    * distance. Candidates from the deletion-neighborhood equi-join;
    * verification with Spark's threshold-bounded levenshtein. */
  def symspellFuzzyJoin(s: SparkSession, d: String): DataFrame = {
    val names = Tables.customer(s, d)
      .select(col("c_custkey").as("k"), col("c_name").as("nm"))
    // neighborhood = the name itself plus every 1-deletion variant
    val dels = names
      .withColumn("p", explode(sequence(lit(1), length(col("nm")))))
      .select(col("k"), col("nm"),
        expr("concat(substr(nm, 1, p - 1), substr(nm, p + 1, length(nm)))")
          .as("variant"))
    val index = names.select(col("k"), col("nm"), col("nm").as("variant"))
      .unionByName(dels)
    val left  = index.select(col("variant"),
      col("k").as("c1"), col("nm").as("name1"))
    val right = index.select(col("variant"),
      col("k").as("c2"), col("nm").as("name2"))
    left.join(right, "variant")
      .filter(col("c1") < col("c2"))
      .select("c1", "c2", "name1", "name2")
      .distinct()
      // 2-arg bounded form: abandons each comparison past the threshold
      .withColumn("dist", levenshtein(col("name1"), col("name2"), 1))
      .filter(col("dist") >= 0)
      .select(col("c1"), col("c2"), col("name1"), col("name2"),
        col("dist").cast("long").as("dist"))
  }

  // The one-shot oracle may brute-force what the engine must block: at
  // sf0.01 the all-pairs comparison is 1500²/2 cheap C calls in DuckDB,
  // and its completeness is what PROVES the deletion neighborhood missed
  // nothing.
  private val symspellSql: String = """
SELECT a.c_custkey AS c1, b.c_custkey AS c2,
  a.c_name AS name1, b.c_name AS name2,
  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "symspell_fuzzy_join" -> ((s, d) => symspellFuzzyJoin(s, d))
  )

  def oracles: Map[String, String] = Map(
    "symspell_fuzzy_join" -> symspellSql
  )
}
