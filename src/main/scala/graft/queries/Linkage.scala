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

  /** All distance-1 DISTINCT-name pairs (name1 < name2) with the verified
    * distance, each name's row multiplicity, and the recovered id-level
    * pair cardinality n1·n2. Candidates from the deletion-neighborhood
    * equi-join; verification with Spark's threshold-bounded levenshtein.
    *
    * Dedupe-before-join (the `editdist_simjoin` lesson, measured here
    * too): the id-level pair set is inherently quadratic in value
    * multiplicity — on the 10-replica scale tier the id-level variant ran
    * 391 s at sf1 vs 3 s for this collapsed plan, because every name
    * repeats 10× and each fuzzy match fans out 100×. The join runs over
    * DISTINCT names (the value domain, which replication does not grow);
    * pair_count = n1·n2 reports the id-level cardinality without
    * materializing it. */
  def symspellFuzzyJoin(s: SparkSession, d: String): DataFrame = {
    val names = Tables.customer(s, d)
      .groupBy(col("c_name").as("nm")).agg(count(lit(1)).as("n"))
    // neighborhood = the name itself plus every 1-deletion variant
    val dels = names
      .withColumn("p", explode(sequence(lit(1), length(col("nm")))))
      .select(col("nm"), col("n"),
        expr("concat(substr(nm, 1, p - 1), substr(nm, p + 1, length(nm)))")
          .as("variant"))
    val index = names.select(col("nm"), col("n"), col("nm").as("variant"))
      .unionByName(dels)
    val left  = index.select(col("variant"),
      col("nm").as("name1"), col("n").as("n1"))
    val right = index.select(col("variant"),
      col("nm").as("name2"), col("n").as("n2"))
    // The name-domain index is tiny in bytes, so AQE coalesces its shuffle
    // to 1-2 partitions and the planner broadcasts the right side — which
    // leaves the expensive part (per-variant pair fan-out + the distinct's
    // map-side partial) running on 1-2 tasks. Pin the probe side to the
    // session parallelism, keyed on the join key: under a broadcast join
    // this only spreads the fan-out stage; if the index ever outgrows the
    // broadcast threshold, the same exchange IS the join's left shuffle
    // (same key, same partition count — guide §2.4, one exchange shared).
    left.repartition(s.sparkContext.defaultParallelism, col("variant"))
      .join(right, "variant")
      .filter(col("name1") < col("name2"))
      .select("name1", "name2", "n1", "n2")
      .distinct()
      // 2-arg bounded form: abandons each comparison past the threshold
      .withColumn("dist", levenshtein(col("name1"), col("name2"), 1))
      .filter(col("dist") >= 0)
      .select(col("name1"), col("name2"),
        col("dist").cast("long").as("dist"),
        col("n1"), col("n2"), (col("n1") * col("n2")).as("pair_count"))
  }

  // The one-shot oracle may brute-force what the engine must block: at
  // sf0.01 the all-pairs comparison over distinct names is cheap C calls
  // in DuckDB, and its completeness is what PROVES the deletion
  // neighborhood missed nothing.
  private val symspellSql: String = """
WITH names AS (
  SELECT c_name AS nm, CAST(count(*) AS BIGINT) AS n FROM customer GROUP BY 1
)
SELECT a.nm AS name1, b.nm AS name2,
  CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist,
  a.n AS n1, b.n AS n2, a.n * b.n AS pair_count
FROM names a JOIN names b ON a.nm < b.nm
WHERE levenshtein(a.nm, b.nm) <= 1"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "symspell_fuzzy_join" -> ((s, d) => symspellFuzzyJoin(s, d))
  )

  def oracles: Map[String, String] = Map(
    "symspell_fuzzy_join" -> symspellSql
  )
}
