package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the LLM-data-pipeline operators.
  *
  * Tokenization must be *identical* between the Spark expressions and the
  * DuckDB oracle SQL (the driver hash-compares results), so each builder
  * here has a `...Sql` twin rendering the same semantics in DuckDB dialect:
  * lowercase → split on runs of non-alphanumerics → drop empty tokens.
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * higher-order array functions — no UDFs — so the per-row text work stays
  * inside whole-stage codegen and scales linearly with executors.
  */
object Text {

  /** lower → split on non-alphanumeric runs → drop empties. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  def tokensSql(text: String): String =
    s"list_filter(string_split_regex(lower($text), '[^a-z0-9]+'), t -> t <> '')"

  /** Distinct word n-grams (space-joined). Empty array when fewer than n
    * tokens. 1-based indexing on both engines. */
  def ngrams(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(0))),
      i => concat_ws(" ", (0 until n).map(o => element_at(toks, (i + o).cast("int"))): _*)
    )
    array_distinct(when(size(toks) >= n, grams).otherwise(array().cast("array<string>")))
  }

  def ngramsSql(toksExpr: String, n: Int): String = {
    val parts = (0 until n).map(o => if (o == 0) "w[i]" else s"w[i+$o]").mkString(" || ' ' || ")
    s"(SELECT list_distinct(list_transform(generate_series(1, greatest(len(w)-${n - 1}, 0)), i -> $parts)) FROM (SELECT $toksExpr AS w))"
  }

  /** Word n-grams WITH multiplicity (no distinct) — the term stream for
    * frequency-weighted models (tf vectors), where repeated n-grams must
    * count, unlike the set semantics of [[ngrams]]. */
  def ngramsAll(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(0))),
      i => concat_ws(" ", (0 until n).map(o => element_at(toks, (i + o).cast("int"))): _*)
    )
    when(size(toks) >= n, grams).otherwise(array().cast("array<string>"))
  }

  def ngramsAllSql(toksExpr: String, n: Int): String = {
    val parts = (0 until n).map(o => if (o == 0) "w[i]" else s"w[i+$o]").mkString(" || ' ' || ")
    s"(SELECT list_transform(generate_series(1, greatest(len(w)-${n - 1}, 0)), i -> $parts) FROM (SELECT $toksExpr AS w))"
  }

  /** Deterministic token code for the rolling-hash fingerprint: cheap,
    * arithmetic-only (length*31 + code of first char) so both engines
    * compute it identically. */
  def tokenCode(t: Column): Column =
    (length(t) * 31 + ascii(t)).cast("long")

  /** Polynomial rolling hash over the token stream, mod 1e9+7 — the
    * document-fingerprinting primitive (same shape as Rabin-Karp rolling
    * hashes used for content-defined chunking). */
  def rollingHash(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => (acc * 131 + tokenCode(t)) % 1000000007L)

  def rollingHashSql(toksExpr: String): String =
    s"list_reduce([CAST(0 AS BIGINT)] || list_transform($toksExpr, t -> CAST(length(t)*31 + ascii(t) AS BIGINT)), (a, b) -> (a*131 + b) % 1000000007)"

  /** Stopword marker sets for the n-gram/stopword language heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "es" -> Seq("el", "los", "las", "y", "es", "un"),
    "zh" -> Seq("de", "shi", "zai", "le", "wo")
  )
}
