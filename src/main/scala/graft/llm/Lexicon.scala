package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Vocabulary-level corpus operators — the tokenizer/curriculum planning
  * layer of a training-data pipeline:
  *
  *  - `vocab_coverage`: the coverage curve behind vocabulary sizing — the
  *    minimum number of (frequency-ranked) bigram types needed to cover
  *    50/90/95/99 % of all bigram occurrences. The classic Zipf audit run
  *    before fixing a tokenizer's vocab size.
  *  - `keyword_tagging`: dictionary-based topic tagging — a broadcast
  *    term→tag dim joined against exploded distinct tokens, re-aggregated
  *    to a sorted per-doc tag list. The FlashText/keyword-filter shape
  *    used for cheap topical filtering at corpus scale.
  *  - `curriculum_schedule`: difficulty-ordered training schedule — per-doc
  *    difficulty = fraction of its distinct bigrams that are corpus-rare
  *    (document frequency ≤ 5 % of docs), bucketed into 4 stages, ordered
  *    easy→hard within (stage, shard). The stage is computed from the
  *    score itself (integer permille), NOT ntile — an ntile would need one
  *    global window partition over the whole corpus, which serializes at
  *    100 TB; this shape needs only the per-(stage, shard) windows.
  *
  * Scale notes: the ranked-coverage window in `vocab_coverage` never runs
  * over the corpus — frequency ranking uses the two-phase prefix pattern
  * (per-frequency partials + a tiny ordered prefix over DISTINCT counts +
  * within-frequency windows), the same shape as `ks_statistic`, so no
  * single-partition window over the gram table exists. The gram→df dim in
  * `curriculum_schedule` joins by gram (plain shuffle join — NOT forced
  * broadcast, since a web-scale vocab outgrows any broadcast budget).
  *
  * Exactness: everything hashed is integer (counts, ranks, permille via
  * integer division) except the final coverage ratio — one correctly
  * rounded division of two exact BIGINTs, identical on both engines.
  */
object Lexicon {

  /** Tokens pre-projected to an attribute column BEFORE any higher-order
    * function references them — Catalyst inlines non-attribute expressions
    * into HOF lambdas and re-evaluates them per element (the measured
    * 3.7 s-vs-0.3 s ngram trap). */
  private def docBigrams(s: SparkSession, d: String, distinctPerDoc: Boolean): DataFrame = {
    val base = Tables.documents(s, d)
      .withColumn("toks", Text.tokens(col("text")))
    val grams = if (distinctPerDoc) Text.ngrams(col("toks"), 2) else Text.ngramsAll(col("toks"), 2)
    base.select(col("doc_id"), explode(grams).as("gram"))
  }

  private val bigramsSql: String =
    s"""SELECT doc_id, unnest(CASE WHEN len(w) >= 2
    THEN list_transform(generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i+1])
    ELSE [] END) AS gram
  FROM (SELECT doc_id, ${Text.tokensSql("text")} AS w FROM documents)"""

  // --------------------------------------------------- vocab_coverage --

  private val CoveragePcts = Seq(50L, 90L, 95L, 99L)

  def vocabCoverage(s: SparkSession, d: String): DataFrame = {
    val freqs = docBigrams(s, d, distinctPerDoc = false)
      .groupBy("gram").agg(count(lit(1)).as("n"))
    // two-phase prefix: per-frequency partials, tiny ordered prefix over
    // the DISTINCT frequency values, then within-frequency windows — the
    // global (n DESC, gram) rank without a global single-partition window
    val nTot = freqs.groupBy("n").agg(count(lit(1)).as("cnt"))
      .withColumn("tok", col("n") * col("cnt"))
    val before = Window.orderBy(col("n").desc).rowsBetween(Window.unboundedPreceding, -1)
    val prefix = nTot
      .withColumn("pg", coalesce(sum("cnt").over(before), lit(0L)))
      .withColumn("pt", coalesce(sum("tok").over(before), lit(0L)))
      .select("n", "pg", "pt")
    val inN = Window.partitionBy("n").orderBy("gram")
    val ranked = freqs.join(broadcast(prefix), Seq("n"))
      .withColumn("rn", row_number().over(inN).cast("long"))
      .withColumn("rnk", col("pg") + col("rn"))
      .withColumn("cum", col("pt") + col("rn") * col("n"))
    val total = freqs.agg(sum("n").as("total_grams"))
    ranked.crossJoin(broadcast(total))
      .withColumn("pct", explode(array(CoveragePcts.map(lit): _*)))
      .filter(col("cum") * 100 >= col("pct") * col("total_grams"))
      .groupBy("pct", "total_grams")
      .agg(min("rnk").as("vocab_size"), min("cum").as("covered"))
      .withColumn("coverage",
        col("covered").cast("double") / col("total_grams").cast("double"))
      .select("pct", "vocab_size", "covered", "total_grams", "coverage")
  }

  val vocabCoverageSql: String = s"""
WITH bg AS (
  $bigramsSql
), freqs AS (
  SELECT gram, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY gram
), ranked AS (
  SELECT
    CAST(row_number() OVER (ORDER BY n DESC, gram) AS BIGINT) AS rnk,
    CAST(sum(n) OVER (ORDER BY n DESC, gram
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM freqs
), t AS (
  SELECT CAST(sum(n) AS BIGINT) AS total_grams FROM freqs
), p AS (SELECT unnest([${CoveragePcts.mkString(", ")}]) AS pct)
SELECT CAST(pct AS BIGINT) AS pct,
  CAST(min(rnk) AS BIGINT) AS vocab_size,
  CAST(min(cum) AS BIGINT) AS covered,
  total_grams,
  CAST(min(cum) AS DOUBLE) / CAST(total_grams AS DOUBLE) AS coverage
FROM ranked, t, p
WHERE cum * 100 >= pct * total_grams
GROUP BY pct, total_grams"""

  // -------------------------------------------------- keyword_tagging --

  /** Term→tag dictionary over the corpus vocabulary. A real deployment
    * loads this as a dim table; semantics are identical. */
  private val Dict: Seq[(String, String)] = Seq(
    "exec"   -> "join", "exec" -> "merge", "exec" -> "hash", "exec" -> "sort",
    "io"     -> "scan", "io" -> "stream", "io" -> "batch",
    "layout" -> "column", "layout" -> "row", "layout" -> "table", "layout" -> "part",
    "perf"   -> "fast", "perf" -> "slow", "perf" -> "big", "perf" -> "small",
    "vector" -> "vector", "vector" -> "agg", "vector" -> "window"
  )

  def keywordTagging(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dict = Dict.toDF("tag", "term")
    val docTerms = Tables.documents(s, d)
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"), explode(array_distinct(col("toks"))).as("term"))
    val tags = docTerms.join(broadcast(dict), Seq("term"))
      .select("doc_id", "tag").distinct()
      .groupBy("doc_id")
      .agg(concat_ws(",", array_sort(collect_set(col("tag")))).as("tags"),
        count(lit(1)).as("n_tags"))
    Tables.documents(s, d).select("doc_id")
      .join(tags, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("tags"), lit("")).as("tags"),
        coalesce(col("n_tags"), lit(0L)).as("n_tags"))
  }

  val keywordTaggingSql: String = {
    val vals = Dict.map { case (tag, term) => s"('$tag', '$term')" }.mkString(", ")
    s"""
WITH dict AS (SELECT * FROM (VALUES $vals) AS t(tag, term)),
dt AS (
  SELECT DISTINCT d.doc_id, dict.tag
  FROM (SELECT doc_id, unnest(list_distinct(${Text.tokensSql("text")})) AS term
        FROM documents) d
  JOIN dict USING (term)
), agg AS (
  SELECT doc_id, string_agg(tag, ',' ORDER BY tag) AS tags,
         CAST(count(*) AS BIGINT) AS n_tags
  FROM dt GROUP BY doc_id
)
SELECT d.doc_id, coalesce(a.tags, '') AS tags,
  CAST(coalesce(a.n_tags, 0) AS BIGINT) AS n_tags
FROM documents d LEFT JOIN agg a USING (doc_id)"""
  }

  // ---------------------------------------------- curriculum_schedule --

  private val Stages = 4L
  private val ScheduleShards = 4L

  def curriculumSchedule(s: SparkSession, d: String): DataFrame = {
    val docGrams = docBigrams(s, d, distinctPerDoc = true)
    val dfDim = docGrams.groupBy("gram").agg(count(lit(1)).as("df"))
    val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
    val perDoc = docGrams
      .join(dfDim, Seq("gram")) // shuffle join by design: vocab dims outgrow broadcast at scale
      .crossJoin(broadcast(nDocs))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") * 20 <= col("n_docs"), 1L).otherwise(0L)).as("n_rare"))
    val scheduled = perDoc
      .withColumn("diff_pm", expr("(n_rare * 1000000) div greatest(n_grams, 1)"))
      .withColumn("stage", least(lit(Stages - 1),
        expr(s"(n_rare * $Stages) div greatest(n_grams, 1)")))
      .withColumn("shard",
        ((col("doc_id") * 1103515245L + 12345L) % 2147483647L) % ScheduleShards)
    scheduled
      .withColumn("pos", row_number().over(
        Window.partitionBy("stage", "shard")
          .orderBy(col("diff_pm"), col("doc_id"))).cast("long"))
      .select("doc_id", "n_grams", "n_rare", "diff_pm", "stage", "shard", "pos")
  }

  val curriculumSql: String = s"""
WITH bg AS (
  SELECT DISTINCT doc_id, gram FROM ($bigramsSql)
), dfd AS (
  SELECT gram, CAST(count(*) AS BIGINT) AS df FROM bg GROUP BY gram
), n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
per_doc AS (
  SELECT bg.doc_id,
    CAST(count(*) AS BIGINT) AS n_grams,
    CAST(sum(CASE WHEN dfd.df * 20 <= n.n_docs THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
  FROM bg JOIN dfd USING (gram), n
  GROUP BY bg.doc_id
), sched AS (
  SELECT doc_id, n_grams, n_rare,
    (n_rare * 1000000) // greatest(n_grams, 1) AS diff_pm,
    least($Stages - 1, (n_rare * $Stages) // greatest(n_grams, 1)) AS stage,
    ((doc_id * 1103515245 + 12345) % 2147483647) % $ScheduleShards AS shard
  FROM per_doc
)
SELECT doc_id, n_grams, n_rare,
  CAST(diff_pm AS BIGINT) AS diff_pm,
  CAST(stage AS BIGINT) AS stage,
  CAST(shard AS BIGINT) AS shard,
  CAST(row_number() OVER (PARTITION BY stage, shard
    ORDER BY diff_pm, doc_id) AS BIGINT) AS pos
FROM sched"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vocab_coverage"      -> ((s, d) => vocabCoverage(s, d)),
    "keyword_tagging"     -> ((s, d) => keywordTagging(s, d)),
    "curriculum_schedule" -> ((s, d) => curriculumSchedule(s, d))
  )

  def oracles: Map[String, String] = Map(
    "vocab_coverage"      -> vocabCoverageSql,
    "keyword_tagging"     -> keywordTaggingSql,
    "curriculum_schedule" -> curriculumSql
  )
}
