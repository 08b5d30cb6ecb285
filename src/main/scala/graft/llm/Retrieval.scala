package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Lexical retrieval + frequency-sketch operators over the documents
  * corpus — the search-side counterpart of the embedding ANN family
  * (IvfAnn / Similarity): BM25 ranking, a Count-Min frequency sketch, and
  * corpus diversity statistics.
  *
  * Exactness discipline (same stance as [[LangModel]] / the drift screen in
  * Analytics): no cross-engine `ln`/`exp` in any oracle-checked value —
  * JVM `Math.log` and C libm disagree at 1 ulp on ~75 ppm of inputs
  * (measured on this image), so scoring functions are re-expressed with
  * rational arithmetic only (+, −, ×, ÷ are IEEE correctly-rounded and
  * therefore bit-identical across engines when evaluated in the same
  * order).
  *
  * Scale shapes:
  *  - BM25: per-doc term frequencies are computed with array `filter`
  *    inside codegen (no explode, no shuffle); corpus stats (N, Σdl, df
  *    per query term) are ONE global aggregate broadcast back as a 1-row
  *    cross join; ranking is TakeOrdered top-k. Total: one narrow pass +
  *    one 1-row agg — the inverted-index-free scoring path that works when
  *    the query-term set is small and fixed.
  *  - Count-Min: the sketch is 3×64 integer cells — a partial-aggregable
  *    groupBy whose state is bounded regardless of corpus size (the whole
  *    point of CMS at 100 TB); probes join the 192-row sketch broadcast.
  *  - Diversity: Σn² per language is an order-free integer aggregate —
  *    no per-token probability fold, so no float fold-order coupling at
  *    all. (At corpus sizes where n_tokens² nears 2^63, widen s2 to
  *    decimal(38,0) — the cast sites are marked.)
  */
object Retrieval {

  /** Fixed query-term set for the BM25 demo (all present in the synthetic
    * vocabulary; see TESTDATA.md). */
  val QueryTerms: Seq[String] = Seq("spark", "join", "window", "stream")

  private val K1 = 1.2
  private val B = 0.75

  /** BM25 with a RATIONAL idf variant: idf(t) = (N − df + 0.5)/(df + 0.5)
    * — the classic Robertson–Sparck-Jones idf without the outer `ln`,
    * which is a strictly monotone per-term transform chosen so every score
    * is exact rational arithmetic (see object doc: cross-engine `ln` is
    * not bit-stable). Single-engine deployments can wrap the idf factor in
    * `log1p` without touching anything else. */
  def bm25TopK(s: SparkSession, d: String, k: Int = 20): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val withTf = QueryTerms.zipWithIndex.foldLeft(docs) { case (df, (t, i)) =>
      df.withColumn(s"tf_$i", size(filter(col("toks"), x => x === lit(t))).cast("long"))
    }
    val statAggs =
      sum(col("dl")).as("sum_dl") +:
        QueryTerms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = withTf.agg(count(lit(1)).cast("long").as("n_docs"), statAggs: _*)

    val joined = withTf.crossJoin(broadcast(stats))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    // One contribution per query term; the final score is the left-to-right
    // sum c0 + c1 + c2 + c3 — the oracle SQL spells the same association.
    def contrib(i: Int): Column = {
      val tf = col(s"tf_$i").cast("double")
      val df = col(s"df_$i").cast("double")
      val idf = (col("n_docs").cast("double") - df + lit(0.5)) / (df + lit(0.5))
      idf * ((tf * lit(K1 + 1)) /
        (tf + lit(K1) * (lit(1 - B) + lit(B) * (col("dl").cast("double") / avgdl))))
    }
    val score = QueryTerms.indices.map(contrib).reduceLeft(_ + _)
    joined
      .select(col("doc_id"), col("dl"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  private val bm25TermSqls: Seq[String] = QueryTerms.zipWithIndex.map { case (t, i) =>
    s"CAST(len(list_filter(toks, x -> x = '$t')) AS BIGINT) AS tf_$i"
  }

  val bm25Sql: String = {
    val contribs = QueryTerms.indices.map { i =>
      s"""((CAST(n_docs AS DOUBLE) - CAST(df_$i AS DOUBLE) + 0.5) / (CAST(df_$i AS DOUBLE) + 0.5))
         | * ((CAST(tf_$i AS DOUBLE) * ${K1 + 1}) /
         |    (CAST(tf_$i AS DOUBLE) + $K1 * ((${1 - B}) + $B * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))"""
        .stripMargin
    }.mkString("(", ") + (", ")")
    s"""
WITH toked AS (
  SELECT doc_id, ${Text.tokensSql("text")} AS toks FROM documents
), dd AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, ${bm25TermSqls.mkString(", ")}
  FROM toked
), st AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl,
    ${QueryTerms.indices.map(i => s"CAST(sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$i").mkString(", ")}
  FROM dd
)
SELECT doc_id, dl, $contribs AS score
FROM dd, st
ORDER BY score DESC, doc_id
LIMIT 20"""
  }

  // ---------------------------------------------------------------- CMS --

  /** Count-Min sketch geometry: DEPTH independent hash rows × WIDTH
    * buckets. 3×64 keeps the demo sketch readable; production widths are
    * ~2/ε columns — the shape (bounded mergeable state) is identical. */
  private val Depth = 3
  private val Width = 64
  private val P = 1000000007L
  private val HashA = Seq(31L, 37L, 41L)
  private val HashB = Seq(7L, 11L, 13L)

  /** Probe set: mixed heavy/medium tokens plus one absent token ("zebra")
    * whose exact count is 0 — its CMS estimate exposes the collision
    * overestimate that CMS is allowed to make (never an underestimate). */
  val ProbeTokens: Seq[String] = Seq("table", "spark", "window", "merge", "slow", "zebra")

  /** Character-level polynomial code mod P — identical fold on both
    * engines (integer only). */
  private def tokenCode(t: Column): Column =
    aggregate(split(t, ""), lit(0L), (acc, c) => (acc * 131L + ascii(c).cast("long")) % P)

  private def bucket(j: Int, code: Column): Column =
    ((lit(HashA(j)) * code + lit(HashB(j))) % P) % Width

  private def tokenCodeSql(t: String): String =
    s"list_reduce([CAST(0 AS BIGINT)] || list_transform(regexp_split_to_array($t, ''), c -> CAST(ascii(c) AS BIGINT)), (a, b) -> (a*131 + b) % $P)"

  private def bucketSql(j: Int): String =
    s"((${HashA(j)} * code + ${HashB(j)}) % $P) % $Width"

  /** Count-Min sketch over the full token stream (with multiplicity),
    * probed for [[ProbeTokens]]: exact count vs CMS estimate
    * (min over the Depth hash rows) and the guaranteed-non-negative
    * overestimate. */
  def cmsHeavyCounts(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, d)
      .select(explode(Text.tokens(col("text"))).as("tok"))
      .withColumn("code", tokenCode(col("tok")))
    val cells = toks.select(
      posexplode(array((0 until Depth).map(j => bucket(j, col("code"))): _*))
        .as(Seq("j", "bucket")))
    val sketch = cells.groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))

    val probes = ProbeTokens.toDF("tok")
      .withColumn("code", tokenCode(col("tok")))
      .select(col("tok"),
        posexplode(array((0 until Depth).map(j => bucket(j, col("code"))): _*))
          .as(Seq("j", "bucket")))
    val estimates = probes
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy("tok")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_estimate"))

    val exact = toks.filter(col("tok").isin(ProbeTokens: _*))
      .groupBy("tok").agg(count(lit(1)).as("exact_n"))
    estimates
      .join(exact, Seq("tok"), "left")
      .select(col("tok"),
        coalesce(col("exact_n"), lit(0L)).as("exact_n"),
        col("cms_estimate"),
        (col("cms_estimate") - coalesce(col("exact_n"), lit(0L))).as("overestimate"))
  }

  val cmsSql: String = {
    val probeList = ProbeTokens.map(t => s"'$t'").mkString(", ")
    s"""
WITH toks AS (
  SELECT unnest(${Text.tokensSql("text")}) AS tok FROM documents
), coded AS (
  SELECT tok, ${tokenCodeSql("tok")} AS code FROM toks
), cells AS (
  ${(0 until Depth).map(j => s"SELECT $j AS j, ${bucketSql(j)} AS bucket FROM coded").mkString("\n  UNION ALL\n  ")}
), sketch AS (
  SELECT j, bucket, CAST(count(*) AS BIGINT) AS cnt FROM cells GROUP BY 1, 2
), probes AS (
  SELECT tok, ${tokenCodeSql("tok")} AS code FROM (SELECT unnest([$probeList]) AS tok)
), probe_cells AS (
  ${(0 until Depth).map(j => s"SELECT tok, $j AS j, ${bucketSql(j)} AS bucket FROM probes").mkString("\n  UNION ALL\n  ")}
), est AS (
  SELECT pc.tok, CAST(min(COALESCE(s.cnt, 0)) AS BIGINT) AS cms_estimate
  FROM probe_cells pc LEFT JOIN sketch s ON pc.j = s.j AND pc.bucket = s.bucket
  GROUP BY 1
), exact AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS exact_n FROM coded
  WHERE tok IN ($probeList) GROUP BY 1
)
SELECT est.tok, COALESCE(exact.exact_n, 0) AS exact_n, est.cms_estimate,
       est.cms_estimate - COALESCE(exact.exact_n, 0) AS overestimate
FROM est LEFT JOIN exact ON est.tok = exact.tok"""
  }

  // ---------------------------------------------------- diversity -------

  /** Per-language corpus diversity without `ln`: collision mass
    * Σp² = Σn² / N² (Simpson index) and its inverse — the "effective
    * vocabulary size", exactly exp(Rényi-2 entropy). Both are single
    * divisions over order-free INTEGER aggregates, so there is no float
    * fold anywhere. At 100 TB widen s2/N² to decimal(38,0) before the
    * final division. */
  def renyiDiversity(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.documents(s, d)
      .select(col("lang"), explode(Text.tokens(col("text"))).as("tok"))
      .groupBy("lang", "tok")
      .agg(count(lit(1)).as("n"))
    counts.groupBy("lang")
      .agg(
        sum(col("n")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("n") * col("n")).as("s2"))
      .withColumn("collision_mass",
        col("s2").cast("double") / (col("n_tokens") * col("n_tokens")).cast("double"))
      .withColumn("eff_vocab",
        (col("n_tokens") * col("n_tokens")).cast("double") / col("s2").cast("double"))
  }

  val renyiSql: String = s"""
WITH counts AS (
  SELECT lang, tok, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT lang, unnest(${Text.tokensSql("text")}) AS tok FROM documents)
  GROUP BY 1, 2
)
SELECT lang,
  CAST(sum(n) AS BIGINT) AS n_tokens,
  CAST(count(*) AS BIGINT) AS n_distinct,
  CAST(sum(n*n) AS BIGINT) AS s2,
  CAST(CAST(sum(n*n) AS BIGINT) AS DOUBLE) / CAST(CAST(sum(n) AS BIGINT) * CAST(sum(n) AS BIGINT) AS DOUBLE) AS collision_mass,
  CAST(CAST(sum(n) AS BIGINT) * CAST(sum(n) AS BIGINT) AS DOUBLE) / CAST(CAST(sum(n*n) AS BIGINT) AS DOUBLE) AS eff_vocab
FROM counts GROUP BY lang"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bm25_topk"        -> ((s, d) => bm25TopK(s, d)),
    "cms_heavy_counts" -> ((s, d) => cmsHeavyCounts(s, d)),
    "renyi_diversity"  -> ((s, d) => renyiDiversity(s, d))
  )

  def oracles: Map[String, String] = Map(
    "bm25_topk"        -> bm25Sql,
    "cms_heavy_counts" -> cmsSql,
    "renyi_diversity"  -> renyiSql
  )
}
