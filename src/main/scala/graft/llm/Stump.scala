package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Histogram-based decision-stump split finding — the scalable core of
  * gradient-boosted-tree training (LightGBM/XGBoost `hist`): features are
  * bucketed into a FIXED number of bins, one aggregation pass builds the
  * per-(feature, bin) class histograms, and every candidate split of every
  * feature is then scored from the tiny histogram table — at 100 TB the
  * corpus is touched once, and the split search runs over
  * features × 64 rows regardless of corpus size. This is the reason no
  * tree learner sorts the raw feature column at scale.
  *
  * Exactness: bin widths are fixed constants (a real trainer derives them
  * from a quantile sketch; constants keep the oracle exact), the
  * histograms are exact int64 counts, and the split score — the weighted
  * Gini purity written as (Σc_L²/n_L + Σc_R²/n_R)/N, a monotone transform
  * of impurity decrease, in [something, 1] — is a pure scalar over those
  * counts, evaluated in lock-step IEEE order on both engines and
  * quantized at 1e6 with a total (score, bin) order for the per-feature
  * argmax. The label is a noisy threshold rule
  * (n_chars + 40·(doc_id mod 7) > 430 — an upstream quality gate whose
  * dominant driver is document length), so the spec can assert the stump
  * RECOVERS the structure: n_chars ranks first with a split near the
  * true threshold, the correlated n_tokens ranks above the deliberately
  * uninformative `noise` feature — not just that the arithmetic matches.
  */
object Stump {

  private val MaxBin = 63L
  // (feature name, Spark bin expr builder, width) — widths sized to the
  // document corpus ranges (n_chars ≤ ~600, tokens ≤ ~110)
  private val WChars = 16L
  private val WToks = 2L
  private val WNoise = 2L

  def stumpSplitGain(s: SparkSession, d: String): DataFrame = {
    import graft.expr.Exact
    // `div`, not `/`: Column./ is double division; all three features are
    // non-negative so truncating div matches DuckDB's //
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        size(Text.tokens(col("text"))).cast("long").as("n_toks"))
      .select(
        ((col("n_chars") + (col("doc_id") % 7) * 40L) > 430L).as("y"),
        least(lit(MaxBin), expr(s"n_chars div $WChars")).as("b_chars"),
        least(lit(MaxBin), expr(s"n_toks div $WToks")).as("b_toks"),
        least(lit(MaxBin), expr(s"(doc_id % 101) div $WNoise")).as("b_noise"))
    val melted = docs.select(col("y"), expr(
      "stack(3, 'n_chars', b_chars, 'n_tokens', b_toks, 'noise', b_noise) AS (feature, bin)"))
    val hist = melted.groupBy("feature", "bin")
      .agg(Exact.cntIf(col("y")).as("pos"), Exact.cntIf(!col("y")).as("neg"))
    val w = Window.partitionBy("feature").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("feature")
    // prefix sums over ≤64 bins per feature: the window input is the
    // histogram, never the corpus
    val scored = hist
      .withColumn("pos_l", sum(col("pos")).over(w))
      .withColumn("neg_l", sum(col("neg")).over(w))
      .withColumn("n_pos", sum(col("pos")).over(wAll))
      .withColumn("n_neg", sum(col("neg")).over(wAll))
      .withColumn("n_l", col("pos_l") + col("neg_l"))
      .withColumn("n_r", col("n_pos") + col("n_neg") - col("n_l"))
      .filter(col("n_r") > 0) // splitting after the last bin leaves R empty
      .withColumn("pos_r", col("n_pos") - col("pos_l"))
      .withColumn("neg_r", col("n_neg") - col("neg_l"))
      .withColumn("score_q", round(
        (((col("pos_l") * col("pos_l") + col("neg_l") * col("neg_l")).cast("double") /
            col("n_l").cast("double") +
          (col("pos_r") * col("pos_r") + col("neg_r") * col("neg_r")).cast("double") /
            col("n_r").cast("double")) /
          (col("n_pos") + col("n_neg")).cast("double")) * lit(1000000.0)).cast("long"))
    val rnW = Window.partitionBy("feature")
      .orderBy(col("score_q").desc, col("bin"))
    scored
      .withColumn("rn", row_number().over(rnW))
      .filter(col("rn") === 1)
      .select(col("feature"), col("bin").as("split_bin"),
        col("pos_l"), col("neg_l"), col("pos_r"), col("neg_r"), col("score_q"))
  }

  private val stumpSql: String = s"""
WITH docs AS (
  SELECT n_chars + (doc_id % 7) * 40 > 430 AS y,
    least($MaxBin, n_chars // $WChars) AS b_chars,
    least($MaxBin, len(${Text.tokensSql("text")}) // $WToks) AS b_toks,
    least($MaxBin, (doc_id % 101) // $WNoise) AS b_noise
  FROM documents
), melted AS (
  SELECT y, 'n_chars' AS feature, b_chars AS bin FROM docs
  UNION ALL SELECT y, 'n_tokens', b_toks FROM docs
  UNION ALL SELECT y, 'noise', b_noise FROM docs
), hist AS (
  SELECT feature, bin,
    ${graft.expr.Exact.cntIfSql("y")} AS pos,
    ${graft.expr.Exact.cntIfSql("NOT y")} AS neg
  FROM melted GROUP BY feature, bin
), cum AS (
  SELECT feature, bin, pos, neg,
    CAST(sum(pos) OVER (PARTITION BY feature ORDER BY bin
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pos_l,
    CAST(sum(neg) OVER (PARTITION BY feature ORDER BY bin
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS neg_l,
    CAST(sum(pos) OVER (PARTITION BY feature) AS BIGINT) AS n_pos,
    CAST(sum(neg) OVER (PARTITION BY feature) AS BIGINT) AS n_neg
  FROM hist
), scored AS (
  SELECT feature, bin, pos_l, neg_l,
    n_pos - pos_l AS pos_r, n_neg - neg_l AS neg_r,
    CAST(round(
      ((CAST(pos_l * pos_l + neg_l * neg_l AS DOUBLE)
          / CAST(pos_l + neg_l AS DOUBLE)
        + CAST((n_pos - pos_l) * (n_pos - pos_l)
             + (n_neg - neg_l) * (n_neg - neg_l) AS DOUBLE)
          / CAST(n_pos + n_neg - pos_l - neg_l AS DOUBLE))
       / CAST(n_pos + n_neg AS DOUBLE)) * 1000000) AS BIGINT) AS score_q
  FROM cum
  WHERE n_pos + n_neg - pos_l - neg_l > 0
)
SELECT feature, bin AS split_bin, pos_l, neg_l, pos_r, neg_r, score_q
FROM (
  SELECT *, row_number() OVER (PARTITION BY feature
    ORDER BY score_q DESC, bin) AS rn
  FROM scored
) WHERE rn = 1"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stump_split_gain" -> ((s, d) => stumpSplitGain(s, d))
  )

  def oracles: Map[String, String] = Map(
    "stump_split_gain" -> stumpSql
  )
}
