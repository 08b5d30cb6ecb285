package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Batch/epoch preparation operators — the loader-side half of training
  * prep (complementing [[TrainPrep]]'s split/pack/sample family):
  *
  *  - `epoch_shuffle`: deterministic per-epoch permutation. Real training
  *    stacks don't materialize one global order — they assign each doc a
  *    seeded hash, route it to a shard (`h % shards`), and order within
  *    the shard. That exact shape here: the window partitions by
  *    (epoch, shard), so no single-partition global sort exists anywhere;
  *    epochs get DIFFERENT permutations from the same corpus by folding
  *    the epoch into the hash.
  *  - `length_batching`: dynamic-batching planner — sequences bucketed by
  *    token-length bin, sharded, and grouped into fixed-size batches;
  *    reports per-batch pad waste (n·max_len − Σlen), the quantity this
  *    technique exists to minimize. All integers.
  *  - `tokenizer_fertility`: per-language chars-per-token and
  *    tokens-per-doc ratios — the standard tokenizer-quality audit.
  *    Integer sums, one correctly-rounded division per ratio.
  *
  * The seeded hash is the same cross-engine LCG family as
  * [[TrainPrep]] (multiplier 1103515245 / increment 12345, the classic
  * POSIX rand constants): exact in int64 on both engines at every tested
  * SF (doc_id·7919·1103515245 ≈ 4e17 at sf1, under the 9.2e18 int64
  * ceiling).
  */
object BatchPrep {

  private val Epochs = 2
  private val Shards = 8L

  private def lcg(e: Column): Column =
    (e * lit(1103515245L) + lit(12345L)) % lit(2147483647L)
  private def lcgSql(e: String): String =
    s"(($e) * 1103515245 + 12345) % 2147483647"

  // ---------------------------------------------------- epoch_shuffle --

  def epochShuffle(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id")
      .withColumn("epoch", explode(array((1 to Epochs).map(lit): _*)))
      .withColumn("h", lcg(col("doc_id") * lit(7919L) + col("epoch")))
      .withColumn("shard", col("h") % Shards)
    // Round 11: per-(epoch, shard) position WITHOUT a keyed window — the
    // shard count is a pinned config, so a window partition holds N/shards
    // rows and grows with the corpus (unsplittable single task at 100 TB).
    // groupedRowNumber range-partitions the total order instead: a big
    // shard spans many partitions, same row_number semantics bit-for-bit.
    graft.operators.Ranks.groupedRowNumber(
        docs, Seq("epoch", "shard"), Seq(col("h"), col("doc_id")), "pos")
      .select(col("epoch"), col("doc_id"), col("shard"), col("pos"))
  }

  val epochShuffleSql: String = s"""
WITH e AS (
  SELECT doc_id, epoch, ${lcgSql("doc_id * 7919 + epoch")} AS h
  FROM documents, (SELECT unnest(generate_series(1, $Epochs)) AS epoch)
)
SELECT CAST(epoch AS INT) AS epoch, doc_id, h % $Shards AS shard,
  CAST(row_number() OVER (
    PARTITION BY epoch, h % $Shards ORDER BY h, doc_id) AS BIGINT) AS pos
FROM e"""

  // ------------------------------------------------------ resume_page --

  /** Checkpoint-resume over the epoch-1 global order WITHOUT a global
    * sort: the global order is (shard, pos) lexicographic; each shard's
    * starting offset is a cumulative sum over the tiny per-shard-count
    * dim ($Shards rows), broadcast back. global_pos = shard_offset + pos.
    * The page after the checkpoint (skip the first 40 %, take 100) is
    * then a plain distributed filter — the shape a dataloader resume
    * takes at 100 TB, where materializing one globally sorted sequence
    * is impossible but per-shard orders plus offsets are free. */
  def resumePage(s: SparkSession, d: String): DataFrame = {
    val e1 = epochShuffle(s, d).filter(col("epoch") === 1)
      .select("doc_id", "shard", "pos")
    val sizes = e1.groupBy("shard").agg(count(lit(1)).as("cnt"))
    val before = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val off = sizes
      .withColumn("shard_off", coalesce(sum("cnt").over(before), lit(0L)))
      .withColumn("total", sum("cnt").over(whole))
      .select("shard", "shard_off", "total")
    e1.join(broadcast(off), Seq("shard"))
      .withColumn("global_pos", col("pos") + col("shard_off"))
      .withColumn("skip", expr("(total * 2) div 5"))
      .filter(col("global_pos") > col("skip") && col("global_pos") <= col("skip") + 100)
      .select("global_pos", "doc_id", "shard", "pos")
  }

  val resumePageSql: String = s"""
WITH e AS (
  SELECT doc_id, ${lcgSql("doc_id * 7919 + 1")} AS h FROM documents
), r AS (
  SELECT doc_id, h % $Shards AS shard,
    CAST(row_number() OVER (PARTITION BY h % $Shards ORDER BY h, doc_id) AS BIGINT) AS pos
  FROM e
), sizes AS (
  SELECT shard, CAST(count(*) AS BIGINT) AS cnt FROM r GROUP BY shard
), offs AS (
  SELECT shard,
    CAST(coalesce(sum(cnt) OVER (ORDER BY shard
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS shard_off,
    CAST(sum(cnt) OVER () AS BIGINT) AS total
  FROM sizes
)
SELECT r.pos + o.shard_off AS global_pos, r.doc_id, r.shard, r.pos
FROM r JOIN offs o USING (shard)
WHERE r.pos + o.shard_off > (o.total * 2) // 5
  AND r.pos + o.shard_off <= (o.total * 2) // 5 + 100"""

  // -------------------------------------------------- length_batching --

  private val BinWidth = 16L
  private val BatchSize = 8L
  private val BatchShards = 4L

  def lengthBatching(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), size(Text.tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("bin", expr(s"n_tok div $BinWidth"))
      .withColumn("shard", lcg(col("doc_id")) % BatchShards)
    // Round 11: (bin, shard) has only $BatchShards shards per bin, so a
    // length-concentrated corpus puts most docs in one window partition —
    // the audit's exact hazard. Distributed per-group rank instead.
    graft.operators.Ranks.groupedRowNumber(
        docs, Seq("bin", "shard"), Seq(col("doc_id")), "_rn")
      .withColumn("batch_id", ((col("_rn") - 1L) / BatchSize).cast("long"))
      .groupBy("bin", "shard", "batch_id")
      .agg(count(lit(1)).as("n_seqs"), max("n_tok").as("max_len"),
        sum("n_tok").as("sum_len"))
      .withColumn("pad_waste", col("n_seqs") * col("max_len") - col("sum_len"))
  }

  val lengthBatchingSql: String = s"""
WITH docs AS (
  SELECT doc_id, CAST(len(${Text.tokensSql("text")}) AS BIGINT) AS n_tok
  FROM documents
), keyed AS (
  SELECT doc_id, n_tok, n_tok // $BinWidth AS bin,
         ${lcgSql("doc_id")} % $BatchShards AS shard
  FROM docs
), batched AS (
  SELECT *, (row_number() OVER (PARTITION BY bin, shard ORDER BY doc_id) - 1)
            // $BatchSize AS batch_id
  FROM keyed
)
SELECT bin, shard, CAST(batch_id AS BIGINT) AS batch_id,
  CAST(count(*) AS BIGINT) AS n_seqs,
  CAST(max(n_tok) AS BIGINT) AS max_len,
  CAST(sum(n_tok) AS BIGINT) AS sum_len,
  CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT) AS pad_waste
FROM batched GROUP BY bin, shard, batch_id"""

  // ----------------------------------------------- tokenizer_fertility --

  def tokenizerFertility(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d)
      .select(col("lang"),
        size(Text.tokens(col("text"))).cast("long").as("n_tok"),
        length(col("text")).cast("long").as("n_chars"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"), sum("n_chars").as("n_chars"))
      .withColumn("chars_per_token",
        col("n_chars").cast("double") / col("n_tokens").cast("double"))
      .withColumn("tokens_per_doc",
        col("n_tokens").cast("double") / col("n_docs").cast("double"))
  }

  val fertilitySql: String = s"""
WITH per_doc AS (
  SELECT lang,
    CAST(len(${Text.tokensSql("text")}) AS BIGINT) AS n_tok,
    CAST(length(text) AS BIGINT) AS n_chars
  FROM documents
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
  CAST(sum(n_chars) AS BIGINT) AS n_chars,
  CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE)
    / CAST(CAST(sum(n_tok) AS BIGINT) AS DOUBLE) AS chars_per_token,
  CAST(CAST(sum(n_tok) AS BIGINT) AS DOUBLE)
    / CAST(count(*) AS DOUBLE) AS tokens_per_doc
FROM per_doc GROUP BY lang"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "epoch_shuffle"       -> ((s, d) => epochShuffle(s, d)),
    "resume_page"         -> ((s, d) => resumePage(s, d)),
    "length_batching"     -> ((s, d) => lengthBatching(s, d)),
    "tokenizer_fertility" -> ((s, d) => tokenizerFertility(s, d))
  )

  def oracles: Map[String, String] = Map(
    "epoch_shuffle"       -> epochShuffleSql,
    "resume_page"         -> resumePageSql,
    "length_batching"     -> lengthBatchingSql,
    "tokenizer_fertility" -> fertilitySql
  )
}
