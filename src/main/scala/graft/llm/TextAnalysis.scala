package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SessionCache, Tables}
import graft.expr.Exact._

/** Text-analysis operators over the `documents` table: per-document
  * statistics + quality scoring, token counting (whitespace and BPE-ish
  * regex), language identification (stopword-marker heuristic), and
  * document fingerprinting (sha256 + polynomial rolling hash).
  *
  * These are the per-document profiling passes a large-scale training-data
  * pipeline runs before filtering/dedup. All are narrow per-row expressions
  * (no shuffle except final aggregates) built from codegen'd array
  * functions — at 100 TB they scale embarrassingly parallel with the scan.
  */
object TextAnalysis {

  private val T  = Text.tokens(col("text"))
  private val TS = Text.tokensSql("text")

  /** lang_id's oracle — a val so langid_confusion can reuse it as a CTE. */
  private val langIdSql: String = {
    val scores = Text.LangMarkers.map { case (lang, markers) =>
      val in = markers.map(m => s"'$m'").mkString(",")
      s"CAST(len(list_filter(toks, t -> t IN ($in))) AS INT) AS score_$lang"
    }.mkString(",\n    ")
    s"""
WITH base AS (SELECT doc_id, lang, $TS AS toks FROM documents),
m AS (
  SELECT doc_id, lang,
    $scores
  FROM base
)
SELECT doc_id, lang AS labeled_lang,
  score_en, score_de, score_fr, score_es, score_zh,
  CASE WHEN score_en = 0 AND score_de = 0 AND score_fr = 0 AND score_es = 0 AND score_zh = 0 THEN 'unknown'
       WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es AND score_en >= score_zh THEN 'en'
       WHEN score_de >= score_fr AND score_de >= score_es AND score_de >= score_zh THEN 'de'
       WHEN score_fr >= score_es AND score_fr >= score_zh THEN 'fr'
       WHEN score_es >= score_zh THEN 'es'
       ELSE 'zh' END AS predicted_lang
FROM m"""
  }

  /** BPE-ish pretokenizer pattern: letter runs | single digits | any other
    * non-space symbol (GPT-2-style pretokenization simplified to what both
    * Java and RE2 regex engines treat identically). */
  val BpePattern = "[a-z]+|[0-9]|[^a-z0-9\\s]"

  /** The stopword markers behind the quality score's "natural prose"
    * term — ONE definition for doc_stats and every quality consumer. */
  private[llm] val Stopwords = Seq("the", "a", "of", "and", "is", "to", "in")
  private[llm] val StopwordsSqlIn = Stopwords.map(w => s"'$w'").mkString(", ")

  /** The weighted quality score (length saturation 0.4 + lexical
    * diversity 0.3 + stopword presence 0.3) shared by `doc_stats`,
    * `dedup_keep_best` and `corpus_budget_select` — one definition per
    * scoring rule (the funnel-drift lesson), with [[qualityExprSql]] the
    * operand-order-identical DuckDB twin. */
  private[llm] def qualityExpr(nTokens: Column, nDistinct: Column, stop: Column): Column =
    least(lit(1.0), nTokens.cast("double") / lit(50.0)) * lit(0.4) +
      (nDistinct.cast("double") / nTokens.cast("double")) * lit(0.3) +
      least(lit(1.0), (stop.cast("double") / nTokens.cast("double")) * lit(5.0)) * lit(0.3)
  private[llm] def qualityExprSql(n: String, nd: String, stop: String): String =
    s"""least(CAST(1.0 AS DOUBLE), CAST($n AS DOUBLE) / CAST(50.0 AS DOUBLE)) * CAST(0.4 AS DOUBLE)
    + (CAST($nd AS DOUBLE) / CAST($n AS DOUBLE)) * CAST(0.3 AS DOUBLE)
    + least(CAST(1.0 AS DOUBLE), (CAST($stop AS DOUBLE) / CAST($n AS DOUBLE)) * CAST(5.0 AS DOUBLE)) * CAST(0.3 AS DOUBLE)"""

  /** (doc_id, n_tokens, quality_score) for every document — the narrow
    * per-row scoring frame the curation consumers join on. Embarrassingly
    * parallel with the scan at any scale. */
  private[llm] def qualityOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", T)
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_distinct_tokens", size(array_distinct(col("toks"))))
      .withColumn("stopword_count",
        size(filter(col("toks"), t => t.isin(Stopwords: _*))))
      .select(col("doc_id"), col("n_tokens"),
        qualityExpr(col("n_tokens"), col("n_distinct_tokens"), col("stopword_count"))
          .as("quality_score"))

  /** DuckDB twin of [[qualityOf]] — a complete derived-table SQL string
    * consumers interpolate as `(SELECT ...) q`. */
  private[llm] def qualityOfSql: String = s"""
SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
  ${qualityExprSql(
      "CAST(len(toks) AS INT)",
      "CAST(len(list_distinct(toks)) AS INT)",
      s"CAST(len(list_filter(toks, t -> t IN ($StopwordsSqlIn))) AS INT)")}
  AS quality_score
FROM (SELECT doc_id, $TS AS toks FROM documents)"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-document stats + weighted quality score (the LLM-pipeline analog
    // of the reference's staging quality score,
    // stg_raw_temperature_readings.sql:72-76).
    "doc_stats" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("toks", T)
        .withColumn("n_tokens", size(col("toks")))
        .withColumn("n_distinct_tokens", size(array_distinct(col("toks"))))
        .withColumn("sum_token_len",
          aggregate(col("toks"), lit(0), (acc, t) => acc + length(t)))
        .withColumn("max_token_len",
          coalesce(array_max(transform(col("toks"), t => length(t))), lit(0)))
        .withColumn("stopword_count",
          size(filter(col("toks"), t => t.isin(Stopwords: _*))))
        .select(
          col("doc_id"),
          length(col("text")).as("n_chars"),
          col("n_tokens"),
          col("n_distinct_tokens"),
          (col("sum_token_len").cast("double") / col("n_tokens").cast("double")).as("avg_token_len"),
          (col("n_distinct_tokens").cast("double") / col("n_tokens").cast("double")).as("type_token_ratio"),
          col("max_token_len"),
          col("stopword_count"),
          (col("stopword_count").cast("double") / col("n_tokens").cast("double")).as("stopword_ratio"),
          // weighted quality (shared rule — qualityExpr)
          qualityExpr(col("n_tokens"), col("n_distinct_tokens"), col("stopword_count"))
            .as("quality_score")
        )
    }),

    // Token counting: whitespace tokens vs BPE-ish regex pretokens.
    "token_counts" -> ((s, d) => {
      Tables.documents(s, d).select(
        col("doc_id"),
        size(T).as("ws_tokens"),
        regexp_count(lower(col("text")), lit(BpePattern)).as("bpe_tokens"),
        (regexp_count(lower(col("text")), lit(BpePattern)).cast("double")
          / length(col("text")).cast("double")).as("tokens_per_char")
      )
    }),

    // Language ID by stopword-marker counting with fixed-precedence argmax.
    "lang_id" -> ((s, d) => {
      val scored = Text.LangMarkers.foldLeft(Tables.documents(s, d).withColumn("toks", T)) {
        case (df, (lang, markers)) =>
          df.withColumn(s"score_$lang", size(filter(col("toks"), t => t.isin(markers: _*))))
      }
      val Seq(en, de, fr, es, zh) = Text.LangMarkers.map { case (l, _) => col(s"score_$l") }
      scored.select(
        col("doc_id"),
        col("lang").as("labeled_lang"),
        en.as("score_en"), de.as("score_de"), fr.as("score_fr"),
        es.as("score_es"), zh.as("score_zh"),
        when(en === 0 && de === 0 && fr === 0 && es === 0 && zh === 0, "unknown")
          .when(en >= de && en >= fr && en >= es && en >= zh, "en")
          .when(de >= fr && de >= es && de >= zh, "de")
          .when(fr >= es && fr >= zh, "fr")
          .when(es >= zh, "es")
          .otherwise("zh").as("predicted_lang")
      )
    }),

    // Language-ID confusion matrix: labeled vs predicted language with
    // per-cell counts and the exact recall/precision rationals — the
    // language-filter quality gate before a corpus-wide langid filter is
    // trusted. One grouped count over the lang_id projection (≤ |langs|²
    // cells) plus two broadcast-sized marginal joins.
    "langid_confusion" -> ((s, d) => {
      val cm = TextAnalysis.queries("lang_id")(s, d)
        .groupBy("labeled_lang", "predicted_lang")
        .agg(count(lit(1)).as("n"))
      val lt = cm.groupBy("labeled_lang").agg(sum(col("n")).as("label_total"))
      val pt = cm.groupBy("predicted_lang").agg(sum(col("n")).as("pred_total"))
      cm.join(broadcast(lt), "labeled_lang")
        .join(broadcast(pt), "predicted_lang")
        .select(
          col("labeled_lang"), col("predicted_lang"), col("n"),
          col("label_total"), col("pred_total"),
          (col("n").cast("double") / col("label_total").cast("double"))
            .as("recall"),
          (col("n").cast("double") / col("pred_total").cast("double"))
            .as("precision"))
    }),

    // Content-defined chunking + chunk-level dedup stats — the
    // storage-dedup primitive (rsync/LBFS-style): chunk boundaries cut
    // where a 4-token rolling Karp-Rabin window hash hits 0 mod 17 (plus
    // the forced end-of-doc boundary), so an insertion only reshapes the
    // chunks around the edit while every other boundary — and hash —
    // survives, unlike fixed-size chunking where one shifted token
    // invalidates every later chunk. Per-row HOF work is O(tokens·4)
    // inside codegen (codes materialized once — the token_bigrams
    // lesson); the only shuffle is the grouped count over (hash, len)
    // chunk identities, map-side combinable. Output: the corpus-level
    // dedup ledger (total vs distinct chunks, token savings).
    "cdc_chunk_dedup" -> ((s, d) => {
      val P = 1000000007L
      val win = lit(17L)
      val chunks = Tables.documents(s, d)
        .withColumn("toks", T)
        .withColumn("codes", transform(col("toks"), t => Text.tokenCode(t)))
        .withColumn("n", size(col("codes")))
        // the window hash is computed INLINE in the boundary lambda, once
        // per position — as a separate single-reference array column,
        // CollapseProject inlines the whole transform into the filter's
        // element_at and re-builds the array PER POSITION (measured 547 s
        // vs ~2 s at sf0.1 — the O(n²·w) variant of the token_bigrams
        // inlining lesson). The ≤4-term window unrolls to element_at
        // reads + one closing % P, bit-identical to the running-mod fold:
        // token codes are < 2^11, so every pre-mod intermediate is < 2^32
        // and the per-step mod of the fold can only fire on the last step
        // (measured 15.3 s -> 1.9 s vs the per-position slice+aggregate)
        .withColumn("ends", when(col("n") >= 1,
          filter(sequence(lit(1), col("n")), i => {
            def e(j: Column) = element_at(col("codes"), j.cast("int"))
            val h = when(i >= 4,
                ((e(i - 3) * 131L + e(i - 2)) * 131L + e(i - 1)) * 131L + e(i))
              .when(i === 3, (e(i - 2) * 131L + e(i - 1)) * 131L + e(i))
              .when(i === 2, e(i - 1) * 131L + e(i))
              .otherwise(e(i))
            i === col("n") || (h % P) % win === 0
          })).otherwise(array().cast("array<int>")))
        .select("codes", "ends")
        // lazy-checkpoint barrier (the score_decile_lift idiom), and it is
        // load-bearing three times over: (a) without it CollapseProject
        // inlines the single-referenced codes — with its toks regex
        // split — into the chunk lambda, rebuilding both arrays PER CHUNK
        // (O(n²/17), measured 29 s for this stage at sf0.1 vs ~3 s);
        // (b) the explode-first alternative (posexplode(ends), then
        // slice) makes codes a real attribute but COPIES the full codes
        // array into every chunk row through the Generate — same
        // quadratic, as bytes instead of evals (measured 26 s); (c) the
        // non-empty filter must sit PAST the barrier — below it,
        // predicate pushdown drags the filter (with the whole ends
        // expression inlined, element_at rebuilding codes per position)
        // under the projections and the PREDICATE is the O(n²) monster
        // (measured 29 s vs 4 s for the barrier scan). Past the barrier
        // both arrays are attributes read O(1) inside the lambda, and
        // only the small (hash, len) structs flow onward.
        .localCheckpoint(false)
        .filter(size(col("ends")) > 0)
        .select(explode(transform(sequence(lit(1), size(col("ends"))), k => {
          val st = when(k === 1, lit(1))
            .otherwise(element_at(col("ends"), (k - 1).cast("int")) + 1)
          val en = element_at(col("ends"), k.cast("int"))
          struct(
            aggregate(slice(col("codes"), st.cast("int"), (en - st + 1).cast("int")),
              lit(0L), (a, c) => (a * 131L + c) % P).as("h"),
            (en - st + 1).cast("long").as("l"))
        })).as("ck"))
        .select(col("ck.h").as("h"), col("ck.l").as("l"))
      chunks.groupBy("h", "l")
        .agg(count(lit(1)).as("m"))
        .agg(
          sum(col("m")).as("total_chunks"),
          count(lit(1)).as("distinct_chunks"),
          sum(col("m") * col("l")).as("total_tokens"),
          sum(col("l")).as("stored_tokens"))
        .withColumn("dedup_ratio",
          lit(1.0) - col("stored_tokens").cast("double") /
            col("total_tokens").cast("double"))
    }),

    // Document fingerprints: exact sha256 (content + normalized) and the
    // polynomial rolling hash (F11 retargeted at documents).
    "doc_fingerprints" -> ((s, d) => {
      Tables.documents(s, d).select(
        col("doc_id"),
        sha2(col("text"), 256).as("content_sha"),
        sha2(array_join(T, " "), 256).as("normalized_sha"),
        Text.rollingHash(T).as("rolling_hash")
      )
    }),

    // Generator/UDTF surface: explode tokens into rows, global term counts.
    "explode_tokens" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(T).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("occurrences"))
    }),

    // Array-function surface: per-doc sorted distinct token vocabulary.
    // Emitted as a joined string rather than array<string>: the driver's
    // pandas-based compare cannot sort rows on an ndarray cell (round-2
    // oracle crash); the join loses nothing since tokens contain no spaces.
    "doc_token_arrays" -> ((s, d) => {
      Tables.documents(s, d).select(
        col("doc_id"),
        array_join(array_sort(array_distinct(T)), " ").as("vocab"),
        size(array_distinct(T)).as("vocab_size")
      )
    }),

    // Adjacent-token-pair (bigram) frequencies — the counting kernel of a
    // BPE-style tokenizer-training iteration: explode ordered bigrams, one
    // hash aggregation, keep pairs seen more than once.
    "token_bigrams" -> ((s, d) => {
      // tokens materialized ONCE per row: with the tokenizer expression
      // inlined inside the transform lambda, the interpreted HOF re-ran
      // lower+split+filter for every element_at (measured 2.4s vs 0.5s at
      // sf0.1)
      val toks = col("toks")
      Tables.documents(s, d)
        .withColumn("toks", T)
        .select(explode(
          when(size(toks) >= 2,
            transform(sequence(lit(1), size(toks) - 1),
              i => concat_ws(" ", element_at(toks, i.cast("int")),
                element_at(toks, (i + 1).cast("int")))))
            .otherwise(array().cast("array<string>"))).as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("occurrences"))
        .filter(col("occurrences") > 1)
    }),

    // Benchmark decontamination: which corpus documents share >= 2
    // distinct 3-grams with a held-out benchmark doc (every 100th doc)?
    // Inverted-index shuffle join on the gram — the same no-all-pairs
    // shape as the Jaccard dedup, but asymmetric (benchmark vs corpus).
    //
    // Round 13: the join runs over the COLLAPSE TIER (TextDedup
    // .collapsedOf) — identical documents have identical distinct-gram
    // sets, so shared-gram counting happens once per distinct content
    // pair and doc-level (bench, corpus) pairs are a membership
    // expansion. The doc-level join was the round-13 sf5 sweep's one real
    // knee (12.9x at 2.5x data on a duplicate-heavy corpus: every gram
    // bucket carries each copy, so join volume rides F^2); the rep join
    // is scale-invariant under duplication and the F^2 growth moves to
    // the expansion — the query's own output floor. Same pair set, same
    // oracle.
    //
    // Round 13b: behind the adaptive dup-rate gate (the dedup_substring /
    // paragraph_dedup discipline) — on a duplication-free corpus the
    // sha2 fingerprints, fp groupBy, and three expansion joins are pure
    // overhead over the direct doc-keyed join (measured 2.8 s collapse vs
    // 0.4 s direct at sf0.1's <2% dup rate; the sf5 knee corpus sits at
    // ~90% and keeps the tier). The gate verdict is memoized per
    // (session, dir), so constructions after the first are job-free and
    // both paths produce the identical pair set (exact either way — the
    // HLL estimate can only cost time).
    "contamination_overlap" -> ((s, d) => {
      val collapse = SessionCache.getOrElseUpdate(s, ("contamination_gate", d)) {
        TextDedup.estDupRate(Tables.documents(s, d), col("text")) >=
          TextDedup.CollapseMinDupRate
      }
      if (!collapse) {
        val grams = TextDedup.gramSets(s, d)
          .select(col("doc_id"), explode(col("grams")).as("g"))
        val bench = grams.filter(col("doc_id") % 100 === 0)
          .select(col("doc_id").as("bench_id"), col("g"))
        val corpus = grams.filter(col("doc_id") % 100 =!= 0)
          .select(col("doc_id").as("corpus_id"), col("g"))
        bench.join(corpus, "g")
          .groupBy("bench_id", "corpus_id")
          .agg(count(lit(1)).cast("int").as("shared_grams"))
          .filter(col("shared_grams") >= 2)
      } else {
        val (members, reps) = TextDedup.collapsedOf(s, d)
        val bench = members.filter(col("doc_id") % 100 === 0)
          .select(col("fp"), col("doc_id").as("bench_id"))
        val corpus = members.filter(col("doc_id") % 100 =!= 0)
          .select(col("fp"), col("doc_id").as("corpus_id"))
        val repGrams = reps.select(col("fp"), explode(col("grams")).as("g"))
        // distinct-content pairs sharing >= 2 grams (unordered at the join,
        // both directions at the expansion — membership is side-specific)
        val shared = repGrams.select(col("fp").as("f1"), col("g"))
          .join(repGrams.select(col("fp").as("f2"), col("g")), "g")
          .filter(col("f1") < col("f2"))
          .groupBy("f1", "f2").agg(count(lit(1)).cast("int").as("shared_grams"))
          .filter(col("shared_grams") >= 2)
        // same-content pairs: the intersection is the group's own gram count
        val self = reps
          .select(col("fp"), size(col("grams")).cast("int").as("shared_grams"))
          .filter(col("shared_grams") >= 2)
          .select(col("fp").as("f1"), col("fp").as("f2"), col("shared_grams"))
        val directed = shared
          .unionByName(shared.select(col("f2").as("f1"), col("f1").as("f2"),
            col("shared_grams")))
          .unionByName(self)
        directed
          .join(bench.select(col("fp").as("f1"), col("bench_id")), "f1")
          .join(corpus.select(col("fp").as("f2"), col("corpus_id")), "f2")
          .select("bench_id", "corpus_id", "shared_grams")
      }
    }),

    // TF/DF statistics (the integer-exact core of TF-IDF; the log-scoring
    // composition is left to callers because libm `log` is not
    // bit-identical across engines): per (doc, term) frequency joined with
    // corpus-wide document frequency. Two aggregations + one shuffle join
    // on the term.
    "tf_df" -> ((s, d) => {
      val tokens = Tables.documents(s, d)
        .select(col("doc_id"), explode(T).as("token"))
      val tf = tokens.filter(col("doc_id") % 25 === 0)
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val df = tokens.groupBy("token")
        .agg(countDistinct(col("doc_id")).as("df"))
      tf.join(df, "token").select("doc_id", "token", "tf", "df")
    }),

    // Per-document RARITY profile — the uncommon-vocabulary quality signal
    // (the rational core of a CCNet-style LM-perplexity filter: documents
    // whose tokens are corpus-rare are disproportionately OCR noise,
    // boilerplate mangling, or gibberish; documents of only ultra-common
    // tokens are template spam). Each token OCCURRENCE contributes its
    // corpus document frequency: hapax tokens (df = 1, this doc only),
    // rare tokens (df ≤ 3), the doc's rarest token, and the mean inverse
    // df (Σ tf/df exact on the int128 fixed-point sum — order-independent,
    // so the shuffle's row order can't flake the hash compare; `ln`-free
    // by the same argument as BM25's rational idf, Retrieval.scala).
    // Shuffle shape at 100 TB: occurrences COMPRESS to per-(doc, token)
    // tf before anything wide happens (tf rows are distinct (doc, token),
    // so the per-token row count IS the df). df is then an AGGREGATION
    // over tf — map-side partial combine absorbs hot tokens, where the
    // count-window alternative would sort every occurrence of "the" into
    // ONE window partition — and joins back broadcast (vocab-bounded).
    // The tf frame is localCheckpoint'ed because it feeds both the df
    // build and the join probe; it is the compact layer (distinct
    // (doc, token)), far smaller than the occurrence stream. Then one
    // groupBy(doc) with tf-weighted sums. Never doc×doc.
    "doc_rarity_score" -> ((s, d) => {
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), explode(T).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
      tf.join(df, "token")
        .groupBy("doc_id")
        .agg(
          sum(col("tf")).as("n_tokens"),
          sum(when(col("df") === 1, col("tf")).otherwise(0L)).as("n_hapax"),
          sum(when(col("df") <= 3, col("tf")).otherwise(0L)).as("n_rare"),
          min(col("df")).as("min_df"),
          dsum(col("tf").cast("double") / col("df").cast("double")).as("s_inv"))
        .select(
          col("doc_id"), col("n_tokens"), col("n_hapax"), col("n_rare"),
          (col("n_rare").cast("double") / col("n_tokens").cast("double"))
            .as("rare_ratio"),
          col("min_df"),
          (col("s_inv") / col("n_tokens").cast("double")).as("avg_inv_df"))
    }),

    // Unigram SURPRISAL scoring — the integer-exact skeleton of a CCNet/
    // KenLM perplexity filter: each token occurrence contributes its
    // surprisal −log₂ p(token) ≈ bitlen(N) − bitlen(ctf) BITS, where
    // bitlen is the bit length of an exact corpus count read as
    // length(bin(x)) — a string-length of the binary literal, identical
    // on both engines, so the whole score dodges the ln/exp cross-engine
    // trap (each term is within 1 bit of the real log₂ ratio; document
    // RANKING is what the filter consumes, and that survives the
    // quantization). High-surprisal docs (gibberish, OCR noise, wrong-
    // language fragments) are flagged on the INTEGER cross-multiplied
    // form of bits/token > 17/16 of the corpus mean — the division never
    // decides the flag. The margin is deliberately tight: bit-length
    // quantization compresses the surprisal spread (a 31-occurrence and
    // a 16-occurrence token score identically), so the per-doc ratios
    // cluster within ~10% of the mean and a "1.5×" flag would be
    // structurally dead; 6.25% above mean isolates the elevated
    // rare-token-mass tail (30 of 5 000 docs at sf0.1). Scale shape: occurrences compress to per-(doc,
    // token) tf first (the doc_rarity_score spine), the per-token bits
    // dim is an aggregation of tf joined back on the token key (map-side
    // combine absorbs hot tokens), then one groupBy(doc). The integer
    // flag products are exact to ~2⁶² (corpus ≈ 10¹⁴ tokens — beyond
    // the 100 TB point, same documented-bound idiom as priority_sample). */
    "doc_surprisal_bits" -> ((s, d) => {
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), explode(T).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val ctf = tf.groupBy("token").agg(sum("tf").as("ctf"))
      val totals = ctf.agg(sum("ctf").as("n_total"))
      val dim = ctf.crossJoin(broadcast(totals))
        .select(col("token"),
          (length(bin(col("n_total"))) - length(bin(col("ctf"))))
            .cast("long").as("bits"))
      val scored = tf.join(dim, "token")
        .groupBy("doc_id")
        .agg(sum(col("tf")).as("n_tokens"),
          sum(col("tf") * col("bits")).as("total_bits"),
          max(col("bits")).as("max_bits"))
      val corpus = scored.agg(sum("total_bits").as("cb"), sum("n_tokens").as("cn"))
      scored.crossJoin(broadcast(corpus))
        .select(col("doc_id"), col("n_tokens"), col("total_bits"), col("max_bits"),
          (col("total_bits").cast("double") / col("n_tokens").cast("double"))
            .as("bits_per_token"),
          (col("total_bits") * col("cn") * 16 > col("cb") * col("n_tokens") * 17)
            .as("high_surprisal"))
    }),

    // Sparse lexical cosine similarity join — the inverted-index (term ->
    // posting list) complement of the dense embedding ANN ops: tf vectors
    // over word BIGRAMS (the unigram vocabulary of this corpus is ~31
    // near-universal tokens; bigrams are the discriminative terms), a
    // document-frequency cap that drops boilerplate terms (df > 40 — the
    // prefix-filtering bound that keeps posting-list pair volume Σ df²
    // linear-ish at scale; in production this is set relative to corpus
    // size), dot products and squared norms as EXACT
    // integer sums, and one sqrt at the end. All joins are term/doc_id
    // equi-joins; the pair shuffle is keyed by term — never doc×doc.
    "tf_cosine_pairs" -> ((s, d) => {
      // tokens pre-projected to an attribute: passing the split()
      // expression straight into ngramsAll inlines it into the transform
      // lambda, re-running the regex split per gram element (measured
      // 1.3s -> 4s regression when CollapseProject merged the projections;
      // an attribute reference keeps the split at once-per-row)
      val terms = Tables.documents(s, d)
        .select(col("doc_id"), T.as("w"))
        .select(col("doc_id"), explode(Text.ngramsAll(col("w"), 2)).as("term"))
      // df as an AGGREGATION over the checkpointed tf layer + a
      // broadcastable join back (round 10; previously a count window over
      // tf). Map-side partial combine absorbs hot terms, where the window
      // sorted every posting of a hot bigram into ONE window partition —
      // the doc_rarity_score skew note, same fix. Measured at parity with
      // the window under identical load (1.80 vs 1.82 s at sf0.1); the tf
      // checkpoint pays for feeding both the df build and the join probe
      // with one evaluation of the explode→aggregate subtree. The pruned
      // posting list is then materialized once more (localCheckpoint)
      // because it still feeds three plan branches (norms + both
      // pair-join sides); it is small by construction — the df ≤ 40 cap
      // has already dropped the high-frequency terms that dominate the
      // raw posting list.
      val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val kept = tf
        .join(dft.filter(col("df") <= 40), "term")
        .select("doc_id", "term", "tf")
        .localCheckpoint()
      val norms = kept.groupBy("doc_id").agg(sum(col("tf") * col("tf")).as("n2"))
      val dots = kept.select(col("term"), col("doc_id").as("da"), col("tf").as("tfa"))
        .join(kept.select(col("term"), col("doc_id").as("db"), col("tf").as("tfb")), "term")
        .filter(col("da") < col("db"))
        .groupBy("da", "db").agg(sum(col("tfa") * col("tfb")).as("dot"))
      dots
        .join(norms.select(col("doc_id").as("da"), col("n2").as("n2a")), "da")
        .join(norms.select(col("doc_id").as("db"), col("n2").as("n2b")), "db")
        .withColumn("cosine", col("dot").cast("double") /
          (sqrt(col("n2a").cast("double")) * sqrt(col("n2b").cast("double"))))
        .filter(col("cosine") >= 0.35)
        .select(col("da").as("doc_a"), col("db").as("doc_b"), col("cosine"))
    }),

    // Map higher-order functions (the F-class surface map_token_freqs'
    // encode/decode round-trip doesn't reach): per-doc term-frequency map
    // → map_filter (keep repeated terms) → map_zip_with against the
    // original (union keys, null for absent) → explode back to scalars.
    // Net per-term rule: boosted = 2·cnt when cnt ≥ 2 else cnt — which is
    // what the oracle computes straight off the grouped counts, no map
    // type needed on the DuckDB side.
    "map_hof_ops" -> ((s, d) => {
      val m = Tables.documents(s, d)
        .filter(col("doc_id") % 50 === 0)
        .select(col("doc_id"), explode(T).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id")
        .agg(map_from_entries(collect_list(struct(col("token"), col("cnt"))))
          .as("m"))
      m.select(
          col("doc_id"),
          size(col("m")).as("n_terms"),
          explode(map_zip_with(
            col("m"),
            map_filter(col("m"), (_, v) => v >= 2),
            (_, a, b) => a + coalesce(b, lit(0L))))
            .as(Seq("token", "boosted")))
    }),

    // Outer generator semantics: posexplode_outer keeps a (null, null) row
    // for documents whose token array is empty — the generator variant the
    // plain explode queries don't exercise.
    "posexplode_outer_tokens" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), posexplode_outer(T).as(Seq("pos", "token")))
    }),

    // Array set-operation surface (union/intersect/except/position) over
    // each document's first-half vs second-half token sets — narrow
    // per-row work. Results are sorted and string-joined (driver compare
    // cannot sort ndarray cells), and DuckDB's missing list_except /
    // order-sensitive list_intersect are normalized by sorting + explicit
    // contains-filters on both engines.
    "array_setops" -> ((s, d) => {
      val toks = T
      val half = (size(toks) / 2).cast("int")
      val a = slice(toks, lit(1), half)
      val b = slice(toks, half + 1, size(toks) - half)
      def joined(c: org.apache.spark.sql.Column) =
        array_join(array_sort(c), " ")
      Tables.documents(s, d)
        .withColumn("a", a).withColumn("b", b)
        .select(
          col("doc_id"),
          joined(array_distinct(array_intersect(col("a"), col("b")))).as("both_halves"),
          joined(array_distinct(array_except(col("a"), col("b")))).as("only_first"),
          joined(array_distinct(array_union(col("a"), col("b")))).as("vocab_union"),
          coalesce(array_position(col("a"), element_at(col("b"), 1)), lit(0L))
            .as("b0_pos_in_a"))
    }),

    // Corpus-level rollup of the text stats (one aggregation pass).
    "corpus_stats" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("toks", T)
        .withColumn("n_tokens", size(col("toks")))
        .groupBy("source")
        .agg(
          count(lit(1)).as("docs"),
          dsumLong(col("n_tokens")).as("total_tokens"),
          davg(col("n_tokens").cast("double")).as("avg_tokens"),
          min(col("n_tokens")).as("min_tokens"),
          max(col("n_tokens")).as("max_tokens"),
          countDistinct(col("lang")).as("langs")
        )
    }),

    // Vocabulary growth curve (Heaps'-law profile): distinct token types
    // vs running token count after the first 1/8, 1/4, 1/2, and all of the
    // corpus in doc_id order. Two row-scale reductions cover every prefix
    // at once — each type's FIRST document (min per token) and each doc's
    // token count — then the four prefix cells are conditional sums over
    // those aggregates against in-plan thresholds (broadcast 1-row max,
    // the drift_tvd pattern). No per-prefix rescans, no windows: the
    // 100 TB cost is one token shuffle regardless of how many curve points
    // are reported.
    "vocab_growth_curve" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(T).as("tok"))
      val first = toks.groupBy("tok").agg(min(col("doc_id")).as("fd"))
      val perDoc = toks.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val mx = Tables.documents(s, d).agg(max(col("doc_id")).as("mx"))
      def cut(k: Int) = floor(col("mx") * k / 8.0).cast("long")
      val vAgg = first.crossJoin(broadcast(mx)).agg(
        max(col("mx")).as("mx"),
        sum(when(col("fd") <= cut(1), 1L).otherwise(0L)).as("v1"),
        sum(when(col("fd") <= cut(2), 1L).otherwise(0L)).as("v2"),
        sum(when(col("fd") <= cut(4), 1L).otherwise(0L)).as("v4"),
        sum(when(col("fd") <= cut(8), 1L).otherwise(0L)).as("v8"))
      val nAgg = perDoc.crossJoin(broadcast(mx)).agg(
        sum(when(col("doc_id") <= cut(1), col("n")).otherwise(0L)).as("n1"),
        sum(when(col("doc_id") <= cut(2), col("n")).otherwise(0L)).as("n2"),
        sum(when(col("doc_id") <= cut(4), col("n")).otherwise(0L)).as("n4"),
        sum(when(col("doc_id") <= cut(8), col("n")).otherwise(0L)).as("n8"))
      vAgg.crossJoin(broadcast(nAgg))
        .selectExpr(
          """stack(4,
               1, CAST(floor(mx * 1 / 8.0) AS BIGINT), n1, v1,
               2, CAST(floor(mx * 2 / 8.0) AS BIGINT), n2, v2,
               4, CAST(floor(mx * 4 / 8.0) AS BIGINT), n4, v4,
               8, CAST(floor(mx * 8 / 8.0) AS BIGINT), n8, v8)
             AS (eighths, prefix_docs, n_tokens, vocab)""")
        .withColumn("type_token_ratio",
          col("vocab").cast("double") / col("n_tokens").cast("double"))
    }),

    // N-gram novelty curve — the freshness counterpart of
    // vocab_growth_curve at the TRIGRAM level (the unit near-dup and
    // contamination work on): split the corpus into eighths by doc id and
    // report, per eighth, how many of its distinct (doc, trigram) pairs
    // use a trigram first seen in that eighth. A collapsing novelty rate
    // is the measurable "new data stopped adding information" signal that
    // data-acquisition loops watch. Cost: one trigram shuffle for the
    // min-first-doc reduction + one bucket aggregate — both partial-
    // aggregable; the eighth boundaries ride in-plan (broadcast 1-row max).
    "ngram_novelty" -> ((s, d) => {
      val mx = Tables.documents(s, d).agg(max(col("doc_id")).as("mx"))
      def bucket(doc: Column): Column = {
        (1 to 7).foldRight(lit(8): Column) { (k, rest) =>
          when(doc <= floor(col("mx") * k / 8.0).cast("long"), k).otherwise(rest)
        }
      }
      // ONE gram shuffle carrying only (gram, min doc): the per-eighth
      // occurrence totals never need gram granularity — they reduce from
      // per-DOC distinct-trigram counts without touching the gram key.
      // Both branches read the SHARED cached gram-set layer
      // (TextDedup.gramSets — the mapPartitions kernel; Catalyst's HOF
      // ngrams builder is interpreted per element and re-evaluating it
      // per branch measured 7-8 s vs ~2 s here at sf0.1). The final
      // 1-row aggregates stack the curve.
      val gs = TextDedup.gramSets(s, d)
      val newAggs = (1 to 8).map(k =>
        sum(when(bucket(col("fd")) === k, 1L).otherwise(0L)).as(s"new$k"))
      val news = gs
        .select(col("doc_id"), explode(col("grams")).as("gram"))
        .groupBy("gram").agg(min(col("doc_id")).as("fd"))
        .crossJoin(broadcast(mx))
        .agg(newAggs.head, newAggs.tail: _*)
      val occAggs = (1 to 8).map(k =>
        sum(when(bucket(col("doc_id")) === k, col("ng")).otherwise(0L)).as(s"occ$k"))
      val occs = gs
        .select(col("doc_id"), size(col("grams")).cast("long").as("ng"))
        .crossJoin(broadcast(mx))
        .agg(occAggs.head, occAggs.tail: _*)
      news.crossJoin(broadcast(occs)).selectExpr(
          s"""stack(8, ${(1 to 8).map(k => s"$k, new$k, occ$k").mkString(", ")})
             AS (eighth, new_grams, gram_occurrences)""")
        .filter(col("gram_occurrences") > 0)
        .withColumn("novelty_rate",
          col("new_grams").cast("double") / col("gram_occurrences").cast("double"))
    }),

    // Decile-lift table for the quality score against a repetition label —
    // the standard "does the model's score actually rank the outcome"
    // evaluation (gains chart). Docs sort into EXACT score deciles with
    // the distributed ntile (range-sort + offsets — never a single-task
    // global window; (score desc, doc_id) is a total order so the cut is
    // deterministic on both engines); the label — the doc repeats a
    // trigram — is per-row inside codegen, no join; lift = decile
    // rep-rate / corpus rep-rate, both divisions after the final
    // reduction. A sloping lift column is the curation signal that
    // low-quality text repeats itself.
    "score_decile_lift" -> ((s, d) => {
      // label from the SHARED gram-set layer: a doc repeats a trigram iff
      // its distinct trigram count is below n_tokens − 2 (the total
      // trigram count) — evaluating the interpreted HOF trigram builders
      // per row here measured 5× super-linear at the sf1→sf2 doubling
      // (the scored subtree runs ~4 times through the range sampler and
      // the two rank jobs). The lazy checkpoint leafs the scored frame so
      // those passes share one materialization.
      val gdist = TextDedup.gramSets(s, d)
        .select(col("doc_id"), size(col("grams")).as("ng_dist"))
      val scored = Tables.documents(s, d)
        .withColumn("toks", T)
        .withColumn("n_tokens", size(col("toks")))
        .withColumn("nd", size(array_distinct(col("toks"))))
        .withColumn("sw", size(filter(col("toks"), t => t.isin(Stopwords: _*))))
        .select(col("doc_id"), col("n_tokens"),
          qualityExpr(col("n_tokens"), col("nd"), col("sw")).as("quality_score"))
        .join(gdist, "doc_id")
        .select(col("doc_id"), col("quality_score"),
          when(col("n_tokens") >= 3 && col("ng_dist") < col("n_tokens") - 2, 1L)
            .otherwise(0L).as("is_rep"))
        .localCheckpoint(false)
      val dec = graft.operators.Ranks.globalNtile(
        scored, Seq(col("quality_score").desc, col("doc_id")), 10, "decile")
      val overall = dec.agg(
        sum(col("is_rep")).as("rep_all"), count(lit(1)).as("n_all"))
      dec.groupBy("decile")
        .agg(count(lit(1)).as("n_docs"), sum(col("is_rep")).as("n_rep"))
        .crossJoin(broadcast(overall))
        .withColumn("rep_rate",
          col("n_rep").cast("double") / col("n_docs").cast("double"))
        .withColumn("lift", col("rep_rate")
          / (col("rep_all").cast("double") / col("n_all").cast("double")))
        .select("decile", "n_docs", "n_rep", "rep_rate", "lift")
    })
  )

  def oracles: Map[String, String] = {
    val stopSql = s"list_filter(toks, t -> t IN ($StopwordsSqlIn))"
    Map(
      // Mirrors the Spark plan: same min-first-doc / per-doc-count
      // reductions, same floor(mx·k/8) thresholds, same conditional sums,
      // one division per curve point.
      "vocab_growth_curve" -> s"""
WITH toks AS (
  SELECT doc_id, unnest($TS) AS tok FROM documents
), first AS (
  SELECT tok, min(doc_id) AS fd FROM toks GROUP BY tok
), perdoc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY doc_id
), mx AS (
  SELECT max(doc_id) AS mx FROM documents
), v AS (
  SELECT
    CAST(sum(CASE WHEN fd <= floor(mx * 1 / 8.0) THEN 1 ELSE 0 END) AS BIGINT) AS v1,
    CAST(sum(CASE WHEN fd <= floor(mx * 2 / 8.0) THEN 1 ELSE 0 END) AS BIGINT) AS v2,
    CAST(sum(CASE WHEN fd <= floor(mx * 4 / 8.0) THEN 1 ELSE 0 END) AS BIGINT) AS v4,
    CAST(sum(CASE WHEN fd <= floor(mx * 8 / 8.0) THEN 1 ELSE 0 END) AS BIGINT) AS v8
  FROM first CROSS JOIN mx
), nn AS (
  SELECT
    CAST(sum(CASE WHEN doc_id <= floor(mx * 1 / 8.0) THEN n ELSE 0 END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN doc_id <= floor(mx * 2 / 8.0) THEN n ELSE 0 END) AS BIGINT) AS n2,
    CAST(sum(CASE WHEN doc_id <= floor(mx * 4 / 8.0) THEN n ELSE 0 END) AS BIGINT) AS n4,
    CAST(sum(CASE WHEN doc_id <= floor(mx * 8 / 8.0) THEN n ELSE 0 END) AS BIGINT) AS n8
  FROM perdoc CROSS JOIN mx
), rows_ AS (
  SELECT 1 AS eighths, CAST(floor(mx * 1 / 8.0) AS BIGINT) AS prefix_docs, n1 AS n_tokens, v1 AS vocab FROM v, nn, mx
  UNION ALL
  SELECT 2, CAST(floor(mx * 2 / 8.0) AS BIGINT), n2, v2 FROM v, nn, mx
  UNION ALL
  SELECT 4, CAST(floor(mx * 4 / 8.0) AS BIGINT), n4, v4 FROM v, nn, mx
  UNION ALL
  SELECT 8, CAST(floor(mx * 8 / 8.0) AS BIGINT), n8, v8 FROM v, nn, mx
)
SELECT eighths, prefix_docs, n_tokens, vocab,
  CAST(vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS type_token_ratio
FROM rows_""",

      // Mirrors the Spark plan: same distinct-per-doc trigrams, same
      // min-first-doc reduction, same floor(mx·k/8) bucket CASE chain.
      "ngram_novelty" -> {
        def bucketSql(c: String) =
          (1 to 7).map(k =>
            s"WHEN $c <= CAST(floor(mx * $k / 8.0) AS BIGINT) THEN $k")
            .mkString("CASE ", " ", " ELSE 8 END")
        s"""
WITH mx AS (
  SELECT max(doc_id) AS mx FROM documents
), pairs AS (
  SELECT doc_id, unnest(${Text.ngramsSql(TS, 3)}) AS gram FROM documents
), firstdoc AS (
  SELECT gram, min(doc_id) AS fd FROM pairs GROUP BY gram
), ne AS (
  SELECT ${bucketSql("fd")} AS eighth, CAST(count(*) AS BIGINT) AS new_grams
  FROM firstdoc CROSS JOIN mx GROUP BY 1
), oc AS (
  SELECT ${bucketSql("doc_id")} AS eighth,
    CAST(count(*) AS BIGINT) AS gram_occurrences
  FROM pairs CROSS JOIN mx GROUP BY 1
)
SELECT oc.eighth, coalesce(ne.new_grams, 0) AS new_grams, oc.gram_occurrences,
  CAST(coalesce(ne.new_grams, 0) AS DOUBLE) / CAST(oc.gram_occurrences AS DOUBLE)
    AS novelty_rate
FROM oc LEFT JOIN ne ON oc.eighth = ne.eighth"""
      },

      // Mirrors the Spark plan: same quality score, same trigram-repetition
      // label (total vs distinct trigram list lengths), ntile(10) over the
      // same (score desc, doc_id) total order (the distributed ntile is
      // pinned bit-identical to the window function), same post-reduction
      // divisions.
      "score_decile_lift" -> s"""
WITH scored AS (
  SELECT doc_id,
    ${qualityExprSql(
        "CAST(len(toks) AS INT)",
        "CAST(len(list_distinct(toks)) AS INT)",
        s"CAST(len(list_filter(toks, t -> t IN ($StopwordsSqlIn))) AS INT)")}
      AS quality_score,
    CASE WHEN len(toks) >= 3
           AND len(${Text.ngramsSql("toks", 3)}) < len(toks) - 2
         THEN 1 ELSE 0 END AS is_rep
  FROM (SELECT doc_id, $TS AS toks FROM documents)
), dec AS (
  SELECT doc_id, quality_score, is_rep,
    CAST(ntile(10) OVER (ORDER BY quality_score DESC, doc_id) AS INTEGER)
      AS decile
  FROM scored
), overall AS (
  SELECT CAST(sum(is_rep) AS BIGINT) AS rep_all,
         CAST(count(*) AS BIGINT) AS n_all
  FROM dec
)
SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(is_rep) AS BIGINT) AS n_rep,
  CAST(sum(is_rep) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS rep_rate,
  (CAST(sum(is_rep) AS DOUBLE) / CAST(count(*) AS DOUBLE))
    / (CAST((SELECT rep_all FROM overall) AS DOUBLE)
       / CAST((SELECT n_all FROM overall) AS DOUBLE)) AS lift
FROM dec GROUP BY decile""",
      "doc_stats" -> s"""
WITH base AS (
  SELECT doc_id, text, $TS AS toks FROM documents
), m AS (
  SELECT doc_id, text,
    CAST(len(toks) AS INT) AS n_tokens,
    CAST(len(list_distinct(toks)) AS INT) AS n_distinct_tokens,
    list_reduce([0] || list_transform(toks, t -> CAST(length(t) AS INT)), (a,b) -> a+b) AS sum_token_len,
    COALESCE(CAST(list_max(list_transform(toks, t -> CAST(length(t) AS INT))) AS INT), 0) AS max_token_len,
    CAST(len($stopSql) AS INT) AS stopword_count
  FROM base
)
SELECT doc_id,
  CAST(length(text) AS INT) AS n_chars,
  n_tokens, n_distinct_tokens,
  CAST(sum_token_len AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS avg_token_len,
  CAST(n_distinct_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS type_token_ratio,
  max_token_len, stopword_count,
  CAST(stopword_count AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
  ${qualityExprSql("n_tokens", "n_distinct_tokens", "stopword_count")}
    AS quality_score
FROM m""",

      "token_counts" -> s"""
SELECT doc_id,
  CAST(len($TS) AS INT) AS ws_tokens,
  CAST(len(regexp_extract_all(lower(text), '$BpePattern')) AS INT) AS bpe_tokens,
  CAST(len(regexp_extract_all(lower(text), '$BpePattern')) AS DOUBLE) / CAST(length(text) AS DOUBLE) AS tokens_per_char
FROM documents""",

      "lang_id" -> langIdSql,

      // Mirrors langid_confusion: the lang_id oracle as a subquery, one
      // grouped count, two broadcast-sized total joins, exact divisions.
      "langid_confusion" -> s"""
WITH li AS (
  SELECT labeled_lang, predicted_lang FROM ($langIdSql)
), cm AS (
  SELECT labeled_lang, predicted_lang, CAST(count(*) AS BIGINT) AS n
  FROM li GROUP BY 1, 2
), lt AS (
  SELECT labeled_lang, CAST(sum(n) AS BIGINT) AS label_total FROM cm GROUP BY 1
), pt AS (
  SELECT predicted_lang, CAST(sum(n) AS BIGINT) AS pred_total FROM cm GROUP BY 1
)
SELECT cm.labeled_lang, cm.predicted_lang, cm.n, lt.label_total, pt.pred_total,
  CAST(cm.n AS DOUBLE) / CAST(lt.label_total AS DOUBLE) AS recall,
  CAST(cm.n AS DOUBLE) / CAST(pt.pred_total AS DOUBLE) AS precision
FROM cm JOIN lt USING (labeled_lang) JOIN pt USING (predicted_lang)""",

      // Mirrors cdc_chunk_dedup: the same 4-token window hash, boundary
      // rule, and per-chunk polynomial hash as DuckDB list lambdas.
      "cdc_chunk_dedup" -> s"""
WITH base AS (
  SELECT list_transform($TS, t -> CAST(length(t)*31 + ascii(t) AS BIGINT)) AS codes,
    CAST(len($TS) AS INT) AS n
  FROM documents
), be AS (
  SELECT codes, n,
    CASE WHEN n >= 1 THEN list_filter(generate_series(1, n), i ->
      i = n OR list_reduce(
        [CAST(0 AS BIGINT)] || array_slice(codes, greatest(i - 3, 1), i),
        (a, b) -> (a * 131 + b) % 1000000007) % 17 = 0)
    ELSE CAST([] AS BIGINT[]) END AS ends
  FROM base
), ch AS (
  SELECT unnest(list_transform(generate_series(1, len(ends)), k -> struct_pack(
      h := list_reduce(
        [CAST(0 AS BIGINT)] || array_slice(codes,
          CASE WHEN k = 1 THEN 1 ELSE ends[k-1] + 1 END, ends[k]),
        (a, b) -> (a * 131 + b) % 1000000007),
      l := CAST(ends[k] - (CASE WHEN k = 1 THEN 1 ELSE ends[k-1] + 1 END) + 1 AS BIGINT)
    ))) AS ck
  FROM be WHERE len(ends) > 0
), per AS (
  SELECT ck.h AS h, ck.l AS l, CAST(count(*) AS BIGINT) AS m FROM ch GROUP BY 1, 2
)
SELECT CAST(sum(m) AS BIGINT) AS total_chunks,
  CAST(count(*) AS BIGINT) AS distinct_chunks,
  CAST(sum(m * l) AS BIGINT) AS total_tokens,
  CAST(sum(l) AS BIGINT) AS stored_tokens,
  1.0 - CAST(sum(l) AS DOUBLE) / CAST(sum(m * l) AS DOUBLE) AS dedup_ratio
FROM per""",

      "doc_fingerprints" -> s"""
SELECT doc_id,
  sha256(text) AS content_sha,
  sha256(array_to_string($TS, ' ')) AS normalized_sha,
  ${Text.rollingHashSql(TS)} AS rolling_hash
FROM documents""",

      "explode_tokens" -> s"""
SELECT token, COUNT(*) AS occurrences
FROM (SELECT unnest($TS) AS token FROM documents)
GROUP BY token""",

      "doc_token_arrays" -> s"""
SELECT doc_id,
  array_to_string(list_sort(list_distinct($TS)), ' ') AS vocab,
  CAST(len(list_distinct($TS)) AS INT) AS vocab_size
FROM documents""",

      "token_bigrams" -> s"""
WITH base AS (SELECT $TS AS w FROM documents),
bg AS (
  SELECT unnest(CASE WHEN len(w) >= 2
    THEN list_transform(generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i+1])
    ELSE [] END) AS bigram
  FROM base
)
SELECT bigram, COUNT(*) AS occurrences
FROM bg GROUP BY bigram HAVING COUNT(*) > 1""",

      "contamination_overlap" -> s"""
WITH ng AS (
  SELECT doc_id, unnest(${Text.ngramsSql(TS, 3)}) AS g FROM documents
)
SELECT b.doc_id AS bench_id, c.doc_id AS corpus_id,
  CAST(COUNT(*) AS INT) AS shared_grams
FROM ng b JOIN ng c ON b.g = c.g AND b.doc_id % 100 = 0 AND c.doc_id % 100 <> 0
GROUP BY b.doc_id, c.doc_id
HAVING COUNT(*) >= 2""",

      "tf_df" -> s"""
WITH tokens AS (
  SELECT doc_id, unnest($TS) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tokens
  WHERE doc_id % 25 = 0 GROUP BY doc_id, token
),
df AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df FROM tokens GROUP BY token
)
SELECT tf.doc_id, tf.token, tf.tf, df.df
FROM tf JOIN df ON tf.token = df.token""",

      // Mirrors doc_surprisal_bits: same tf spine, bit lengths via
      // length(bin(x)) on exact BIGINT counts, the flag decided on the
      // integer cross-multiplication.
      "doc_surprisal_bits" -> s"""
WITH tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest($TS) AS token FROM documents)
  GROUP BY doc_id, token
), ctf AS (
  SELECT token, CAST(sum(tf) AS BIGINT) AS ctf FROM tf GROUP BY token
), t AS (
  SELECT CAST(sum(ctf) AS BIGINT) AS n_total FROM ctf
), dim AS (
  SELECT token,
    CAST(length(bin(n_total)) - length(bin(ctf)) AS BIGINT) AS bits
  FROM ctf, t
), scored AS (
  SELECT doc_id,
    CAST(sum(tf) AS BIGINT) AS n_tokens,
    CAST(sum(tf * bits) AS BIGINT) AS total_bits,
    CAST(max(bits) AS BIGINT) AS max_bits
  FROM tf JOIN dim USING (token) GROUP BY doc_id
), corpus AS (
  SELECT CAST(sum(total_bits) AS BIGINT) AS cb,
         CAST(sum(n_tokens) AS BIGINT) AS cn
  FROM scored
)
SELECT doc_id, n_tokens, total_bits, max_bits,
  CAST(total_bits AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS bits_per_token,
  total_bits * cn * 16 > cb * n_tokens * 17 AS high_surprisal
FROM scored, corpus""",

      // Mirrors doc_rarity_score: tf CTE, df as a count window over tf,
      // identical tf/df operand order into the exact int128 sum, same
      // final divides.
      "doc_rarity_score" -> s"""
WITH tf AS (
  SELECT doc_id, token, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest($TS) AS token FROM documents)
  GROUP BY doc_id, token
),
tfdf AS (
  SELECT doc_id, tf, COUNT(*) OVER (PARTITION BY token) AS df FROM tf
)
SELECT doc_id,
  CAST(SUM(tf) AS BIGINT) AS n_tokens,
  CAST(SUM(CASE WHEN df = 1 THEN tf ELSE 0 END) AS BIGINT) AS n_hapax,
  CAST(SUM(CASE WHEN df <= 3 THEN tf ELSE 0 END) AS BIGINT) AS n_rare,
  CAST(SUM(CASE WHEN df <= 3 THEN tf ELSE 0 END) AS DOUBLE)
    / CAST(SUM(tf) AS DOUBLE) AS rare_ratio,
  MIN(df) AS min_df,
  ${dsumSql("(CAST(tf AS DOUBLE) / CAST(df AS DOUBLE))")}
    / CAST(SUM(tf) AS DOUBLE) AS avg_inv_df
FROM tfdf
GROUP BY doc_id""",

      "map_hof_ops" -> s"""
WITH tf AS (
  SELECT doc_id, token, COUNT(*) AS cnt
  FROM (SELECT doc_id, unnest($TS) AS token FROM documents WHERE doc_id % 50 = 0)
  GROUP BY doc_id, token
),
nt AS (
  SELECT doc_id, CAST(COUNT(*) AS INT) AS n_terms FROM tf GROUP BY doc_id
)
SELECT tf.doc_id, nt.n_terms, tf.token,
  CASE WHEN cnt >= 2 THEN cnt + cnt ELSE cnt END AS boosted
FROM tf JOIN nt USING (doc_id)""",

      "tf_cosine_pairs" -> s"""
WITH terms AS (
  SELECT doc_id, unnest(${Text.ngramsAllSql(TS, 2)}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term
),
df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
),
kept AS (
  SELECT tf.doc_id, tf.term, tf.tf FROM tf JOIN df USING (term) WHERE df.df <= 40
),
norms AS (
  SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS n2 FROM kept GROUP BY doc_id
),
dots AS (
  SELECT a.doc_id AS da, b.doc_id AS db,
         CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
  FROM kept a JOIN kept b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT da AS doc_a, db AS doc_b,
  CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
FROM dots JOIN norms na ON na.doc_id = da JOIN norms nb ON nb.doc_id = db
WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.35""",

      "posexplode_outer_tokens" -> s"""
WITH base AS (
  SELECT doc_id, $TS AS w FROM documents WHERE doc_id % 5 = 0
),
e AS (
  SELECT doc_id,
    unnest(CASE WHEN len(w) = 0 THEN [{'pos': CAST(NULL AS INT), 'tok': CAST(NULL AS VARCHAR)}]
           ELSE list_transform(w, (t, i) -> {'pos': CAST(i - 1 AS INT), 'tok': t}) END) AS u
  FROM base
)
SELECT doc_id, u.pos AS pos, u.tok AS token FROM e""",

      "array_setops" -> s"""
WITH base AS (
  SELECT doc_id, $TS AS w FROM documents
),
halves AS (
  SELECT doc_id,
    w[1:CAST(len(w) // 2 AS INT)] AS a,
    w[CAST(len(w) // 2 AS INT) + 1:len(w)] AS b
  FROM base
)
SELECT doc_id,
  COALESCE(array_to_string(list_sort(list_distinct(list_filter(a, x -> list_contains(b, x)))), ' '), '') AS both_halves,
  COALESCE(array_to_string(list_sort(list_distinct(list_filter(a, x -> NOT list_contains(b, x)))), ' '), '') AS only_first,
  COALESCE(array_to_string(list_sort(list_distinct(a || b)), ' '), '') AS vocab_union,
  CAST(COALESCE(list_position(a, b[1]), 0) AS BIGINT) AS b0_pos_in_a
FROM halves""",

      "corpus_stats" -> s"""
WITH base AS (SELECT source, lang, CAST(len($TS) AS INT) AS n_tokens FROM documents)
SELECT source,
  COUNT(*) AS docs,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  ${davgSql("CAST(n_tokens AS DOUBLE)")} AS avg_tokens,
  MIN(n_tokens) AS min_tokens,
  MAX(n_tokens) AS max_tokens,
  COUNT(DISTINCT lang) AS langs
FROM base GROUP BY source"""
    )
  }
}
