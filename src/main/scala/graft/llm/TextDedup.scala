package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators over the `documents` table — the core of any
  * large-scale training-data pipeline:
  *
  *  - exact dedup: group by content fingerprint (sha256 of normalized text);
  *  - near-dup by n-gram Jaccard: exact, via an inverted-index shuffle join
  *    on shared 3-grams (full recall — any pair with Jaccard ≥ t shares at
  *    least one gram);
  *  - MinHash-LSH near-dup: 128 permutations banded 32×4; candidates from
  *    band-bucket self-join, then *exact-verified* against true Jaccard, so
  *    the output is a subset of the exact pairs (at our threshold the planted
  *    near-dups sit at J ≥ 0.8 where the 32×4 banding miss probability is
  *    ~(1-0.8⁴)³² ≈ 5e-8 — the LSH output equals the exact output and shares
  *    its oracle);
  *  - SimHash near-dup: 64-bit signatures, Hamming ≤ 3 via 4-band pigeonhole
  *    blocking (3 differing bits can touch at most 3 of 4 bands, so one band
  *    must match exactly → full recall). Signature depends on Spark's
  *    xxhash64, so it has no cross-engine oracle; correctness is covered by
  *    ScalaTest against the Jaccard ground truth.
  *
  * Scale posture: nothing here is all-pairs. Exact dedup is one hash
  * aggregation; Jaccard joins on grams (prune-able by rare-gram selection at
  * higher scale); MinHash/SimHash block into buckets whose sizes are
  * data-bounded, and candidate verification touches only bucket-collision
  * pairs. That is the 100 TB-shaped algorithm; the testdata run just keeps
  * bucket sizes small.
  */
object TextDedup {

  val JaccardThreshold = 0.5
  val ContainmentThreshold = 0.8
  private val N = 3

  private val T = Text.tokens(col("text"))

  /** Gram sets are consumed by three registered queries (`dedup_jaccard`,
    * `dedup_minhash`, `corpus_clean`) — persist once per (session, dir) so
    * each bench/verify pass tokenizes the corpus once, like the layer cache
    * in [[graft.SparkEntry]]. */
  private[llm] def gramSets(s: SparkSession, d: String): DataFrame =
    graft.SessionCache.layer("grams", s, d) {
      val df = gramSetsUncached(s, d)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    }

  /** (doc_id, grams) table. Gram extraction runs as primitive string ops in
    * a typed mapPartitions: Catalyst's higher-order array functions are
    * interpreted per element (outside whole-stage codegen) and cost ~1 ms
    * per document — 20x the whole DuckDB oracle runtime. The imperative
    * loop below implements the *identical* semantics as [[Text.tokens]] /
    * [[Text.ngrams]] (ASCII lower → split on non-alphanumeric runs → drop
    * empties → space-joined distinct 3-grams), so oracle parity holds. */
  private def gramSetsUncached(s: SparkSession, d: String): DataFrame =
    gramsOf(Tables.documents(s, d))

  private[llm] def gramsOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)]
      .mapPartitions { it =>
        val sep = java.util.regex.Pattern.compile("[^a-z0-9]+")
        it.map { case (id, text) =>
          val toks = sep.split(text.toLowerCase).filter(_.nonEmpty)
          val seen = new java.util.LinkedHashSet[String]()
          var i = 0
          while (i + N - 1 < toks.length) {
            seen.add(s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}")
            i += 1
          }
          (id, seen.toArray(Array.empty[String]).toSeq)
        }
      }
      .toDF("doc_id", "grams")
  }

  /** Exact Jaccard for a candidate-pair table with columns d1, d2 — joins
    * the gram sets back in and computes |∩| / |∪| in exact integer math. */
  private def verifyJaccard(pairs: DataFrame, grams: DataFrame): DataFrame = {
    val g1 = grams.select(col("doc_id").as("d1"), col("grams").as("grams1"))
    val g2 = grams.select(col("doc_id").as("d2"), col("grams").as("grams2"))
    pairs
      .join(g1, "d1").join(g2, "d2")
      .withColumn("n_shared", size(array_intersect(col("grams1"), col("grams2"))))
      .withColumn("jaccard",
        col("n_shared").cast("double") /
          (size(col("grams1")) + size(col("grams2")) - col("n_shared")).cast("double"))
      .filter(col("jaccard") >= JaccardThreshold)
      .select("d1", "d2", "n_shared", "jaccard")
  }

  /** The shared oracle for both the exact-Jaccard and MinHash queries:
    * inverted-index exact pairs at the same threshold. */
  private val jaccardPairsSql: String = s"""
WITH ng AS (
  SELECT doc_id, ${Text.ngramsSql(Text.tokensSql("text"), N)} AS grams FROM documents
),
flat AS (SELECT doc_id, unnest(grams) AS g FROM ng),
sizes AS (SELECT doc_id, CAST(len(grams) AS INT) AS n FROM ng),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(COUNT(*) AS INT) AS n_shared
  FROM flat a JOIN flat b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT d1, d2, n_shared,
  CAST(n_shared AS DOUBLE) / CAST(s1.n + s2.n - n_shared AS DOUBLE) AS jaccard
FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
WHERE CAST(n_shared AS DOUBLE) / CAST(s1.n + s2.n - n_shared AS DOUBLE) >= $JaccardThreshold"""

  // ---- MinHash machinery -------------------------------------------------

  /** 128 fixed random-affine permutations h_i(x) = (a_i·x + b_i) mod p over
    * the base gram hash, banded 32×4. Constants from a fixed seed; p =
    * 2^31−1 keeps a·x inside Long. */
  private val NumPerms = 128
  private val Bands    = 32
  private val RowsPerBand = NumPerms / Bands
  private val P = 2147483647L
  private val perms: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NumPerms)((rnd.nextInt(Int.MaxValue - 1).toLong + 1, rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Candidate thresholds for `dedup_threshold_curve` — from the operating
    * [[JaccardThreshold]] upward (the verified pair set only contains
    * pairs at J ≥ the operating point, so the sweep is exact there). */
  private[llm] val ThresholdSweep: Seq[Double] = Seq(0.5, 0.6, 0.7, 0.8, 0.9)

  /** Candidate band splits of the 128 permutations for
    * `minhash_band_audit`: (bands, rows-per-band) with b·r = [[NumPerms]],
    * both powers of two so the S-curve powers reduce to squaring chains. */
  private[llm] val BandConfigs: Seq[(Int, Int)] =
    Seq((64, 2), (32, 4), (16, 8), (8, 16))

  /** x^e as a repeated-squaring multiply TREE (e a power of two). Both this
    * and [[powTreeSql]] build the identical association
    * ((x·x)·(x·x))·… so Spark and DuckDB round identically at every
    * intermediate — the reason the audit can hash-match without libm pow. */
  private def powTree(c: org.apache.spark.sql.Column, e: Int): org.apache.spark.sql.Column =
    if (e == 1) c
    else {
      require(e % 2 == 0, s"powTree exponent must be a power of two, got $e")
      val h = powTree(c, e / 2); h * h
    }
  private def powTreeSql(e: String, n: Int): String =
    if (n == 1) e
    else { val h = powTreeSql(e, n / 2); s"($h * $h)" }
  /** The per-pair capture probability 1 − (1 − s^r)^b in DuckDB dialect,
    * same multiply tree as the Spark side. */
  private def catchProbSql(b: Int, r: Int): String = {
    val q = s"(CAST(1.0 AS DOUBLE) - ${powTreeSql("jaccard", r)})"
    s"(CAST(1.0 AS DOUBLE) - ${powTreeSql(q, b)})"
  }

  /** Per-document band buckets, signature and banding fused into ONE
    * shuffle-free mapPartitions pass: for each doc, hash every gram once,
    * run the 128 affine permutations over the gram hashes keeping mins
    * (primitive long arrays — no explode, no 128-column aggregate; the
    * round-2 explode+groupBy shape paid a 1M-row shuffle at sf0.1 for a
    * computation that is per-document local), then fold each 4-row band to
    * its bucket hash. Emits (doc_id, band, bh). The gram hash only needs
    * engine-internal stability — candidates are exact-verified afterwards —
    * so a JVM murmur pair suffices. */
  /** The per-gram-set minhash+banding kernel shared by [[bandBuckets]]
    * (doc-keyed, batch) and the streaming gate (signature-keyed): hash
    * every gram once, run the 128 affine permutations keeping mins, fold
    * each 4-row band to its bucket hash. A gram-less doc has NO signature
    * (emitting its band rows would give every empty doc the identical
    * Long.MaxValue-min bucket in all 32 bands — an O(m²) candidate
    * blowup; verification would discard the pairs, but only after paying
    * the quadratic join). */
  private def bandRowsOf(gs: Seq[String]): Iterator[(Int, Long)] =
    if (gs.isEmpty) Iterator.empty
    else {
      val pa = permA; val pb = permB
      val mins = Array.fill(NumPerms)(Long.MaxValue)
      gs.foreach { g =>
        val h1 = scala.util.hashing.MurmurHash3.stringHash(g, 0x9747b28c)
        val h2 = scala.util.hashing.MurmurHash3.stringHash(g, 0x85ebca6b)
        val x = java.lang.Math.floorMod((h1.toLong << 32) | (h2.toLong & 0xffffffffL), P)
        var i = 0
        while (i < NumPerms) {
          val v = (pa(i) * x + pb(i)) % P
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      (0 until Bands).iterator.map { b =>
        var h = 1125899906842597L
        var r = 0
        while (r < RowsPerBand) { h = h * 31 + mins(b * RowsPerBand + r); r += 1 }
        (b, h)
      }
    }
  private lazy val permA = perms.map(_._1).toArray
  private lazy val permB = perms.map(_._2).toArray

  def bandBuckets(grams: DataFrame): DataFrame = {
    val spark = grams.sparkSession
    import spark.implicits._
    grams.as[(Long, Seq[String])].mapPartitions { it =>
      it.flatMap { case (id, gs) => bandRowsOf(gs).map { case (b, h) => (id, b, h) } }
    }.toDF("doc_id", "band", "bh")
  }

  /** Band-bucket candidate pairs (d1 < d2), deduplicated. One shared-key
    * pair join on the bucket key ([[graft.operators.Pairs.pairJoin]]);
    * bucket sizes are the banding's own tuning knob, so no degree cap. */
  def candidatePairs(buckets: DataFrame): DataFrame =
    graft.operators.Pairs.pairJoin(
        buckets, Seq("band", "bh"), "doc_id", "d1", "d2", "n_bands")
      .select("d1", "d2")

  /** Exact-collapse tier shared by the MinHash pair path and the
    * containment join: group docs whose gram SETS are identical (sha256 of
    * the sorted gram array — sort-equal distinct arrays = equal sets; "|"
    * never occurs inside a gram), keep one representative per group.
    * Returns (members: fp→doc_id, reps: fp, rep_id, grams, gsz). reps is
    * one row per distinct doc content and feeds several plan branches, so
    * its lineage is truncated. */
  private def collapse(grams: DataFrame): (DataFrame, DataFrame) = {
    val keyed = grams.withColumn("fp",
      sha2(array_join(sort_array(col("grams")), "|"), 256))
    val members = keyed.select(col("fp"), col("doc_id"))
    // group members have sort-equal gram arrays, so first() is
    // deterministic up to gram ORDER, which nothing downstream observes
    // (signatures min over the set, intersections are set-sized)
    // r17: with cached-plan AQE on, this aggregate materializes its
    // checkpoint at ~1 partition at small SF — and every consumer's gram
    // explode/tokenize then runs serial. Re-spread the CHECKPOINTED frame
    // by the content key (guarded no-op at real scale, where the
    // materialization already carries cluster parallelism).
    val spark = grams.sparkSession
    val reps = graft.Tables.spreadKeyed(spark, keyed.groupBy("fp")
      .agg(min(col("doc_id")).as("rep_id"),
        first(col("grams")).as("grams"),
        count(lit(1)).as("gsz"))
      .localCheckpoint(), Seq(col("fp")))
    (members, reps)
  }

  /** [[collapse]] over the per-(session, dir) gram layer, cached: reps is
    * localCheckpoint-materialized inside collapse, so the registered
    * consumers (the rep-pair tier, containment, the PPJoin prefix join,
    * the exact inverted-index baseline, collapse stats) reuse ONE
    * materialization instead of re-collapsing per query — the same
    * compute-the-layer-once posture as [[gramSets]]. */
  private[llm] def collapsedOf(s: SparkSession, d: String): (DataFrame, DataFrame) =
    // reps is localCheckpoint-materialized inside collapse (eager);
    // members is a narrow projection of the gram layer — nothing to
    // materialize, so the timing wraps the checkpoint job itself
    graft.SessionCache.layer("collapse", s, d)(collapse(gramSets(s, d)))

  /** Adaptive-collapse gate (round 10): the exact-collapse tier buys its
    * (1+r)-to-(1+r)² shuffle reduction only when the duplication rate r is
    * material — on a dup-free corpus the fp groupBy + expansion join are
    * pure overhead (the one real regression the repaired bench gate
    * flagged: `dedup_substring` 0.9 → 2.2 s at sf0.1). This estimates r
    * with one cheap pre-pass — count + HLL-distinct of the content
    * fingerprint, both map-side partial-aggregable, so the shuffle is a
    * handful of sketch buffers at any corpus size — and the caller picks
    * the plan, AQE-style. Both plans are exact for ANY input (the direct
    * path is the same algorithm with every doc its own representative), so
    * HLL error can only ever cost time, never correctness. */
  private[llm] val CollapseMinDupRate = 0.02
  private[llm] def estDupRate(df: DataFrame, key: Column): Double = {
    // approx_count_distinct hashes `key` internally (xxhash64-based
    // HLL++), so the pre-pass never pays the crypto-hash cost of the
    // collapse key itself — measured 2.4 s (sha2 first) vs 0.6 s (HLL on
    // the raw column) at sf0.1.
    val r = df.agg(
      count(lit(1)).as("n"),
      approx_count_distinct(key, 0.02).as("nd")).head()
    val n = r.getLong(0)
    if (n == 0L) 0.0 else 1.0 - r.getLong(1).toDouble / n
  }

  /** Expand representative-level verified pairs back to doc-level pairs:
    * cross-group pairs inherit the representatives' intersection (the
    * sets are identical), within-group ordered pairs of every duplicate
    * group are J = 1.0 by definition (non-empty sets only — empty sets
    * share no gram and are never pairs). */
  private def expandPairs(
      repPairs: DataFrame, members: DataFrame, reps: DataFrame): DataFrame = {
    val repFp = reps.select(col("rep_id"), col("fp"))
    val cross = repPairs
      .join(repFp.select(col("rep_id").as("d1"), col("fp").as("fp1")), "d1")
      .join(repFp.select(col("rep_id").as("d2"), col("fp").as("fp2")), "d2")
      .join(members.select(col("fp").as("fp1"), col("doc_id").as("a")), "fp1")
      .join(members.select(col("fp").as("fp2"), col("doc_id").as("b")), "fp2")
      .select(least(col("a"), col("b")).as("d1"),
        greatest(col("a"), col("b")).as("d2"),
        col("n_shared"), col("jaccard"))
    val dup = members
      .join(reps.select(col("fp"), size(col("grams")).as("n"), col("gsz")), "fp")
      .filter(col("gsz") >= 2 && col("n") >= 1)
    val within = dup.select(col("fp"), col("doc_id").as("a"), col("n"))
      .join(dup.select(col("fp"), col("doc_id").as("b")), "fp")
      .filter(col("a") < col("b"))
      .select(col("a").as("d1"), col("b").as("d2"),
        col("n").as("n_shared"), lit(1.0).as("jaccard"))
    cross.unionByName(within)
  }

  /** Dedup horizon of the TTL-bounded streaming gate, in event-time
    * MINUTES (each document's synthetic event time is doc_id minutes after
    * epoch, so the horizon is also a doc_id distance). Pairs farther apart
    * than this are out of dedup scope and their state is evictable — the
    * contract that keeps the state store bounded by the horizon's distinct
    * content instead of the whole arriving corpus. 250 splits the sf0.01
    * corpus (doc_ids 0..499, verified pair gaps 4..429) into a genuine
    * restriction: ~2/3 of the near-dup pairs are in-horizon. */
  val NearDupHorizonMin = 250L

  /** The streaming tier of `stream_exec_neardup_ttl`: signature + band
    * rows over an arriving (doc_id, text) stream, then per-band-bucket
    * keyed state mapping each content signature to its [min, max]
    * event-time span (minutes), emitting candidate signature pairs when
    * an arrival lies within [[NearDupHorizonMin]] of a retained partner's
    * span. Watermark-driven event-time timeouts evict a bucket's expired
    * signatures (and remove the state row entirely once all are expired);
    * the data path prunes by the same rule so a hot bucket's pair scan
    * never touches expired partners. Factored from the gate so
    * StreamingSpec can drive it over a controlled multi-batch corpus. */
  private[llm] def streamNearDupTtlCandidates(
      src: DataFrame): org.apache.spark.sql.Dataset[(String, String)] = {
    val s = src.sparkSession
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val H = NearDupHorizonMin
    // event-time minute = doc_id + 1: the engine's late-row predicate drops
    // rows at-or-below the watermark, and the watermark INITIALIZES to
    // epoch 0 — an unshifted doc_id 0 (event time exactly epoch) would be
    // silently discarded in its first batch (caught by DedupSpec's TTL
    // case). The +1 is uniform, so every horizon DIFFERENCE is unchanged
    // and the oracle keeps the plain d2 − d1 ≤ H form.
    val sigs = gramsOf(src)
      .withColumn("fp", sha2(array_join(sort_array(col("grams")), "|"), 256))
      .select(col("fp"), col("grams"), (col("doc_id") + 1).as("tmin"))
      .as[(String, Seq[String], Long)]
    // the watermark attaches AFTER the typed band explosion (typed
    // mapPartitions mints fresh attributes, which would strip the
    // event-time metadata the stateful operator's checker requires in its
    // input), and the marked ev_ts column rides along into groupByKey so
    // it survives to flatMapGroupsWithState
    val buckets = sigs.mapPartitions { it =>
        it.flatMap { case (fp, gs, t) =>
          bandRowsOf(gs).map { case (b, h) => (fp, b, h, t) }
        }
      }
      .toDF("fp", "band", "bh", "tmin")
      .withColumn("ev_ts", timestamp_seconds(col("tmin") * 60))
      .withWatermark("ev_ts", "0 seconds")
      .as[(String, Int, Long, Long, java.sql.Timestamp)]
    buckets
      .groupByKey { case (_, b, bh, _, _) => (b, bh) }
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (_: (Int, Long), rows: Iterator[(String, Int, Long, Long, java.sql.Timestamp)],
            state: GroupState[Map[String, (Long, Long)]]) => {
          def expired(span: (Long, Long), wmMin: Long) = span._2 + H < wmMin
          def nextTimeout(seen: Map[String, (Long, Long)]): Long =
            (seen.values.map(_._2).min + H + 1) * 60000L
          val wmMin = state.getCurrentWatermarkMs() / 60000L
          if (state.hasTimedOut) {
            val kept = state.get.filter { case (_, span) => !expired(span, wmMin) }
            if (kept.isEmpty) state.remove()
            else { state.update(kept); state.setTimeoutTimestamp(nextTimeout(kept)) }
            Iterator.empty
          } else {
            var seen = state.getOption.getOrElse(Map.empty[String, (Long, Long)])
              .filter { case (_, span) => !expired(span, wmMin) }
            val out = scala.collection.mutable.LinkedHashSet.empty[(String, String)]
            rows.foreach { case (fp, _, _, t, _) =>
              seen.foreach { case (o, (mn, mx)) =>
                // span distance max(0, mn−t, t−mx) ≤ H: the span endpoints
                // are real sightings, so this emits every within-H pair
                // and over-emits only candidates the exact doc-level
                // filter downstream discards
                if (o != fp && mn - t <= H && t - mx <= H)
                  out += (if (o < fp) (o, fp) else (fp, o))
              }
              seen = seen.updatedWith(fp) {
                case Some((mn, mx)) => Some((math.min(mn, t), math.max(mx, t)))
                case None           => Some((t, t))
              }
            }
            if (seen.isEmpty) state.remove()
            else { state.update(seen); state.setTimeoutTimestamp(nextTimeout(seen)) }
            out.iterator
          }
        })
      .toDF("fp1", "fp2").as[(String, String)]
  }

  /** The verified near-duplicate pair set (d1, d2, n_shared, jaccard) at
    * [[JaccardThreshold]], produced the 100 TB way: exact-collapse of
    * identical gram sets ([[collapse]] — a duplication rate r shrinks the
    * banded join (1+r)²; the sf1 replication artifact collapses back to
    * the base corpus), then MinHash band-bucket candidates over the
    * representatives, exact Jaccard verification, and expansion back
    * through the duplicate groups. The result equals the exact
    * inverted-index pair set (banding miss probability ~5e-8 at the
    * J ≥ 0.8 the corpus's planted near-dups sit at; `dedup_minhash`'s
    * shared oracle with `dedup_jaccard` proves the equality per run, and
    * DedupSpec proves the collapse/expansion on a corpus with planted
    * exact duplicates). Consumed by `dedup_minhash`, `dedup_clusters` and
    * [[CorpusClean.clean]]'s near-dup stage. */
  /** Three registered queries consume the verified pair set per pass
    * (`dedup_minhash`, and `corpus_clean` + `corpus_yield_funnel` through
    * [[CorpusClean]]'s loser list) — persist it once per (session, dir)
    * like [[gramSets]], exactly as a production pipeline materializes its
    * dedup pairs once and fans consumers out from the table. The frame is
    * pair-count-sized (bounded by true near-dup volume), far smaller than
    * its build inputs. */
  def nearDupPairs(s: SparkSession, d: String): DataFrame =
    graft.SessionCache.layer("near_dup_pairs", s, d) {
      val (members, reps, repPairs) = collapsedRepPairs(s, d)
      val df = expandPairs(repPairs, members, reps)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    }

  /** Cluster assignments (doc_id, cluster_rep, is_kept), cached per
    * (session, dir) like [[nearDupPairs]]: `dedup_clusters` and
    * `dedup_keep_best` differ only in what they aggregate AFTER the
    * label-propagation fixpoint, so the superstep loop runs once. The
    * frame is one row per clustered doc — cheap to keep. */
  private[llm] def clustersOf(s: SparkSession, d: String): DataFrame =
    graft.SessionCache.layer("clusters", s, d) {
      val (members, reps, repPairs) = collapsedRepPairs(s, d)
      val (asg, scratch) = clusterAssignmentsFrom(members, reps, repPairs)
      val df = asg.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      // the loop's per-round label frames are scratch once the assignment
      // frame is materialized — release them eagerly (they recompute via
      // lineage if the result's own blocks are ever evicted)
      scratch.foreach(_.unpersist(false))
      df
    }

  /** The REP-level tier under [[nearDupPairs]] and `dedup_clusters`:
    * collapse + banded candidates + exact verification, cached per
    * (session, dir) so the clustering query and the pair consumers share
    * one build of the verified rep-pair graph (they differ only in what
    * they do AFTER verification — expansion vs label propagation). */
  private def collapsedRepPairs(
      s: SparkSession, d: String): (DataFrame, DataFrame, DataFrame) =
    graft.SessionCache.layer("rep_pairs", s, d) {
      val (members, reps) = collapsedOf(s, d)
      val repGrams = reps.select(col("rep_id").as("doc_id"), col("grams"))
      val repPairs = verifyJaccard(candidatePairs(bandBuckets(repGrams)), repGrams)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      repPairs.count()
      (members, reps, repPairs)
    }

  private[llm] def nearDupPairsFromGrams(grams: DataFrame): DataFrame = {
    val (members, reps) = collapse(grams)
    val repGrams = reps.select(col("rep_id").as("doc_id"), col("grams"))
    val repPairs = verifyJaccard(candidatePairs(bandBuckets(repGrams)), repGrams)
    expandPairs(repPairs, members, reps)
  }

  /** The EXACT inverted-index Jaccard pair set, over collapsed
    * representatives — the full-recall baseline `dedup_minhash` is
    * measured against (same collapse, different candidate generator:
    * every shared gram vs the banded buckets). */
  private[llm] def jaccardPairsFromGrams(grams: DataFrame): DataFrame = {
    val (members, reps) = collapse(grams)
    jaccardPairsFrom(members, reps)
  }

  private def jaccardPairsFrom(members: DataFrame, reps: DataFrame): DataFrame = {
    val flat = reps.select(col("rep_id").as("doc_id"), explode(col("grams")).as("g"))
    val shared = graft.operators.Pairs.pairJoin(
        flat, Seq("g"), "doc_id", "d1", "d2", "n_shared")
      .withColumn("n_shared", col("n_shared").cast("int"))
    val sizes = reps.select(col("rep_id").as("doc_id"), size(col("grams")).as("n"))
    val repPairs = shared
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
      .withColumn("jaccard",
        col("n_shared").cast("double") / (col("n1") + col("n2") - col("n_shared")).cast("double"))
      .filter(col("jaccard") >= JaccardThreshold)
      .select("d1", "d2", "n_shared", "jaccard")
    expandPairs(repPairs, members, reps)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Observability for the exact-collapse tier (VERDICT r9 #7): the tier
    // is the load-bearing scale mechanism of the whole dedup family
    // (nearDupPairs, containment, clusters, prefix join, corpus_clean),
    // and this query makes its effect measurable per corpus — group
    // count, duplication rate r, and the (1+r)² factor by which the
    // collapsed pair joins shrink. One hash aggregation over the same
    // fingerprint [[collapse]] keys on.
    "dedup_collapse_stats" -> ((s, d) => {
      // reads the tier the other dedup queries actually run on — the
      // cached reps carry (fp, gsz) already materialized
      val groups = collapsedOf(s, d)._2.select("fp", "gsz")
      groups
        .agg(
          sum(col("gsz")).as("n_docs"),
          count(lit(1)).as("n_groups"),
          (sum(col("gsz")) - count(lit(1))).as("n_dup_docs"),
          max(col("gsz")).as("max_group"))
        .select(col("n_docs"), col("n_groups"), col("n_dup_docs"), col("max_group"),
          (col("n_dup_docs").cast("double") / col("n_groups").cast("double"))
            .as("dup_rate"),
          ((col("n_docs") * col("n_docs")).cast("double") /
            (col("n_groups") * col("n_groups")).cast("double"))
            .as("pair_shuffle_saving"))
    }),

    // Exact dedup by normalized-content fingerprint: one hash aggregation.
    "dedup_exact" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), sha2(array_join(T, " "), 256).as("fingerprint"))
        .groupBy("fingerprint")
        .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("copies"))
    }),

    // Exact n-gram Jaccard near-dup pairs via inverted-index join over
    // the exact-collapsed representatives ([[collapse]] — still the exact
    // algorithm: identical gram sets have identical intersections, so
    // rep-level pairs expand losslessly). The shared-gram count IS the
    // join-match count (grams are distinct per doc), so one groupBy
    // replaces any per-pair set intersection — the shape that survives
    // scale-up: shuffle on gram, aggregate on pair, and the df² candidate
    // growth of duplicated text never enters the join (BASELINE.md: the
    // uncollapsed join was 56× at 10× replicated data).
    "dedup_jaccard" -> ((s, d) => {
      val (members, reps) = collapsedOf(s, d)
      jaccardPairsFrom(members, reps)
    }),

    // CONTAINMENT near-dup (asymmetric Jaccard): |grams(A) ∩ grams(B)| /
    // |grams(A)| — catches a short doc embedded inside a longer one, which
    // symmetric Jaccard misses (the union in its denominator is dominated
    // by the longer doc). Two exact tiers, both with unchanged oracle:
    //
    // Tier 0 — EXACT COLLAPSE: docs with identical gram SETS (sha256 of
    // the sorted gram array) form one group; the join runs on one
    // REPRESENTATIVE per group and results expand back through the
    // groups (cross-group pairs inherit the representatives' intersection
    // — the sets are identical; within-group ordered pairs are containment
    // = 1.0 by definition, for non-empty sets). This is the exact-dedup-
    // before-near-dup stage every curation stack runs anyway, fused in:
    // on a corpus with duplication rate r the join shrinks (1+r)² — the
    // sf1 replication artifact (10 identical copies of every doc, df
    // uniformly ×10) collapses back to the base corpus, BASELINE.md.
    //
    // Tier 1 — PREFIX FILTER on the contained side's rarest grams
    // (pigeonhole, exact — not probabilistic): containment ≥ t means B
    // misses at most n₁ − ⌈t·n₁⌉ of A's grams, so B must share one of ANY
    // fixed n₁ − ⌈t·n₁⌉ + 1 of them; choosing the globally RAREST (df
    // order — the `jaccard_prefix_join` machinery) probes the coldest
    // postings lists instead of the full inverted index. On real text
    // (Zipfian df, rare grams plentiful) this bounds candidates near the
    // output size; verification recomputes the true intersection on the
    // full gram arrays of the (collapsed) representatives.
    "dedup_containment" -> ((s, d) => {
      val (members, reps) = collapsedOf(s, d)
      val flat = reps.select(col("fp"), explode(col("grams")).as("g"))
      // rep-level document frequency; ties broken by gram text so the
      // prefix choice is deterministic (any fixed choice is correct)
      val gdf = flat.groupBy("g").agg(count(lit(1)).as("df"))
      // r16: the (df, g) prefix order made DENSE — each vocabulary gram
      // gets its global rank (a bijection over the vocabulary dim), so
      // the prefix slice, the candidate equi-join and the verification
      // intersect all run on primitive longs instead of gram strings,
      // and the two per-fp windows (count + row_number) collapse into
      // one sort_array(collect_list) aggregate whose slice IS the
      // rarest-grams prefix. Same prefix set, same candidate set, same
      // intersection sizes — oracle unchanged.
      // r17 (ADVICE r16): the rank is DISTRIBUTED — a range-partitioned
      // sort on the total order (df, g) plus monotonically_increasing_id.
      // The gram dictionary grows with the corpus (shingle vocab is
      // near-linear in tokens), so the r16 single-task row_number window
      // over it was the exact shape the global-window audit exists to
      // catch. The id is NOT dense, but it is ORDER-ISOMORPHIC to the
      // (df, g) total order (range partitions respect the sort order and
      // the id's high bits are the partition index), and every consumer
      // is invariant under any order-isomorphic injective gram->long map:
      // the prefix slice takes the k smallest (same gram set), the
      // candidate join tests rank equality, and n_shared/containment
      // come from array_intersect SIZES of injectively mapped arrays —
      // so the output is bit-identical to the dense-rank form (oracle
      // re-proven). Unlike Ranks.globalRowNumber this stays a lazy
      // DataFrame (no zipWithIndex count job, no RDD round-trip): the
      // only extra cost over the window form is the range sampling pass,
      // and no task ever holds the whole dictionary.
      val grk = gdf.repartitionByRange(col("df"), col("g"))
        .sortWithinPartitions("df", "g")
        .withColumn("rk", monotonically_increasing_id())
      // prefix length: n − ⌈t·n⌉ + 1 = n − (4n+4) div 5 + 1 at t = 4/5,
      // in pure integer arithmetic (a double t·n can round the boundary).
      // Checkpointed once: feeds the prefix explode, the probe side and
      // both verification sides (the diamond-reuse rule).
      // r17: re-spread the CHECKPOINTED frame (guarded no-op at scale) —
      // cached-plan AQE materializes this aggregate at ~1 partition at
      // small SF, and its consumers (prefix explode, candidate join, the
      // array_intersect verify) are compute-heavy narrow stages.
      val perRep = graft.Tables.spreadKeyed(s, flat.join(grk.select("g", "rk"), "g")
        .groupBy("fp")
        .agg(sort_array(collect_list(col("rk"))).as("arr"),
          count(lit(1)).as("n1c"))
        .withColumn("plen",
          (col("n1c") - expr("(n1c * 4 + 4) div 5") + 1).cast("int"))
        .localCheckpoint(), Seq(col("fp")))
      val prefix = perRep.select(col("fp").as("fp1"),
        explode(slice(col("arr"), lit(1), col("plen"))).as("rk"))
      val cands = prefix
        .join(perRep.select(col("fp").as("fp2"), explode(col("arr")).as("rk")), "rk")
        .filter(col("fp1") =!= col("fp2"))
        .select("fp1", "fp2").distinct()
      val repPairs = cands
        .join(perRep.select(col("fp").as("fp1"), col("arr").as("arr1")), "fp1")
        .join(perRep.select(col("fp").as("fp2"), col("arr").as("arr2")), "fp2")
        .withColumn("n_shared",
          size(array_intersect(col("arr1"), col("arr2"))))
        .withColumn("containment",
          col("n_shared").cast("double") / size(col("arr1")).cast("double"))
        .filter(col("containment") >= ContainmentThreshold)
        .select("fp1", "fp2", "n_shared", "containment")
      val cross = repPairs
        .join(members.select(col("fp").as("fp1"), col("doc_id").as("contained_doc")), "fp1")
        .join(members.select(col("fp").as("fp2"), col("doc_id").as("container_doc")), "fp2")
        .select("contained_doc", "container_doc", "n_shared", "containment")
      // within-group ordered pairs: identical non-empty gram sets contain
      // each other exactly (n_shared = n, containment = n/n = 1.0 — the
      // same double the oracle's division produces); empty sets share no
      // gram and never reach the oracle's intersection, so exclude them
      val m = members
        .join(reps.select(col("fp"), size(col("grams")).as("n"), col("gsz")), "fp")
        .filter(col("gsz") >= 2 && col("n") >= 1)
      val within = m.select(col("fp"), col("doc_id").as("contained_doc"), col("n"))
        .join(m.select(col("fp"), col("doc_id").as("container_doc")), "fp")
        .filter(col("contained_doc") =!= col("container_doc"))
        .select(col("contained_doc"), col("container_doc"),
          col("n").as("n_shared"), lit(1.0).as("containment"))
      cross.unionByName(within)
    }),

    // INCREMENTAL dedup: today's ingest batch (deterministic 20% of docs,
    // the hash_split "new" bucket) checked against the EXISTING corpus and
    // itself — old×old pairs are never generated, so daily dedup cost is
    // proportional to the batch, not the corpus. Restored probe-side shape
    // (round 11, VERDICT r10 #1): the inverted gram index keeps the full
    // corpus on the build side while the probe side carries ONLY the
    // new-batch groups, restricted by a semi-join BEFORE the gram shuffle
    // (PlanShapeSpec pins the LeftSemi upstream of the gram join). The
    // round-10 86× blowup came from duplicated corpus text's df² growth in
    // the gram join, not from the probe shape itself — so the fix is the
    // same exact-collapse tier the rest of the family runs on, applied to
    // BOTH sides of the index: identical gram sets join as one
    // representative each, and directed rep-level pairs expand back
    // through the duplicate groups (new members of the probe group × all
    // members of the partner group; within-group ordered pairs are J = 1.0
    // by definition). Unlike the round-10 filter over the LSH-verified
    // pair layer, this is EXACT by construction at any Jaccard — no
    // banding S-curve in the recall path (ADVICE r10: a J = 0.5 pair had
    // ~12.7% miss odds under 32×4 banding). Output: for each new doc, its
    // near-dup partners anywhere in the corpus, both directions when both
    // endpoints are new — matching the brute-force oracle's directed form.
    "dedup_incremental" -> ((s, d) => {
      def isNew(c: Column) =
        ((c * 1103515245L + 12345L) % 2147483647L) % 100L >= 80L
      val (members, reps) = collapsedOf(s, d)
      // probe restriction FIRST: groups containing >= 1 new-batch doc
      val newMembers = members.filter(isNew(col("doc_id")))
      val probeFps = newMembers.select("fp").distinct()
      val probeFlat = reps.join(probeFps, Seq("fp"), "left_semi")
        .select(col("fp").as("fpp"), explode(col("grams")).as("g"))
      val indexFlat = reps.select(col("fp").as("fpi"), explode(col("grams")).as("g"))
      // grams are distinct per doc, so the per-(probe, index) match count
      // IS the set intersection — one aggregation, no per-pair recompute
      val shared = probeFlat.join(indexFlat, "g")
        .filter(col("fpp") =!= col("fpi"))
        .groupBy("fpp", "fpi")
        .agg(count(lit(1)).cast("int").as("n_shared"))
      val sizes = reps.select(col("fp"), size(col("grams")).as("n"))
      val repPairs = shared
        .join(sizes.select(col("fp").as("fpp"), col("n").as("np")), "fpp")
        .join(sizes.select(col("fp").as("fpi"), col("n").as("ni")), "fpi")
        .withColumn("jaccard", col("n_shared").cast("double") /
          (col("np") + col("ni") - col("n_shared")).cast("double"))
        .filter(col("jaccard") >= JaccardThreshold)
      // cross-group expansion: the sets are identical within a group, so
      // every (new member of probe group, member of partner group) pair
      // inherits the representatives' intersection; a partner group that
      // also holds new docs was probe-active too, so the reverse direction
      // is generated by its own probe row — no union gymnastics needed
      val cross = repPairs
        .join(newMembers.select(col("fp").as("fpp"), col("doc_id").as("new_doc")), "fpp")
        .join(members.select(col("fp").as("fpi"), col("doc_id").as("partner_doc")), "fpi")
        .select("new_doc", "partner_doc", "n_shared", "jaccard")
      // within-group directed pairs: new member × every other member of a
      // duplicate group with a non-empty gram set (empty sets share no
      // gram and never reach the oracle's intersection join)
      val m = members
        .join(reps.select(col("fp"), size(col("grams")).as("n"), col("gsz")), "fp")
        .filter(col("gsz") >= 2 && col("n") >= 1)
      val within = m.filter(isNew(col("doc_id")))
        .select(col("fp"), col("doc_id").as("new_doc"), col("n"))
        .join(m.select(col("fp"), col("doc_id").as("partner_doc")), "fp")
        .filter(col("new_doc") =!= col("partner_doc"))
        .select(col("new_doc"), col("partner_doc"),
          col("n").cast("int").as("n_shared"), lit(1.0).as("jaccard"))
      cross.unionByName(within)
    }),

    // Duplication-rate report per source: exact-hash distinct texts vs
    // total docs — the per-shard health metric a curation pipeline tracks
    // over time (a rising dup ratio flags a crawler gone circular). One
    // grouped pass; ratio quantized for the exact compare.
    "dup_rate_by_source" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(sha2(col("text"), 256)).as("n_distinct_texts"))
        .withColumn("dup_ratio_q",
          round((lit(1.0) - col("n_distinct_texts").cast("double") /
            col("n_docs").cast("double")) * lit(1e9), 0).cast("long"))
    }),

    // Cross-source overlap matrix: how many shared-boilerplate pairs
    // (identical 40-char text prefix) span each (source_a < source_b)
    // pair — the contamination/provenance report behind "which crawls
    // copied from each other". Join on the prefix fingerprint
    // (inverted-index shape), never doc×doc; exact full-text dups are
    // within-source in this corpus, so the prefix is the cross-source
    // signal.
    "source_overlap_matrix" -> ((s, d) => {
      val h = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), substring(col("text"), 1, 40).as("th"))
      val a = h.select(col("th"), col("source").as("source_a"), col("doc_id").as("da"))
      val b = h.select(col("th"), col("source").as("source_b"), col("doc_id").as("db"))
      a.join(b, "th")
        .filter(col("source_a") < col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("n_dup_pairs"),
          countDistinct(col("th")).as("n_shared_texts"))
    }),

    // MinHash-LSH near-dup: banded signatures → bucket join → exact verify.
    // Same oracle as dedup_jaccard (see class doc for the recall argument).
    "dedup_minhash" -> ((s, d) => nearDupPairs(s, d)),

    // Streaming INCREMENTAL near-dup through the actual engine — the
    // arriving-corpus shape of `dedup_incremental`, but through Structured
    // Streaming instead of a batch probe join. Documents stream in; each
    // doc's CONTENT SIGNATURE (the collapse-tier fp — sha256 of the sorted
    // gram set, computed in-stream by the same expression) probes
    // per-band-bucket keyed state (flatMapGroupsWithState; state = the
    // DISTINCT signatures seen in that bucket so far) and signature pairs
    // are emitted the moment a second distinct signature arrives. Keying
    // state by signature instead of doc id is the streaming analog of the
    // exact-collapse tier: duplicated content neither grows the state nor
    // re-emits pairs, so state and candidate volume are bounded by
    // DISTINCT content, immune to the duplication blowup (the doc-keyed
    // first cut paid 61 s at sf1 verifying the expanded 250k pair set;
    // this shape verifies ~512 rep pairs and expands losslessly). At
    // 100 TB a watermark TTL bounds the store; the gate keeps NoTimeout
    // because the whole corpus is one retained epoch. Downstream of the
    // sink: exact rep-level Jaccard against the static collapse layer,
    // then the shared duplicate-group expansion — output equals
    // `dedup_minhash`'s verified pair set, so the exact inverted-index
    // oracle is shared; DedupSpec additionally pins stream ≡ batch.
    "stream_exec_neardup" -> ((s, d) => graft.streaming.StreamGate.scoped(s) {
      import s.implicits._
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
      val src = Tables.documentsStream(s, d).select("doc_id", "text")
      val sigs = gramsOf(src)
        .withColumn("fp", sha2(array_join(sort_array(col("grams")), "|"), 256))
        .select(col("fp"), col("grams")).as[(String, Seq[String])]
      val buckets = sigs.mapPartitions { it =>
        it.flatMap { case (fp, gs) => bandRowsOf(gs).map { case (b, h) => (fp, b, h) } }
      }
      val cands = buckets
        .groupByKey { case (_, b, bh) => (b, bh) }
        .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
          (_: (Int, Long), rows: Iterator[(String, Int, Long)], state: GroupState[Seq[String]]) => {
            val stored = state.getOption.getOrElse(Seq.empty[String])
            // membership probes run per ROW against a hash set built once
            // per (group, batch) — the Seq.contains linear scan was O(n²)
            // per hot band bucket (VERDICT r11); the persisted state stays
            // a Seq only because it has a tuple-free stock encoder
            val seen = scala.collection.mutable.LinkedHashSet(stored: _*)
            val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
            rows.foreach { case (fp, _, _) =>
              if (!seen.contains(fp)) {
                seen.foreach(o => out += (if (o < fp) (o, fp) else (fp, o)))
                seen += fp
              }
            }
            if (seen.nonEmpty) state.update(seen.toSeq)
            out.iterator
          })
        .toDF("fp1", "fp2")
      val name = graft.streaming.StreamGate.uniqueName("graft_stream_neardup_sink")
      val ckpt = graft.streaming.StreamGate.tempDir("ckpt_nd_")
      val q = cands.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.streaming.StreamGate.recordState("stream_exec_neardup", q)
      val (members, reps) = collapsedOf(s, d)
      val repPairs = s.table(name).distinct()
        .join(reps.select(col("fp").as("fp1"), col("rep_id").as("d1"),
          col("grams").as("g1")), "fp1")
        .join(reps.select(col("fp").as("fp2"), col("rep_id").as("d2"),
          col("grams").as("g2")), "fp2")
        .withColumn("n_shared", size(array_intersect(col("g1"), col("g2"))))
        .withColumn("jaccard", col("n_shared").cast("double") /
          (size(col("g1")) + size(col("g2")) - col("n_shared")).cast("double"))
        .filter(col("jaccard") >= JaccardThreshold)
        .select("d1", "d2", "n_shared", "jaccard")
      expandPairs(repPairs, members, reps)
    }),

    // Horizon-bounded streaming near-dup gate (VERDICT r11 #1 — the one
    // structure left that grew without bound on an arriving corpus). Same
    // content-signature-keyed shape as `stream_exec_neardup`, but state is
    // EVICTED: each document carries a synthetic event time (doc_id
    // minutes after epoch — deterministic, so both engines can restrict
    // to the horizon), the stream is watermarked, per-bucket state maps
    // each signature to its [min, max] event-time span, and
    // GroupStateTimeout.EventTimeTimeout drops signatures once the
    // watermark passes their last sighting by more than
    // [[NearDupHorizonMin]] (the in-data branch prunes by the same rule,
    // so a hot bucket never pairs against expired partners either).
    // Output contract: every doc-level near-dup pair whose event times
    // lie within the horizon — candidate sig pairs stream out whenever an
    // arrival's time lies within H of a retained partner's span (the span
    // endpoints are real sightings, so a within-H doc pair always has its
    // later member arrive while the earlier one's span is in-horizon and
    // unevictable under event-time-ordered arrival), then the batch tier
    // exact-verifies rep-level Jaccard and the duplicate-group expansion
    // applies the exact per-doc horizon filter (over-emitted candidates
    // die there; under-emission cannot happen). The oracle is the exact
    // inverted-index pair set restricted to the same horizon.
    // StreamingSpec separately proves eviction: a multi-batch run drops
    // expired signatures (numRowsRemoved > 0) and never pairs across the
    // horizon.
    "stream_exec_neardup_ttl" -> ((s, d) => graft.streaming.StreamGate.scoped(s) {
      val name = graft.streaming.StreamGate.uniqueName("graft_stream_neardup_ttl_sink")
      val ckpt = graft.streaming.StreamGate.tempDir("ckpt_ndt_")
      val q = streamNearDupTtlCandidates(
          Tables.documentsStream(s, d).select("doc_id", "text"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.streaming.StreamGate.recordState("stream_exec_neardup_ttl", q)
      val (members, reps) = collapsedOf(s, d)
      val repPairs = s.table(name).distinct()
        .join(reps.select(col("fp").as("fp1"), col("rep_id").as("d1"),
          col("grams").as("g1")), "fp1")
        .join(reps.select(col("fp").as("fp2"), col("rep_id").as("d2"),
          col("grams").as("g2")), "fp2")
        .withColumn("n_shared", size(array_intersect(col("g1"), col("g2"))))
        .withColumn("jaccard", col("n_shared").cast("double") /
          (size(col("g1")) + size(col("g2")) - col("n_shared")).cast("double"))
        .filter(col("jaccard") >= JaccardThreshold)
        .select("d1", "d2", "n_shared", "jaccard")
      expandPairs(repPairs, members, reps)
        .filter(col("d2") - col("d1") <= NearDupHorizonMin)
    }),

    // Band-configuration recall audit — the dedup analog of
    // `ann_recall_audit`: for each (bands b × rows-per-band r) split of the
    // 128 permutations, the expected recall of LSH banding over the
    // corpus's MEASURED verified near-dup pair distribution. Per pair at
    // exact Jaccard s the capture probability is the S-curve
    // 1 − (1 − s^r)^b; summed exactly (int128 fixed-point — order
    // independent) it gives the expected number of true pairs each config
    // would surface, and min(p) the worst pair's odds. This is the audit
    // that justifies a band choice BEFORE a 100 TB dedup pass: the input
    // is the (tiny, pair-count-sized) verified pair set, the powers are
    // repeated-squaring multiply trees (b, r are powers of two) — no libm
    // pow, so both engines produce bit-identical doubles — and the whole
    // query is four one-row aggregates over a cached frame.
    "minhash_band_audit" -> ((s, d) => {
      val pairs = nearDupPairs(s, d)
      // ONE aggregation pass computes all four configs' sums/mins (the
      // per-row cost is just the multiply trees), then a stack() unpivot
      // emits the 4-row result — vs a union of four aggregate jobs each
      // re-reading the cached pair frame (measured 1.36 s → one job).
      val aggCols = BandConfigs.flatMap { case (b, r) =>
        val p = lit(1.0) - powTree(lit(1.0) - powTree(col("jaccard"), r), b)
        Seq(
          graft.expr.Exact.dsum(p).as(s"ec_${b}_$r"),
          min(p).as(s"mp_${b}_$r"))
      }
      val stackArgs = BandConfigs
        .map { case (b, r) => s"$b, $r, ec_${b}_$r, mp_${b}_$r" }
        .mkString(s"stack(${BandConfigs.size}, ", ", ",
          ") as (bands, rows_per_band, expected_caught, min_catch_prob)")
      pairs
        .agg(count(lit(1)).as("n_pairs"), aggCols: _*)
        .select(expr(stackArgs), col("n_pairs"))
        .select(
          col("bands"), col("rows_per_band"), col("n_pairs"),
          col("expected_caught"),
          (col("n_pairs").cast("double") - col("expected_caught"))
            .as("expected_missed"),
          col("min_catch_prob"))
    }),

    // Threshold-sweep audit — the τ-selection companion to
    // `minhash_band_audit`: for each candidate Jaccard threshold at or
    // above the operating τ, how many pairs qualify and how many
    // documents the keep-first policy would drop. Sweeping τ on the real
    // pair distribution is how the dedup aggressiveness is chosen before
    // a full run; since the verified pair set is materialized (and
    // pair-count-sized), the whole curve is one conditional aggregation
    // pass + a stack() unpivot.
    "dedup_threshold_curve" -> ((s, d) => {
      val pairs = nearDupPairs(s, d)
      val aggCols = ThresholdSweep.zipWithIndex.flatMap { case (t, i) =>
        Seq(
          count(when(col("jaccard") >= t, lit(1))).as(s"np_$i"),
          countDistinct(when(col("jaccard") >= t, col("d2"))).as(s"nd_$i"))
      }
      val stackArgs = ThresholdSweep.zipWithIndex
        .map { case (t, i) => s"${t}D, np_$i, nd_$i" }
        .mkString(s"stack(${ThresholdSweep.size}, ", ", ",
          ") as (threshold, n_pairs, n_dropped_docs)")
      pairs.agg(aggCols.head, aggCols.tail: _*).select(expr(stackArgs))
    }),

    // SimHash near-dup pairs at Hamming <= 3 (full-recall pigeonhole
    // blocking; see simhashPairs).
    "dedup_simhash" -> ((s, d) => simhashPairs(Tables.documents(s, d))),

    // Near-dup CLUSTERING: connected components over the Jaccard pair
    // graph via iterative min-label propagation — the step that turns
    // pairwise matches into keep/drop decisions (keep the min doc_id of
    // each component). The driver loop runs until a fixpoint; iterations
    // = graph diameter, which for dup clusters is tiny (they are
    // near-cliques) — the identical loop GraphX/GraphFrames connected
    // components runs at cluster scale, one edge-shuffle per round, never
    // an all-pairs closure on the big side. The oracle computes the same
    // components via a recursive transitive closure (fine at oracle
    // scale, dead at 100 TB — which is exactly why the engine side
    // iterates instead).
    //
    // Edge source: the MinHash-banded verified pairs over the
    // exact-collapsed representatives ([[clusterAssignments]]) — identical
    // component structure (see clusterAssignments doc) at banded,
    // collapsed cost, with the unchanged transitive-closure oracle.
    "dedup_clusters" -> ((s, d) => clustersOf(s, d)),

    // Quality-aware canonical selection: within each near-dup cluster keep
    // the HIGHEST-QUALITY member (tie → lowest doc_id), not the arbitrary
    // min-id — the curation rule real pipelines apply once clusters exist
    // (the best-written copy of a duplicated page survives, not the first
    // one crawled). Shape: the cached cluster frame joins the narrow
    // per-doc quality frame on doc_id, then one groupBy(cluster) with a
    // struct-max argmax — no window, no second pass. The oracle re-derives
    // the same clusters via its transitive closure and picks the keeper
    // with a per-cluster rank.
    "dedup_keep_best" -> ((s, d) => {
      val q = TextAnalysis.qualityOf(Tables.documents(s, d))
      clustersOf(s, d)
        .join(q, "doc_id")
        .groupBy(col("cluster_rep"))
        .agg(
          count(lit(1)).as("n_members"),
          max(struct(col("quality_score").as("q"), (-col("doc_id")).as("nid")))
            .as("best"))
        .select(
          col("cluster_rep"),
          (-col("best.nid")).as("keeper_doc_id"),
          col("best.q").as("keeper_quality"),
          col("n_members"))
    }),

    // Exact duplicate SUBSTRING spans (Lee et al., "Deduplicating
    // Training Data"): find every maximal character span whose G-wide
    // windows all occur at least twice in the corpus — the dedup mode
    // whole-document MinHash cannot see (a long verbatim quote inside two
    // otherwise-distinct documents). See [[substringSpans]].
    "dedup_substring" -> ((s, d) => substringSpans(s, d))
  )

  /** Connected components over the near-dup pair graph, computed at
    * REPRESENTATIVE level: min-label propagation runs on the collapsed
    * rep-pair graph (one edge-shuffle per superstep, iterations = graph
    * diameter — the GraphX/GraphFrames CC loop), then labels expand
    * through the duplicate groups. Correctness: the expanded pair graph's
    * edges are exactly (cross-group expansions of rep edges) ∪ (within-
    * group cliques), so its components are the union of the groups of
    * each rep component, plus every edge-less duplicate group (≥2 members,
    * non-empty gram set) as its own clique component. cluster_rep = the
    * min doc_id of the expanded component (the oracle's least(a, MIN
    * reachable)), computed as a window min over the component label.
    *
    * Scale: the CC superstep cost is bounded by the COLLAPSED graph (the
    * sf1 replication artifact's 979× pair growth never enters the loop);
    * the expansion is pure output work. */
  private[llm] def clusterAssignments(grams: DataFrame): DataFrame = {
    val (members, reps) = collapse(grams)
    val repGrams = reps.select(col("rep_id").as("doc_id"), col("grams"))
    val repPairs = verifyJaccard(candidatePairs(bandBuckets(repGrams)), repGrams)
    clusterAssignmentsFrom(members, reps, repPairs)._1
  }

  /** Returns (assignments, scratch): `scratch` is the loop's persisted
    * per-round frames, safe for the caller to release once the result is
    * materialized — they recompute via lineage (unlike the every-2-rounds
    * localCheckpoint frames, which are NOT returned: unpersisting a
    * checkpointed frame severs its only storage; their blocks are
    * node-scale and die with the session). */
  private def clusterAssignmentsFrom(
      members: DataFrame, reps: DataFrame,
      repPairs: DataFrame): (DataFrame, Seq[DataFrame]) = {
    import org.apache.spark.sql.expressions.Window
    val scratch = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val pairs = repPairs.select("d1", "d2")
    val edges = pairs.select(col("d1").as("src"), col("d2").as("dst"))
      .unionByName(pairs.select(col("d2").as("src"), col("d1").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    scratch += edges
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    scratch += labels
    var changed = 1L
    var iter = 0
    while (changed > 0) {
      iter += 1
      // shuffle_hash on BOTH per-round label joins: AQE otherwise
      // broadcast-converts the node-scale label frame, and each broadcast
      // build is a SEPARATE job that re-derives every unmaterialized
      // earlier round — the k_core cascade (Graph.scala k-core loop /
      // commit 50deb5a; measured 20.3 s → low single digits for the
      // clusters layer at sf0.1). Label frames are one row per node —
      // never broadcastable at real graph sizes anyway.
      val nbrMin = edges
        .join(labels.select(col("node").as("dst"), col("lbl").as("dlbl"))
          .hint("shuffle_hash"), "dst")
        .groupBy("src").agg(min(col("dlbl")).as("nl"))
        .select(col("src").as("node"), col("nl"))
      val step = labels
        .join(nbrMin.hint("shuffle_hash"), Seq("node"), "left")
        .select(col("node"), least(col("lbl"), coalesce(col("nl"), col("lbl"))).as("lbl"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      scratch += step
      // superstep lineage truncation every 2 rounds, LAZY (the
      // pagerank/bfs/k_core discipline, 50deb5a): label propagation runs
      // diameter-many rounds, and without truncation the plan nests one
      // join tree per round — unbounded optimizer/DAG-scheduler cost at
      // real cluster diameters (VERDICT r6). Lazy, so the materialization
      // rides the `changed` count below instead of being its own job.
      val next = if (iter % 2 == 0) step.localCheckpoint(false) else step
      changed = next.join(labels.select(col("node"), col("lbl").as("old"))
          .hint("shuffle_hash"), "node")
        .filter(col("lbl") =!= col("old")).count() // materializes `next`
      labels = next
    }
    // duplicate groups with no rep-level edge are their own components
    val isolatedDups = reps
      .filter(col("gsz") >= 2 && size(col("grams")) >= 1)
      .select(col("rep_id").as("node"))
      .join(labels.select("node"), Seq("node"), "left_anti")
      .withColumn("lbl", col("node"))
    val out = labels.unionByName(isolatedDups)
      .join(reps.select(col("rep_id").as("node"), col("fp")), "node")
      .join(members, "fp")
      .withColumn("cluster_rep", min(col("doc_id")).over(Window.partitionBy("lbl")))
      .select(col("doc_id"), col("cluster_rep"),
        (col("doc_id") === col("cluster_rep")).as("is_kept"))
    (out, scratch.toSeq)
  }

  /** Duplicate-span width: a span is reported when every one of its
    * G-char windows occurs ≥2 times corpus-wide — the character-level
    * analogue of Lee et al.'s 50-token threshold, sized to this corpus's
    * ~5-char tokens. */
  val SubstringG = 30

  /** Lee et al. exact substring dedup, Spark-shaped. The suffix-array of
    * the paper is approximated by its shuffle-friendly equivalent: explode
    * every G-char window (gram) of every document, ONE shuffle partitions
    * the corpus by gram text, and a windowed count flags grams occurring
    * ≥2 times anywhere (cross-doc or repeated within one doc — both are
    * training-data duplication). Flagged positions then merge into maximal
    * spans per document with the standard interval merge: a new island
    * starts when the next duplicated position no longer overlaps-or-
    * touches the previous window (gap > G), islands aggregate to
    * (span_start, span_end, span_len, n_dup_grams).
    *
    * Scale shape: the gram stream is |total_chars| rows — linear, like
    * the paper's suffix array; the only wide exchanges are the gram
    * hash-partition and the per-doc island window. Nothing is all-pairs:
    * the duplicated-gram flag is a count over the gram's own hash
    * bucket. At 100 TB the gram shuffle is the dominant cost and is the
    * designed one (Lee et al. pay the identical sort); stride or
    * rare-first pruning bolts on by filtering the exploded frame. */
  def substringSpans(s: SparkSession, d: String, g: Int = SubstringG): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    substringSpansOver(s, docs, g,
      collapseTier = estDupRate(docs, col("text")) >= CollapseMinDupRate)
  }

  private[llm] def substringSpansOver(
      s: SparkSession, docs: DataFrame, g: Int, collapseTier: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val gm1 = g - 1
    // Exact-collapse tier, char-level edition (VERDICT r9 #6): identical
    // raw texts produce identical gram streams and identical spans, so the
    // G-gram explode — a ~G× blowup of the corpus's bytes and the query's
    // dominant shuffle — runs once per DISTINCT text. Corpus-wide
    // duplicate counts must still see the copies, so each representative
    // gram carries the group size as a weight and the ≥2 flag sums
    // weights (an exact duplicate group of ≥2 flags its whole text — the
    // correct Lee-et-al. answer for verbatim copies). One extra
    // text-sized shuffle (the fp groupBy) buys a duplication-rate
    // reduction of the G×-sized one — worth it exactly when the corpus
    // HAS duplication, so [[estDupRate]] gates it; the direct path keys
    // the identical pipeline by doc_id (w = 1 per doc reproduces the
    // corpus-wide occurrence counts verbatim).
    val (reps, finish) =
      if (collapseTier) {
        // the crypto-strength collapse key is only computed on this branch
        // — the direct path keys by doc_id and never hashes a byte
        val keyed = docs.withColumn("fp", sha2(col("text"), 256))
        val members = keyed.select(col("fp"), col("doc_id"))
        // r17: the rep frame feeds the G-gram flatMap TWICE (count build +
        // probe). Checkpoint it once — the sha2 + collapse groupBy run one
        // time instead of two — and re-spread the materialization by fp
        // (cached-plan AQE coalesces this text-sized aggregate to ~1
        // partition at small SF, serializing both flatMap evaluations;
        // guarded no-op at real scale). The GRAM stream itself stays
        // recompute-not-materialize (r16 measurement: persisting the
        // G×-corpus stream costs more than re-running the flatMap).
        val r = graft.Tables.spreadKeyed(s, keyed.groupBy("fp")
          .agg(first(col("text")).as("text"), count(lit(1)).as("copies"))
          .localCheckpoint(), Seq(col("fp")))
        (r, (spans: DataFrame) =>
          // expansion: every member of a text group reports its rep's spans
          spans.join(members, "fp")
            .select("doc_id", "span_start", "span_end", "span_len", "n_dup_grams"))
      } else {
        val r = docs.select(col("doc_id").cast("string").as("fp"),
          col("text"), lit(1L).as("copies"))
        (r, (spans: DataFrame) =>
          spans.select(col("fp").cast("long").as("doc_id"),
            col("span_start"), col("span_end"), col("span_len"), col("n_dup_grams")))
      }
    // Per-position G-grams, extracted imperatively in a typed flatMap:
    // Catalyst's higher-order transform() is interpreted per element
    // (~µs/position × |total_chars| positions — measured 5.9s at sf0.1 vs
    // 1.5s for this loop), while substring on a resident string is pure
    // JVM char copying. Same trade [[gramSetsUncached]] makes.
    val grams = reps
      .select(col("fp"), col("text"), col("copies")).as[(String, String, Long)]
      .flatMap { case (fp, t, w) =>
        if (t == null || t.length < g) Iterator.empty
        else (1 to t.length - g + 1).iterator
          .map(p => (fp, p.toLong, t.substring(p - 1, p - 1 + g), w))
      }
      .toDF("fp", "pos", "gv", "w")
    // The gram stream feeds both the count build and the join probe and
    // is evaluated twice — measured CHEAPER than materializing it
    // (persist 3.9s vs re-eval 3.3s at sf0.1: the per-position stream is
    // G× the corpus, so storing it costs more than re-running the
    // flatMap; at 100 TB the same holds harder — recompute from the
    // scan, never materialize a G-times-corpus intermediate).
    // corpus-wide gram counts via AGGREGATION + join-back, not a window
    // keyed on gram content (round-10 keyed-window skew audit: a hot
    // 30-char gram — repeated boilerplate — would serialize one window
    // partition; the aggregation combines map-side, and only grams with
    // total weight >= 2 join back, shrinking the probe)
    val hotGrams = grams.groupBy("gv").agg(sum(col("w")).as("cnt"))
      .filter(col("cnt") >= 2)
    val flagged = grams.join(hotGrams, "gv")
    val wd = Window.partitionBy("fp").orderBy("pos")
    val spans = flagged
      .withColumn("brk",
        when(lag(col("pos"), 1).over(wd).isNull ||
          col("pos") - lag(col("pos"), 1).over(wd) > g, 1).otherwise(0))
      .withColumn("island", sum(col("brk")).over(
        wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("fp"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + gm1).as("span_end"),
        (max(col("pos")) + gm1 - min(col("pos")) + 1).as("span_len"),
        count(lit(1)).as("n_dup_grams"))
    finish(spans)
  }

  /** Shared oracle for `dedup_clusters` and (nested) `dedup_keep_best`:
    * the same pair CTEs as the near-dup queries, then the component via
    * recursive transitive closure + min — an independently-derived
    * formulation of the label-propagation fixpoint. */
  private val clustersSql: String = s"""
WITH RECURSIVE ng AS (
  SELECT doc_id, ${Text.ngramsSql(Text.tokensSql("text"), N)} AS grams FROM documents
),
flat AS (SELECT doc_id, unnest(grams) AS g FROM ng),
sizes AS (SELECT doc_id, CAST(len(grams) AS INT) AS n FROM ng),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(COUNT(*) AS INT) AS n_shared
  FROM flat a JOIN flat b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT d1, d2
  FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
  WHERE CAST(n_shared AS DOUBLE) / CAST(s1.n + s2.n - n_shared AS DOUBLE) >= $JaccardThreshold
),
edges AS (SELECT d1 AS a, d2 AS b FROM pairs UNION SELECT d2 AS a, d1 AS b FROM pairs),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT a AS doc_id, least(a, MIN(b)) AS cluster_rep,
  a = least(a, MIN(b)) AS is_kept
FROM reach GROUP BY a"""

  def oracles: Map[String, String] = Map(
    // Mirrors `dedup_collapse_stats`: DuckDB groups by the sorted gram
    // array directly (same equivalence classes as the engine's
    // sha256-of-sorted-grams key); identical integer counts, identical
    // division operand order for the two doubles.
    "dedup_collapse_stats" -> s"""
WITH ng AS (
  SELECT doc_id, ${Text.ngramsSql(Text.tokensSql("text"), N)} AS grams FROM documents
),
g AS (
  SELECT array_to_string(list_sort(grams), '|') AS fp,
         CAST(count(*) AS BIGINT) AS gsz
  FROM ng GROUP BY 1
),
c AS (
  SELECT CAST(sum(gsz) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_groups,
         CAST(sum(gsz) - count(*) AS BIGINT) AS n_dup_docs,
         CAST(max(gsz) AS BIGINT) AS max_group
  FROM g
)
SELECT n_docs, n_groups, n_dup_docs, max_group,
  CAST(n_dup_docs AS DOUBLE) / CAST(n_groups AS DOUBLE) AS dup_rate,
  CAST(n_docs * n_docs AS DOUBLE) / CAST(n_groups * n_groups AS DOUBLE) AS pair_shuffle_saving
FROM c""",

    "dedup_exact" -> s"""
SELECT sha256(array_to_string(${Text.tokensSql("text")}, ' ')) AS fingerprint,
  MIN(doc_id) AS keeper_doc_id, COUNT(*) AS copies
FROM documents GROUP BY 1""",
    "dedup_jaccard" -> jaccardPairsSql,
    "dup_rate_by_source" -> """
SELECT source, count(*) AS n_docs,
  count(DISTINCT sha256(text)) AS n_distinct_texts,
  CAST(round((1.0 - CAST(count(DISTINCT sha256(text)) AS DOUBLE)
    / CAST(count(*) AS DOUBLE)) * 1e9, 0) AS BIGINT) AS dup_ratio_q
FROM documents GROUP BY source""",
    "source_overlap_matrix" -> """
WITH h AS (SELECT doc_id, source, substring(text, 1, 40) AS th FROM documents)
SELECT a.source AS source_a, b.source AS source_b,
  count(*) AS n_dup_pairs,
  count(DISTINCT a.th) AS n_shared_texts
FROM h a JOIN h b ON a.th = b.th AND a.source < b.source
GROUP BY a.source, b.source""",
    "dedup_incremental" -> s"""
WITH ng AS (
  SELECT doc_id, ${Text.ngramsSql(Text.tokensSql("text"), N)} AS grams FROM documents
),
flat AS (SELECT doc_id, unnest(grams) AS g FROM ng),
sizes AS (SELECT doc_id, CAST(len(grams) AS INT) AS n FROM ng),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(COUNT(*) AS INT) AS n_shared
  FROM flat a
  JOIN flat b ON a.g = b.g AND a.doc_id <> b.doc_id
  WHERE ((b.doc_id * 1103515245 + 12345) % 2147483647) % 100 >= 80
  GROUP BY a.doc_id, b.doc_id
)
SELECT d2 AS new_doc, d1 AS partner_doc, n_shared,
  CAST(n_shared AS DOUBLE) / CAST(s1.n + s2.n - n_shared AS DOUBLE) AS jaccard
FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
WHERE CAST(n_shared AS DOUBLE) / CAST(s1.n + s2.n - n_shared AS DOUBLE) >= $JaccardThreshold""",
    "dedup_containment" -> s"""
WITH ng AS (
  SELECT doc_id, ${Text.ngramsSql(Text.tokensSql("text"), N)} AS grams FROM documents
),
flat AS (SELECT doc_id, unnest(grams) AS g FROM ng),
sizes AS (SELECT doc_id, CAST(len(grams) AS INT) AS n FROM ng),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(COUNT(*) AS INT) AS n_shared
  FROM flat a JOIN flat b ON a.g = b.g AND a.doc_id <> b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT d1 AS contained_doc, d2 AS container_doc, n_shared,
  CAST(n_shared AS DOUBLE) / CAST(s1.n AS DOUBLE) AS containment
FROM inter JOIN sizes s1 ON s1.doc_id = d1
WHERE CAST(n_shared AS DOUBLE) / CAST(s1.n AS DOUBLE) >= $ContainmentThreshold""",
    "dedup_minhash" -> jaccardPairsSql,
    // the streaming gate produces the same verified pair set, so it shares
    // the exact inverted-index oracle
    "stream_exec_neardup" -> jaccardPairsSql,
    // the TTL gate's scope: the exact pair set restricted to the event-time
    // horizon (doc_id distance == event-time minutes by construction)
    "stream_exec_neardup_ttl" -> s"""
SELECT d1, d2, n_shared, jaccard FROM ($jaccardPairsSql
) WHERE d2 - d1 <= $NearDupHorizonMin""",

    // One aggregate arm per sweep threshold over the same verified-pair
    // CTE; conditional COUNT / COUNT(DISTINCT CASE) mirror the engine's
    // conditional aggregation columns.
    "dedup_threshold_curve" -> {
      val arms = ThresholdSweep.map { t =>
        s"""SELECT CAST($t AS DOUBLE) AS threshold,
  COUNT(CASE WHEN jaccard >= $t THEN 1 END) AS n_pairs,
  COUNT(DISTINCT CASE WHEN jaccard >= $t THEN d2 END) AS n_dropped_docs
FROM pairs"""
      }
      s"""WITH pairs AS (
$jaccardPairsSql
)
${arms.mkString("\nUNION ALL\n")}"""
    },

    // Same verified-pair CTE as dedup_jaccard, then one aggregate per band
    // config; the S-curve powers are the identical repeated-squaring
    // multiply trees the engine side builds (catchProbSql/powTree).
    "minhash_band_audit" -> {
      val pairCte = s"""
WITH ng AS (
  SELECT doc_id, ${Text.ngramsSql(Text.tokensSql("text"), N)} AS grams FROM documents
),
flat AS (SELECT doc_id, unnest(grams) AS g FROM ng),
sizes AS (SELECT doc_id, CAST(len(grams) AS INT) AS n FROM ng),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(COUNT(*) AS INT) AS n_shared
  FROM flat a JOIN flat b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT CAST(n_shared AS DOUBLE) / CAST(s1.n + s2.n - n_shared AS DOUBLE) AS jaccard
  FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
  WHERE CAST(n_shared AS DOUBLE) / CAST(s1.n + s2.n - n_shared AS DOUBLE) >= $JaccardThreshold
)"""
      val arms = BandConfigs.map { case (b, r) =>
        val p = catchProbSql(b, r)
        s"""SELECT $b AS bands, $r AS rows_per_band, COUNT(*) AS n_pairs,
  ${graft.expr.Exact.dsumSql(p)} AS expected_caught,
  CAST(COUNT(*) AS DOUBLE) - ${graft.expr.Exact.dsumSql(p)} AS expected_missed,
  MIN($p) AS min_catch_prob
FROM pairs"""
      }
      pairCte + "\n" + arms.mkString("\nUNION ALL\n")
    },

    // Same pair CTEs, then the component via recursive transitive
    // closure + min — an independently-derived formulation of the
    // label-propagation fixpoint.
    "dedup_clusters" -> clustersSql,

    // Clusters re-derived by the same transitive closure, the keeper by a
    // per-cluster rank over the shared quality frame (argmax = rank 1 on
    // quality DESC, doc_id — the identical total order the engine's
    // struct-max encodes).
    "dedup_keep_best" -> s"""
WITH clusters AS (
$clustersSql
),
q AS (${TextAnalysis.qualityOfSql}),
j AS (
  SELECT c.cluster_rep, c.doc_id, q.quality_score,
    ROW_NUMBER() OVER (PARTITION BY c.cluster_rep
      ORDER BY q.quality_score DESC, c.doc_id) AS rn,
    COUNT(*) OVER (PARTITION BY c.cluster_rep) AS n_members
  FROM clusters c JOIN q ON q.doc_id = c.doc_id
)
SELECT cluster_rep, doc_id AS keeper_doc_id, quality_score AS keeper_quality,
  CAST(n_members AS BIGINT) AS n_members
FROM j WHERE rn = 1""",

    // Mirrors [[simhashes]]/[[simhashPairs]] fold for fold: same two
    // polynomial hashes, same 62-bit vote/signature rule, same 16/16/15/15
    // banding, same Hamming cutoff.
    "dedup_simhash" -> s"""
WITH tk AS (
  SELECT doc_id, unnest(list_distinct(${Text.tokensSql("text")})) AS t FROM documents
),
th AS (
  SELECT doc_id,
    list_reduce([CAST(0 AS BIGINT)] || list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT)), (h, c) -> (h*31 + c) % 2147483647) AS h1,
    list_reduce([CAST(0 AS BIGINT)] || list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT)), (h, c) -> (h*131 + c) % 2147483629) AS h2
  FROM tk
),
votes AS (
  SELECT doc_id, j,
    CAST(SUM((CASE WHEN j < 31 THEN (h1 >> j) & 1 ELSE (h2 >> (j-31)) & 1 END) * 2 - 1) AS BIGINT) AS v
  FROM th CROSS JOIN generate_series(0, 61) AS g(j)
  GROUP BY doc_id, j
),
sigs AS (
  SELECT doc_id, CAST(SUM(CASE WHEN v >= 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS sig
  FROM votes GROUP BY doc_id
),
banded AS (
  SELECT doc_id, sig, b,
    CASE b WHEN 0 THEN sig & 65535
           WHEN 1 THEN (sig >> 16) & 65535
           WHEN 2 THEN (sig >> 32) & 32767
           ELSE (sig >> 47) & 32767 END AS bh
  FROM sigs CROSS JOIN generate_series(0, 3) AS gb(b)
),
pairs AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, a.sig AS s1, b.sig AS s2
  FROM banded a JOIN banded b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
)
SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS INT) AS hamming
FROM pairs WHERE bit_count(xor(s1, s2)) <= 3""",

    // Independent formulation of [[substringSpans]]: same per-position
    // G-gram explode, same corpus-wide occurrence count, same gap>G
    // interval merge — integer arithmetic end to end.
    "dedup_substring" -> s"""
WITH grams AS (
  SELECT doc_id,
    unnest(list_transform(generate_series(1, greatest(length(text) - ${SubstringG - 1}, 0)),
                          i -> {'pos': i, 'g': substr(text, i, $SubstringG)})) AS pg
  FROM documents
), flat AS (
  SELECT doc_id, CAST(pg.pos AS BIGINT) AS pos, pg.g AS g FROM grams
), flagged AS (
  SELECT doc_id, pos, count(*) OVER (PARTITION BY g) AS cnt FROM flat
), dup AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > $SubstringG
              THEN 1 ELSE 0 END AS brk
  FROM flagged WHERE cnt >= 2
), isl AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM dup
)
SELECT doc_id, min(pos) AS span_start,
       max(pos) + ${SubstringG - 1} AS span_end,
       max(pos) + ${SubstringG - 1} - min(pos) + 1 AS span_len,
       CAST(count(*) AS BIGINT) AS n_dup_grams
FROM isl GROUP BY doc_id, island"""
  )

  // ---- SimHash (cross-engine oracle via polynomial token hashes) ---------

  /** Token hash for SimHash: TWO 31-bit polynomial character folds
    * (h·m + code) mod p with different (m, p), concatenated to a 62-bit
    * hash. Chosen over murmur/xxhash precisely because the identical fold
    * is expressible in DuckDB SQL (`list_reduce` over `string_split`), so
    * the whole SimHash query gets a real oracle instead of a rows-only
    * check. Tokens are ASCII [a-z0-9] by construction ([[Text.tokens]]),
    * so char codes agree across engines. */
  private val SimBits = 62
  private def polyHash(t: String, mult: Long, mod: Long): Long = {
    var h = 0L
    var i = 0
    while (i < t.length) { h = (h * mult + t.charAt(i)) % mod; i += 1 }
    h
  }

  /** 62-bit SimHash per doc: per-bit ±1 votes over the distinct-token
    * hashes, bit set iff the vote sum is non-negative; bits 0-30 from the
    * (31, 2^31-1) fold, bits 31-61 from the (131, 2147483629) fold. Docs
    * with zero tokens have no signature (matches the oracle, where they
    * produce no vote rows). One narrow mapPartitions — no shuffle at all
    * until the pair-blocking join. */
  def simhashes(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)]
      .mapPartitions { it =>
        val sep = java.util.regex.Pattern.compile("[^a-z0-9]+")
        it.flatMap { case (id, text) =>
          val toks = sep.split(text.toLowerCase).filter(_.nonEmpty).distinct
          if (toks.isEmpty) Iterator.empty
          else {
            val votes = new Array[Int](SimBits)
            toks.foreach { t =>
              val h1 = polyHash(t, 31L, 2147483647L)
              val h2 = polyHash(t, 131L, 2147483629L)
              var j = 0
              while (j < 31) {
                if (((h1 >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
                if (((h2 >>> j) & 1L) == 1L) votes(31 + j) += 1 else votes(31 + j) -= 1
                j += 1
              }
            }
            var sig = 0L
            var j = 0
            while (j < SimBits) { if (votes(j) >= 0) sig |= (1L << j); j += 1 }
            Iterator.single((id, sig))
          }
        }
      }
      .toDF("doc_id", "simhash")
  }

  /** 4-band pigeonhole blocking over the 62-bit signature (16/16/15/15
    * bits): Hamming <= 3 flips at most 3 bands, so one band matches
    * exactly -> full recall at the radius. */
  private def simBand(sig: Column, b: Int): Column = b match {
    case 0 => sig.bitwiseAND(lit(0xFFFFL))
    case 1 => shiftright(sig, 16).bitwiseAND(lit(0xFFFFL))
    case 2 => shiftright(sig, 32).bitwiseAND(lit(0x7FFFL))
    case _ => shiftright(sig, 47).bitwiseAND(lit(0x7FFFL))
  }

  /** Band-blocked SimHash pairs over an exact-collapse tier on the
    * SIGNATURE (round 10): docs with byte-identical signatures form one
    * group; the band-bucket self-join runs over one representative per
    * signature, and results expand back losslessly — cross-group pairs
    * inherit the representatives' Hamming distance (members share the
    * exact signature), within-group pairs are Hamming 0 by definition.
    * Same full-recall pigeonhole guarantee, but duplicated text's bucket
    * blow-up (10 replicas -> 100x bucket pair volume, 43x wall-clock at
    * 10x replicated data) never enters the join; the within-group clique
    * output is exactly the required Hamming-0 pair set — output-bound. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = simhashes(docs)
    val reps = sigs.groupBy("simhash").agg(min(col("doc_id")).as("rep_id"))
      .select(col("rep_id"), col("simhash"))
    val banded = reps.select(
      col("rep_id"), col("simhash"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"), simBand(col("simhash"), b).as("bh"))
      }: _*)).as("bb"))
      .select(col("rep_id"), col("simhash"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val l = banded.select(col("band"), col("bh"), col("rep_id").as("r1"), col("simhash").as("h1"))
    val r = banded.select(col("band"), col("bh"), col("rep_id").as("r2"), col("simhash").as("h2"))
    val repPairs = l.join(r, Seq("band", "bh")).filter(col("r1") < col("r2"))
      .select(col("h1"), col("h2"), bit_count(col("h1").bitwiseXOR(col("h2"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
    // cross-group expansion: every member pair across the two signature
    // groups, ordered by doc_id (the rep order need not survive expansion)
    val m1 = sigs.select(col("simhash").as("h1"), col("doc_id").as("m1"))
    val m2 = sigs.select(col("simhash").as("h2"), col("doc_id").as("m2"))
    val cross = repPairs
      .join(m1, "h1").join(m2, "h2")
      .select(least(col("m1"), col("m2")).as("d1"),
        greatest(col("m1"), col("m2")).as("d2"), col("hamming"))
    // within-group cliques: identical signatures are Hamming 0 — keyed on
    // the signature, quadratic only in group size (the required output)
    val within = sigs.select(col("simhash"), col("doc_id").as("d1"))
      .join(sigs.select(col("simhash"), col("doc_id").as("d2")), "simhash")
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), lit(0).cast("int").as("hamming"))
    cross.unionByName(within)
  }
}
