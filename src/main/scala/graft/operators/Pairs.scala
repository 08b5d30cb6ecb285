package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The shared-key pair join — the one relational shape behind co-purchase
  * mining, link-prediction wedges, MinHash band-bucket candidates and the
  * inverted-index Jaccard intersection: items grouped by a key, all
  * unordered item pairs within each key, aggregated to a per-pair count.
  *
  * Physical shape: ONE self-join co-partitioned on the key (both sides
  * shuffle on the same key, AQE can see per-key sizes) followed by one
  * pair-keyed aggregation. Never item×item: candidate volume is
  * Σ_key n_key², bounded per group.
  *
  * Scale guard: Σ n_key² is quadratic in the HOTTEST key, so a single
  * degenerate group (a stopword gram, a mega-bucket, a crawler order with
  * 10⁵ lines) can dominate the whole job. `maxPerKey` caps the items
  * entering the join per key — rank by `rowOrder` inside the key, keep the
  * first N — turning the worst case into N·n_key. Callers that prove their
  * group sizes are data-bounded (orders hold ≤7 lines; LSH bucket sizes are
  * the tuning knob) may pass None; anything fed by open-domain text should
  * cap (the [[graft.queries.Graph]] adjacency does, at 10).
  */
object Pairs {

  /** All unordered item pairs (out1 < out2) sharing `keys`, with the
    * number of shared keys as `cnt`. `item` must be distinct per key
    * (pre-aggregate otherwise — the count is a key-multiplicity count).
    *
    * @param maxPerKey optional (cap, orderCols) — keep only the first
    *   `cap` items per key under `orderCols` (col, ascending) before the
    *   self-join; the deterministic degree cap.
    */
  def pairJoin(
      df: DataFrame,
      keys: Seq[String],
      item: String,
      out1: String,
      out2: String,
      cnt: String,
      maxPerKey: Option[(Int, Seq[(String, Boolean)])] = None): DataFrame = {
    val capped = maxPerKey match {
      case Some((cap, order)) =>
        graft.plans.TopK.perKey(df, keys, order, cap)
      case None => df
    }
    val kc: Seq[Column] = keys.map(col)
    val a = capped.select(kc :+ col(item).as(out1): _*)
    val b = capped.select(kc :+ col(item).as(out2): _*)
    // SHUFFLE_HASH, not the default sort-merge: both sides are the same
    // keyed item stream, and sorting them buys nothing the hash build
    // doesn't — at the sf5 tier the SMJ sorts of the wedge stream were
    // the dominant cost (the triangle_count knee, round 12). The build
    // side is one per-partition slice of the capped item stream, the
    // same memory class as the sort buffer it replaces, and spillable.
    a.join(b.hint("shuffle_hash"), keys)
      .filter(col(out1) < col(out2))
      .groupBy(out1, out2)
      .agg(count(lit(1)).as(cnt))
  }
}
