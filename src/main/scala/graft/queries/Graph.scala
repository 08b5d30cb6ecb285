package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Iterative graph traversal as DataFrame loops — the Pregel-superstep
  * shape (like [[Analytics]]'s integer PageRank and [[graft.llm.TextDedup]]'s
  * connected components): each superstep is one equi-join + one anti-join,
  * both partitioned on the node key, and only frontier DELTAS flow between
  * steps, never whole-graph state.
  */
object Graph {

  /** Derived supplier graph shared with `triangle_count`
    * (Analytics.scala): sampled lineitem rows project to canonical
    * undirected edges (least, greatest), distinct. */
  private def symmetricEdges(s: SparkSession, d: String): DataFrame = {
    // supplier count stays IN the plan (broadcast 1-row frame, the
    // drift_tvd pattern) — query construction runs no eager action, the
    // same shape as the oracle's scalar subquery (VERDICT r6 #6)
    val nSupp = Tables.supplier(s, d).agg(count(lit(1)).as("n_supp"))
    val raw = Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 10 === 0)
      .crossJoin(broadcast(nSupp))
      .select(col("l_suppkey").as("x"), (col("l_partkey") % col("n_supp")).as("y"))
      .filter(col("x") =!= col("y"))
    val e = raw.select(
        least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .distinct()
    e.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(e.select(col("b").as("src"), col("a").as("dst")))
  }

  /** Bounded BFS from node 1: min-hop label per node within 4 hops.
    * Frontier-delta iteration — each hop joins ONLY the newly discovered
    * frontier against the adjacency list (never re-expands settled nodes)
    * and anti-joins the visited set, so per-superstep work is proportional
    * to the frontier, the distributed BFS invariant that holds at any
    * graph size. The hop bound makes the plan statically 4 supersteps. */
  def bfsHops(s: SparkSession, d: String): DataFrame = {
    val sym = symmetricEdges(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spark = s
    import spark.implicits._
    var visited = Seq((1L, 0)).toDF("node", "hops")
    var frontier = visited.select("node")
    for (h <- 1 to 4) {
      val next = frontier.join(sym, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      visited = visited.unionByName(next.withColumn("hops", lit(h)))
      // lineage truncation every 2 supersteps: visited accumulates one
      // union + anti-join layer per hop, so at unbounded hop counts the
      // plan tree (and scheduler cost) grows with the iteration count —
      // the checkpoint keeps each superstep O(frontier), not O(history).
      // Lazy: materializes with the final action, no construction-time job
      if (h % 2 == 0) visited = visited.localCheckpoint(false)
      frontier = next
    }
    visited
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bfs_hops" -> ((s, d) => bfsHops(s, d))
  )

  def oracles: Map[String, String] = Map(
    // The recursive twin: DuckDB's UNION-recursive CTE dedups states, the
    // d < 4 guard bounds depth, and min(d) per node is exactly the BFS
    // hop count the frontier iteration assigns on first discovery.
    "bfs_hops" -> """
WITH RECURSIVE raw AS (
  SELECT l_suppkey AS x,
         l_partkey % (SELECT count(*) FROM supplier) AS y
  FROM lineitem
  WHERE l_orderkey % 10 = 0
    AND l_suppkey <> l_partkey % (SELECT count(*) FROM supplier)
), e AS (
  SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b FROM raw
), adj AS (
  SELECT a AS src, b AS dst FROM e
  UNION ALL
  SELECT b AS src, a AS dst FROM e
), walk(node, d) AS (
  SELECT CAST(1 AS BIGINT) AS node, 0 AS d
  UNION
  SELECT adj.dst, walk.d + 1
  FROM walk JOIN adj ON adj.src = walk.node
  WHERE walk.d < 4
)
SELECT node, CAST(min(d) AS INT) AS hops FROM walk GROUP BY node"""
  )
}
