package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-hop BFS: minimum hop distance from a SEED SET to every
  * vertex reachable within `maxHops` — "blast radius" questions
  * (which accounts sit within 3 hops of these flagged ones, which
  * suppliers are reachable from this customer cohort, how far does an
  * incident propagate through a dependency graph). Completes the graph
  * family next to [[ConnectedComponents]] (who is connected at all),
  * [[PageRank]] (who matters), and [[Triangles]] (how clustered).
  *
  * Semantics: dist(v) = min hops from ANY seed (seeds themselves are
  * 0); vertices beyond `maxHops` are absent from the output. Edge
  * direction honored when `directed`, otherwise edges traverse both
  * ways. Self-loops, null endpoints, and duplicate edges drop up
  * front; duplicate seeds collapse.
  *
  * Scale shape: textbook frontier BFS — round h joins ONLY the
  * frontier (vertices first discovered at h-1) against the edge table
  * on the source key and anti-joins the visited set, so per-round work
  * is O(frontier-adjacent edges), not O(all discovered); both are hash
  * equi-joins on vertex ids. Edges deduplicate and localCheckpoint
  * ONCE (reused every round); visited/frontier checkpoint per round to
  * truncate lineage — the loop runs at most `maxHops` rounds (a small
  * user-chosen constant) and stops early when a frontier empties, with
  * one bounded count() action per round as the stop probe. A hub
  * vertex's adjacency fans out across tasks like any hot join key;
  * AQE's skew handling applies as-is. */
object ShortestPaths {

  /** @param edges   edge table
    * @param seeds   one-column frame of starting vertex ids (column
    *                `seedCol`); ids absent from the graph still emit
    *                at distance 0
    * @param maxHops inclusive hop bound (>= 0)
    * @return (id, dist) — minimum hops from the seed set */
  def bfs(edges: DataFrame, srcCol: String, dstCol: String,
          seeds: DataFrame, seedCol: String = "id", maxHops: Int = 3,
          directed: Boolean = false): DataFrame = {
    require(edges.columns.contains(srcCol) && edges.columns.contains(dstCol),
      s"edge columns ($srcCol, $dstCol) not in ${edges.columns.mkString(", ")}")
    require(seeds.columns.contains(seedCol),
      s"seed column '$seedCol' not in ${seeds.columns.mkString(", ")}")
    require(maxHops >= 0 && maxHops <= 64,
      s"maxHops must be in [0,64], got $maxHops — each hop is a join round")
    val src = col(srcCol)
    val dst = col(dstCol)
    val directedEdges = edges
      .where(src.isNotNull && dst.isNotNull && src =!= dst)
      .select(src.as("__src"), dst.as("__dst"))
    val traversable =
      if (directed) directedEdges
      else directedEdges.union(
        directedEdges.select(col("__dst").as("__src"), col("__src").as("__dst")))
    // dedup + checkpoint once: every round probes this same table, and
    // a multigraph's repeats would multiply every frontier expansion
    val adj0 = traversable.distinct().localCheckpoint(true)
    // per-round exchange width from the measured adjacency volume
    // (SCALING.md round-10 finding 2): each hop joins the frontier
    // against the full adjacency table, so the adjacency row count
    // bounds the round's shuffle — not the global corpus width. The
    // adjacency AND seed checkpoints are scanned every hop, so both
    // narrow-coalesce to the loop width (their own distincts ran at
    // the session width — one-time input-scale cost).
    val loopWidth = graft.core.LoopShuffle.width(
      edges.sparkSession, rows = adj0.count(), bytesPerRow = 24)
    val adj = graft.core.LoopShuffle.resized(adj0, loopWidth)

    var visited = graft.core.LoopShuffle.resized(
      seeds.select(col(seedCol).as("id")).distinct()
        .withColumn("dist", lit(0)).localCheckpoint(true), loopWidth)
    var frontier = visited
    var hop = 1
    var done = frontier.isEmpty
    while (hop <= maxHops && !done) {
      val discovered = graft.core.LoopShuffle.withWidth(
          edges.sparkSession, loopWidth) {
        frontier
          .join(adj, frontier("id") === adj("__src"))
          .select(col("__dst").as("id")).distinct()
          .join(visited.select("id"), Seq("id"), "left_anti")
          .withColumn("dist", lit(hop))
          .localCheckpoint(true)
      }
      if (discovered.isEmpty) {
        done = true
        graft.core.LoopShuffle.unpersistCheckpoint(discovered)
      } else {
        val nextVisited = visited.union(discovered).localCheckpoint(true)
        // the stale round's checkpoints free as soon as the new union
        // lands: the old visited was consumed by the union, the old
        // frontier by this round's join (round 1 aliases them — the
        // double unpersist is a no-op)
        graft.core.LoopShuffle.unpersistCheckpoint(visited)
        graft.core.LoopShuffle.unpersistCheckpoint(frontier)
        visited = nextVisited
        frontier = discovered
        hop += 1
      }
    }
    // the adjacency table and the last frontier are not in the
    // returned lineage — only the final visited union checkpoint is
    graft.core.LoopShuffle.unpersistCheckpoint(adj)
    if (!(frontier eq visited))
      graft.core.LoopShuffle.unpersistCheckpoint(frontier)
    visited
  }
}
