package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over a directed edge list — the classic
  * link-graph importance score (Page et al. 1999, "The PageRank
  * citation ranking"), and the second graph operator next to the
  * transitive-closure dedup in [[graft.llm.Dedup.convergeCanonicals]].
  * A crawl-curation pipeline uses it to weight documents by the link
  * authority of their source pages.
  *
  * Formulation: the uncalibrated power iteration of the classic Spark
  * example — rank₀ = 1.0 for every node; each round
  * `rank = (1-d) + d · Σ_in rank(src)/outdeg(src)`. Nodes without
  * out-links contribute nothing (no dangling redistribution — keeps
  * every round a pure edge-join, no global scalar per iteration);
  * nodes without in-links settle at (1-d). Fixed `iters` rounds, so
  * the result is deterministic and SQL-replayable by unrolling.
  *
  * Scale shape: ranks are (id, double) pairs — 16 bytes — and the
  * edge list carries (src, dst, outdeg) longs; document text never
  * enters the loop. The degree-annotated edge list is computed ONCE
  * and localCheckpoint-persisted across rounds; each round is one
  * join on src + one aggregation on dst (two keys-only exchanges),
  * with map-side partial aggregation collapsing high-in-degree hubs
  * before the shuffle. Rank lineage is checkpoint-truncated every
  * round, so plans stay constant-size at any iteration count. */
object PageRank {

  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
            iters: Int = 3, damping: Double = 0.85): DataFrame = {
    require(edges.columns.contains(srcCol), s"no such column '$srcCol'")
    require(edges.columns.contains(dstCol), s"no such column '$dstCol'")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0 && damping < 1, s"damping in (0,1), got $damping")

    // distinct edges: outdeg counts each link once, like the matrix form.
    // The degree-annotated edge table checkpoints EAGERLY so its row
    // count (= |E|, the per-round shuffle volume) is measurable for
    // loop-width sizing at one cheap cached count
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .distinct()
    val deg = e.groupBy("__src").agg(count(lit(1)).as("__deg"))
    val linked0 = e.join(deg, "__src").localCheckpoint(true)
    // per-round exchange width from the measured edge volume
    // (SCALING.md round-10 finding 2): each power-iteration round is
    // one |E|-row join + one |E|-row aggregation — size the round's
    // exchanges to that, not the global corpus width. The edge
    // checkpoint is scanned every round, so it narrow-coalesces to
    // the loop width too.
    val loopWidth = graft.core.LoopShuffle.width(
      edges.sparkSession, rows = linked0.count(), bytesPerRow = 32)
    val linked = graft.core.LoopShuffle.resized(linked0, loopWidth)
    // eager + resized like linked: a lazy checkpoint compiles its RDD
    // at CALL time under the session conf, so the node table would be
    // scanned at session width every round
    val nodes = graft.core.LoopShuffle.resized(
      e.select(col("__src").as("__id"))
        .union(e.select(col("__dst").as("__id"))).distinct()
        .localCheckpoint(true), loopWidth)

    var ranks = nodes.withColumn("__rank", lit(1.0))
    var prevCkpt: Option[DataFrame] = None
    for (it <- 1 to iters) {
      // eager checkpoint inside withWidth: the round's exchanges plan
      // and EXECUTE at the measured loop width (a lazy checkpoint
      // would defer planning past the conf restore), and rank lineage
      // truncates each round as before
      ranks = graft.core.LoopShuffle.withWidth(
          edges.sparkSession, loopWidth) {
        val contribs = linked
          .join(ranks, linked("__src") === ranks("__id"))
          .select(col("__dst"), (col("__rank") / col("__deg")).as("__c"))
          .groupBy("__dst").agg(sum(col("__c")).as("__sum"))
        nodes.join(contribs, nodes("__id") === contribs("__dst"), "left")
          .select(col("__id"),
            (lit(1.0 - damping) + lit(damping) * coalesce(col("__sum"), lit(0.0)))
              .as("__rank"))
          .localCheckpoint(true)
      }
      // the stale round's checkpoint blocks free as soon as the new
      // one lands — each round would otherwise pin a full rank-vector
      // copy until the job ends (round 1's input is the lazy seed)
      prevCkpt.foreach(graft.core.LoopShuffle.unpersistCheckpoint)
      prevCkpt = if (it < iters) Some(ranks) else None
    }
    // linked and nodes are not in the returned lineage — only the
    // final round's checkpoint is
    graft.core.LoopShuffle.unpersistCheckpoint(linked)
    graft.core.LoopShuffle.unpersistCheckpoint(nodes)
    ranks.select(col("__id").as("id"), col("__rank").as("rank"))
  }
}
