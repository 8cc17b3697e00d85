package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** General connected components over an arbitrary undirected edge
  * table — the dedup family's transitive closure
  * ([[graft.llm.Dedup.convergeCanonicals]]) promoted to a first-class
  * graph operator: entity resolution across linkage pairs, household /
  * account grouping, fraud-ring discovery over shared attributes — any
  * "which rows belong together" question expressed as edges.
  *
  * Semantics: a vertex's component is the MINIMUM vertex id reachable
  * from it (the usual min-label convention), so labels are
  * deterministic and engine-independent. Self-loops and null endpoints
  * are dropped; edge direction and multiplicity are ignored.
  *
  * Scale shape (inherited from the closure): edges checkpoint ONCE and
  * are deduplicated up front (a multigraph's repeats would otherwise
  * inflate every round's join); each round is ONE fused join+agg pass
  * that propagates neighbor minima AND pointer-jumps
  * canonical(canonical(x)) in the same shuffle, so labels travel 2^k
  * hops after k rounds — a diameter-D graph converges in ~log2(D)
  * rounds, not D. Isolated vertices never ride the loop; they rejoin at
  * the end as their own components. */
object ConnectedComponents {

  /** Components of the graph in `edges`.
    *
    * @param vertices optional explicit vertex universe (one column
    *                 `vertexCol`) — pass it when isolated vertices
    *                 (rows with no surviving edge) must appear in the
    *                 output; otherwise the universe is the ids present
    *                 in the edge list.
    * @return (id, component) — `component` is the minimum id in the
    *         vertex's component. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          vertices: Option[DataFrame] = None, vertexCol: String = "id",
          maxIters: Int = 20): DataFrame = {
    require(edges.columns.contains(srcCol) && edges.columns.contains(dstCol),
      s"edge columns ($srcCol, $dstCol) not in ${edges.columns.mkString(", ")}")
    val src = col(srcCol)
    val dst = col(dstCol)
    // normalized pairs: non-null, no self-loops, one row per unordered
    // pair (least/greatest + distinct) — multigraphs collapse here so
    // repeats never inflate the per-round join
    val pairs = edges
      .where(src.isNotNull && dst.isNotNull && src =!= dst)
      .select(least(src, dst).as("id_a"), greatest(src, dst).as("id_b"))
      .distinct()
    val ids = vertices match {
      case Some(v) =>
        require(v.columns.contains(vertexCol),
          s"vertex column $vertexCol not in ${v.columns.mkString(", ")}")
        v.select(col(vertexCol).as("id")).distinct()
      case None =>
        edges.select(src.as("id")).union(edges.select(dst.as("id")))
          .where(col("id").isNotNull).distinct()
    }
    graft.llm.Dedup.convergeCanonicals(ids, pairs, "id", maxIters)
      .select(col("id"), col("canonical_id").as("component"))
  }

  /** Attach each vertex's component population: (id, component,
    * component_size). One keys-only aggregation + an equi-join on the
    * component label. */
  def withSizes(components: DataFrame): DataFrame = {
    require(Seq("id", "component").forall(components.columns.contains),
      "withSizes expects the (id, component) frame from run()")
    val sizes = components.groupBy(col("component"))
      .agg(count(lit(1)).as("component_size"))
    components.join(sizes, Seq("component"))
      .select(col("id"), col("component"), col("component_size"))
  }
}
