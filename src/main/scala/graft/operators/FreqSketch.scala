package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BloomExprs

/** Count-Min frequency sketch (Cormode & Muthukrishnan 2005) — the
  * frequency sibling of the KMV distinct sketch
  * ([[DistinctSketch]]): estimate per-key counts at a FIXED d×w cell
  * budget where the exact `groupBy(key).count` would shuffle the full
  * key universe (token frequencies over a 100 TB crawl). Store one
  * sketch per shard/day and roll ANY window up later — merge is
  * cell-wise addition, so it is ORDER-INDEPENDENT and exactly
  * SQL-replayable, unlike the classic order-sensitive summaries
  * (Misra-Gries, SpaceSaving) this library deliberately skips.
  *
  * The d row-hashes are the same portable Kirsch–Mitzenmacher family
  * as [[graft.llm.Bloom]] ([[BloomExprs.BloomKeyPositions]] with
  * k = depth, m = width): two 31/37 codepoint polynomials mod 2^31−1,
  * position_i = (h1 + i·h2) mod w — every step replays in DuckDB
  * BIGINT arithmetic, so the ORACLE reproduces the exact cell table
  * and every estimate, collisions included (`q_cms_freq` uses a
  * deliberately tiny w so collisions genuinely occur in-gate).
  *
  * Guarantees: estimate ≥ true count always (no underestimate — each
  * cell only ever adds mass); estimate ≤ true + ε·N with probability
  * 1−δ at w = ⌈e/ε⌉, d = ⌈ln(1/δ)⌉ (the standard sizing).
  *
  * Scale shape: build = one keys-only shuffle of (depth, pos) pairs
  * into at most d·w cells (map-side partial sums collapse hot keys
  * before the exchange); estimate = the probe keys' positions
  * equi-join the cell table (broadcast-sized by construction: d·w
  * rows) + a min per key. The probed corpus never shuffles. */
object FreqSketch {

  private def checkDims(w: Int, d: Int): Unit = {
    require(w >= 64, s"width must be >= 64 cells, got $w " +
      "(the portable position family needs m >= 64)")
    require(d >= 1 && d <= 64, s"depth must be in [1, 64], got $d")
  }

  /** The sketch as a (depth, pos, cnt) cell table — at most d·w rows.
    * `weight` defaults to 1 per row (plain counts); pass a column for
    * weighted frequencies. Merge sketches built with the SAME (w, d)
    * by unioning cell tables and re-summing ([[merge]]). */
  def build(df: DataFrame, key: Column, w: Int, d: Int,
            weight: Column = lit(1L)): DataFrame = {
    checkDims(w, d)
    df.select(posexplode(BloomExprs.keyPositions(key, w, d))
        .as(Seq("depth", "pos")), weight.cast("long").as("__w"))
      .groupBy(col("depth"), col("pos"))
      .agg(sum(col("__w")).as("cnt"))
  }

  /** Cell-wise addition — order-independent, so daily sketches roll
    * up into any window without rescanning history. All inputs must
    * share (w, d). */
  def merge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "merge needs at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy(col("depth"), col("pos"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Point estimates for `keys` (one row per probe key in `keyCol`):
    * min over the d cells each key hashes to; a never-seen cell is 0.
    * Output: the `keys` frame + `est`. */
  def estimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
               w: Int, d: Int): DataFrame = {
    checkDims(w, d)
    keys.select(col(keyCol),
        posexplode(BloomExprs.keyPositions(col(keyCol), w, d))
          .as(Seq("depth", "pos")))
      .join(broadcast(sketch), Seq("depth", "pos"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
