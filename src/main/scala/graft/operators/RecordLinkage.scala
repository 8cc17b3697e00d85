package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.GraftError
import graft.functions.StringSim

/** Record linkage (entity resolution): blocked fuzzy-match join — the
  * standard two-phase recipe (Fellegi-Sunter shape): a cheap BLOCKING
  * equi-join proposes candidate pairs, then a string-similarity score
  * over one or more field pairs keeps matches above a threshold. The
  * all-pairs comparison a naive fuzzy join implies is quadratic in the
  * table size; blocking makes the cost Σ |block_L|·|block_R| — the
  * user's blocking key is THE scale lever, and a hot block (every
  * record blocking to one key) would silently reintroduce the
  * quadratic, so oversized blocks are dropped via a loud, documented
  * cap instead (same posture as the LSH bucket caps and the
  * co-occurrence basket cap).
  *
  * 100 TB shape: per-block keys-only counts (narrow aggregations) gate
  * the join; the join itself is a plain equi-join on the block key —
  * shuffle on (block), AQE free to pick broadcast when one side is a
  * small reference table; scoring is a codegen'd projection (native
  * [[StringSim.JaroWinklerSim]]); no window, no global sort, no
  * driver-side state. */
object RecordLinkage {

  /** Fuzzy-join `left` and `right` on equality of `blockCol` (present
    * in both inputs), scoring candidates by the weighted mean
    * Jaro-Winkler similarity over `scoreCols` pairs; keep pairs with
    * score >= `threshold`. Output = all left columns + all right
    * columns + `match_score` — the two inputs must have disjoint
    * column names apart from `blockCol` (loud otherwise), and the
    * block column is kept once.
    *
    * Blocks where EITHER side exceeds `maxBlockSize` rows are dropped
    * entirely (both sides), keeping the worst-case pair count at
    * maxBlockSize² per block; choose a more selective blocking key
    * rather than raising the cap. */
  def fuzzyJoin(left: DataFrame, right: DataFrame, blockCol: String,
                scoreCols: Seq[(String, String, Double)],
                threshold: Double,
                maxBlockSize: Int = 10000): DataFrame = {
    require(scoreCols.nonEmpty, "fuzzyJoin needs at least one score pair")
    require(scoreCols.forall(_._3 > 0),
      "fuzzyJoin score weights must be positive")
    require(maxBlockSize >= 1, "maxBlockSize must be >= 1")
    val overlap = (left.columns.toSet - blockCol)
      .intersect(right.columns.toSet - blockCol)
    if (overlap.nonEmpty)
      throw GraftError.Configuration(
        "fuzzyJoin inputs must have disjoint column names apart from " +
          s"the block column; both carry ${overlap.toSeq.sorted.mkString(", ")}")
    scoreCols.foreach { case (l, r, _) =>
      if (!left.columns.contains(l))
        throw GraftError.Configuration(s"left score column $l missing")
      if (!right.columns.contains(r))
        throw GraftError.Configuration(s"right score column $r missing")
    }
    // keys-only per-block counts; blocks over the cap poison themselves
    def small(df: DataFrame): DataFrame =
      df.groupBy(col(blockCol)).agg(count(lit(1)).as("__bn"))
        .filter(col("__bn") <= maxBlockSize)
        .select(col(blockCol))
    val okBlocks = small(left).join(small(right), blockCol).select(col(blockCol))
    val totalW = scoreCols.map(_._3).sum
    val score = scoreCols.map { case (l, r, w) =>
        StringSim.jaro_winkler(col(l), col(r)) * lit(w)
      }.reduce(_ + _) / lit(totalW)
    left.join(okBlocks, blockCol)
      .join(right, blockCol)
      .withColumn("match_score", score)
      .filter(col("match_score") >= threshold)
  }

  /** Convenience single-field form. */
  def fuzzyJoin(left: DataFrame, right: DataFrame, blockCol: String,
                leftText: String, rightText: String,
                threshold: Double): DataFrame =
    fuzzyJoin(left, right, blockCol,
      Seq((leftText, rightText, 1.0)), threshold)

  /** Self-table fuzzy dedup: near-duplicate ROW PAIRS within one table
    * — fuzzyJoin of a table against itself with the standard `id_a <
    * id_b` half-matrix guard, so each unordered pair appears once and
    * self-pairs never. Output: (id_a, id_b, match_score). Same blocking
    * contract and per-block cap as [[fuzzyJoin]]; `scoreCols` name the
    * fields to compare against themselves. The string-similarity twin
    * of [[graft.llm.Dedup.minhashPairs]] for SHORT strings (names,
    * titles, addresses) where token shingles are too coarse. */
  def fuzzyDedup(df: DataFrame, idCol: String, blockCol: String,
                 scoreCols: Seq[(String, Double)], threshold: Double,
                 maxBlockSize: Int = 10000): DataFrame = {
    require(scoreCols.nonEmpty, "fuzzyDedup needs at least one score column")
    val left = df.select(col(idCol).as("id_a") +: col(blockCol) +:
      scoreCols.map { case (c, _) => col(c).as(s"__la_$c") }: _*)
    val right = df.select(col(idCol).as("id_b") +: col(blockCol) +:
      scoreCols.map { case (c, _) => col(c).as(s"__lb_$c") }: _*)
    fuzzyJoin(left, right, blockCol,
        scoreCols.map { case (c, w) => (s"__la_$c", s"__lb_$c", w) },
        threshold, maxBlockSize)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("match_score"))
  }

  /** Expose the raw scorer for ad-hoc use. */
  def similarity(a: Column, b: Column): Column = StringSim.jaro_winkler(a, b)

  /** Sorted-neighborhood candidate generation (Hernández & Stolfo
    * 1995): sort the table on a blocking KEY (name, normalized
    * address…) and pair each row with its `window − 1` successors —
    * the classic alternative to equality blocking when near-duplicates
    * disagree on every exact key but SORT NEAR each other ("Jon
    * Smith" / "John Smith"). Typos in the key's first characters still
    * escape any single pass; production runs compose several passes
    * over different keys and union the candidates.
    *
    * Scale shape: the global order comes from a RANGE exchange +
    * per-partition sorts (Spark's orderBy shape — parallel, not a
    * single reducer) with `zipWithIndex`'s lightweight count job
    * assigning offsets; neighbors then form by replicating each row
    * `window − 1` times and ONE equi-join on the rank — no window
    * function over the whole table, no theta-join. Candidate count is
    * exactly (n − w/2)·(w − 1): linear in the table, never quadratic.
    *
    * @return (id_a, id_b, key_a, key_b, rank_a, rank_b) with
    *         rank_b − rank_a in [1, window−1]; ties in the sort key
    *         order deterministically by id. */
  def sortedNeighborhood(df: DataFrame, idCol: String, sortKeyCol: String,
                         window: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(df.columns.contains(idCol) && df.columns.contains(sortKeyCol),
      s"need ($idCol, $sortKeyCol) in ${df.columns.mkString(", ")}")
    val base = df.select(col(idCol).as("id"), col(sortKeyCol).as("k"))
      .orderBy(col("k"), col("id"))
    val schema = org.apache.spark.sql.types.StructType(
      base.schema.fields :+ org.apache.spark.sql.types.StructField(
        "rank", org.apache.spark.sql.types.LongType, nullable = false))
    val ranked = base.sparkSession.createDataFrame(
      base.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row(r.get(0), r.get(1), i)
      }, schema)
    val a = ranked.select(col("id").as("id_a"), col("k").as("key_a"),
        col("rank").as("rank_a"))
      .withColumn("__j",
        explode(lit((1 until window).toArray)))
      .withColumn("rank_b", col("rank_a") + col("__j"))
      .drop("__j")
    val b = ranked.select(col("id").as("id_b"), col("k").as("key_b"),
      col("rank").as("rank_b"))
    a.join(b, Seq("rank_b"))
      .select(col("id_a"), col("id_b"), col("key_a"), col("key_b"),
        col("rank_a"), col("rank_b"))
  }
}
