package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Random sampling (`df.sample`) is the wrong tool for corpus curation:
  * it is not reproducible across runs/partitionings, not invertible
  * ("give me the OTHER 90%"), and not joinable (two tables sampled
  * independently don't line up). The standard fix is hash-based
  * sampling: a row is kept iff a uniform hash of its stable id falls
  * under the per-stratum threshold. Same id → same decision, on any
  * cluster, at any scale, forever.
  *
  * Scale shape: a pure filter projection — no shuffle, no sample
  * collection, predicate evaluated inside whole-stage codegen next to
  * the scan, so column pruning and partition pruning are untouched.
  */
object Sampling {

  /** Threshold resolution: fractions are mapped to integer bucket
    * thresholds out of `Buckets`, so the kept set is exact-integer
    * defined (no float-compare drift between engines). */
  val Buckets = 1000000L

  private[llm] val P = 1000000007L // prime modulus
  private[llm] val K = 2654435761L // Knuth's 2^32 / phi multiplier

  /** Default bucket: xxhash64 — best mixing, one codegen'd call. */
  def bucket(id: Column): Column = pmod(xxhash64(id), lit(Buckets))

  /** Seeded variant of [[bucket]] for any id type: the seed enters
    * xxhash64 as a leading hashed value, never as arithmetic on the
    * id — `bucket(id + seed)` contracts on numeric ids (a string id
    * throws a raw CAST under ANSI, or silently hashes NULL without
    * it, collapsing every row into one bucket). */
  def bucketSeeded(seed: Long)(id: Column): Column =
    pmod(xxhash64(lit(seed), id), lit(Buckets))

  /** The portable seeded hash (`portableBucket(id + seed)`) adds the
    * seed ARITHMETICALLY so any SQL engine can replay it — which
    * contracts on an integral id. A string id would throw a raw
    * CAST_INVALID_INPUT under ANSI (Spark 4 default) or, with ANSI
    * off, silently hash NULL so every row gets the same key. Fail
    * with a typed configuration error instead of either. */
  private[graft] def requireIntegralId(df: DataFrame, idCol: String,
                                       op: String): Unit = {
    require(df.columns.contains(idCol), s"no such column '$idCol'")
    import org.apache.spark.sql.types._
    val t = df.schema(idCol).dataType
    val integral = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (!integral)
      throw graft.core.GraftError.Configuration(
        s"$op seeds the SQL-portable hash arithmetically, which needs an " +
          s"integer id column; '$idCol' is ${t.simpleString} — cast it, or " +
          "use an xxhash64-bucket sampler (Sampling.bucketSeeded) for " +
          "string ids")
  }

  /** Portable bucket: Knuth multiplicative hash `((id mod P) * K) mod P
    * mod Buckets`. Weaker mixing than xxhash64 but expressible in ANY
    * SQL engine (the DuckDB oracle can't evaluate xxhash64), and
    * overflow-safe for every long id: (P-1) * K < 2^63. Uniform enough
    * for sampling sequential or hashed ids. */
  def portableBucket(id: Column): Column =
    pmod(pmod(pmod(id.cast("long"), lit(P)) * lit(K), lit(P)), lit(Buckets))

  /** Keep each row of stratum `strataCol = k` with probability
    * `fractions(k)` (else `defaultFraction`), decided by `bucketFn` of
    * the row's stable id. Deterministic, stratified, shuffle-free.
    *
    * @param bucketFn [[bucket]] (default, xxhash64) or
    *                 [[portableBucket]] (SQL-oracle-reproducible)
    */
  def stratified(df: DataFrame, strataCol: String, idCol: String,
                 fractions: Map[String, Double],
                 defaultFraction: Double = 0.0,
                 bucketFn: Column => Column = bucket): DataFrame = {
    require((fractions.values.toSeq :+ defaultFraction).forall(f =>
      f >= 0.0 && f <= 1.0), s"fractions must be in [0,1]: $fractions")
    // integer thresholds; deterministic when-chain in sorted key order
    val threshold = fractions.toSeq.sortBy(_._1).foldLeft(
      lit(math.round(defaultFraction * Buckets))) { case (acc, (k, f)) =>
      when(col(strataCol) === lit(k), lit(math.round(f * Buckets))).otherwise(acc)
    }
    df.filter(bucketFn(col(idCol)) < threshold)
  }

  /** Unstratified deterministic sample: keep `fraction` of rows by id. */
  def byHash(df: DataFrame, idCol: String, fraction: Double,
             bucketFn: Column => Column = bucket): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction in [0,1]: $fraction")
    df.filter(bucketFn(col(idCol)) < lit(math.round(fraction * Buckets)))
  }

  /** The complement of [[byHash]]/[[stratified]] with the same
    * threshold(s): every row lands in exactly one of sample/rest —
    * the "held-out split" a training pipeline carves eval sets with. */
  def byHashComplement(df: DataFrame, idCol: String, fraction: Double,
                       bucketFn: Column => Column = bucket): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction in [0,1]: $fraction")
    df.filter(bucketFn(col(idCol)) >= lit(math.round(fraction * Buckets)))
  }

  /** Deterministic TRAIN/VAL/TEST (or any n-way) split assignment: the
    * `[0, Buckets)` hash range is carved into contiguous sub-ranges
    * proportional to `fractions` (in the map's sorted-key order, so
    * the layout is reproducible), and every row gets the label of the
    * range its id-bucket falls in. Fractions must sum to 1 (±1e-9):
    * every row gets exactly one label — the partition property that
    * makes the split leak-proof, and the same id keeps the same label
    * on any cluster, at any scale, forever. Shuffle-free projection.
    *
    * Versioning note: cuts derive from the CUMULATIVE-rounded fractions
    * (see below). Before this library's 0.6 line each fraction was
    * rounded independently, so for some fraction maps an interior
    * boundary sits one bucket away from where the old rule put it — a
    * handful of rows near each cut carry a different label across
    * versions. Determinism holds within a version: same ids + same
    * fractions + same library ⇒ same labels, everywhere. Pin the
    * library version if a split assignment must be replayed bit-exact. */
  def assignSplits(df: DataFrame, idCol: String,
                   fractions: Map[String, Double],
                   bucketFn: Column => Column = bucket): DataFrame = {
    require(fractions.nonEmpty, "assignSplits needs at least one split")
    require(fractions.values.forall(_ > 0.0), s"fractions must be > 0: $fractions")
    Guards.requireFreshColumns(df, Seq("split"), "Sampling.assignSplits")
    val sum = fractions.values.sum
    require(math.abs(sum - 1.0) < 1e-9,
      s"fractions must sum to 1 (every row gets exactly one label), got $sum")
    // cumulative integer thresholds in sorted key order; cuts derive
    // from round(CUMULATIVE fraction · Buckets) — rounding each
    // fraction independently would let per-split ±0.5 errors accumulate
    // and drift interior boundaries by whole buckets. The last range is
    // open-ended so rounding can never orphan the top bucket.
    val sorted = fractions.toSeq.sortBy(_._1)
    val cuts = sorted.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => math.round(c * Buckets))
    // a positive fraction below ~0.5/Buckets rounds to a zero-width
    // range — that split would silently receive no rows; be loud instead
    cuts.zip(0L +: cuts.init).zip(sorted).foreach { case ((hi, lo), (name, f)) =>
      require(hi - lo >= 1L,
        s"split '$name' (fraction $f) rounds to a zero-width bucket range " +
          s"out of $Buckets — raise the fraction or use fewer splits")
    }
    val b = bucketFn(col(idCol))
    val label = sorted.init.zip(cuts.init).foldRight(
      lit(sorted.last._1): Column) { case (((name, _), cut), acc) =>
      when(b < cut, lit(name)).otherwise(acc)
    }
    df.withColumn("split", label)
  }

  /** Downsample to a target domain MIXTURE: the kept corpus has
    * composition `weights` (up to hash-bucket granularity), as large as
    * achievable without upsampling any domain. This is the "rebalance
    * web/code/wiki to the training recipe's proportions" step of
    * pre-training data prep.
    *
    * Derivation: with per-domain counts n_d, the largest total T whose
    * share w_d·T every domain can still supply is
    * T* = min_d(n_d / w_d); each domain then keeps fraction
    * `w_d * tStar / n_d` of its rows (the binding domain keeps everything).
    * Domains absent from `weights` are dropped.
    *
    * Scale shape: ONE tiny aggregation job (|domains| rows to the
    * driver) to learn the counts, then the same shuffle-free
    * hash-threshold filter as [[stratified]]. Deterministic: same
    * corpus + weights + seed column ⇒ same kept set, on any cluster. */
  def mixture(df: DataFrame, domainCol: String, idCol: String,
              weights: Map[String, Double],
              bucketFn: Column => Column = bucket): DataFrame = {
    require(weights.nonEmpty, "mixture needs at least one domain weight")
    require(weights.values.forall(_ > 0.0), s"weights must be > 0: $weights")
    // the weight keys are strings, so compare on a string VIEW of the
    // domain column — an int category-code column then matches "3"
    // instead of ClassCastException-ing at the collect (and the isin
    // below never trips ANSI cross-type comparison rules)
    val domainStr = col(domainCol).cast("string")
    val counts: Map[String, Long] = df
      .filter(domainStr.isin(weights.keys.toSeq: _*))
      .groupBy(domainStr.as("__domain")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a weighted domain with ZERO rows must be loud: silently renorming
    // over the present domains would return a corpus arbitrarily far
    // from the requested composition (e.g. 100% en for a 50/50 ask)
    val missing = weights.keySet -- counts.keySet
    require(missing.isEmpty,
      s"weighted domain(s) have no rows: ${missing.toSeq.sorted.mkString(", ")} " +
        s"— drop them from weights or fix the corpus")
    mixtureFilter(df, domainStr, idCol, counts, weights, bucketFn)
  }

  /** The T*-threshold core shared by [[mixture]] and
    * [[diversitySample]]: given per-domain counts and target weights,
    * keep fraction `w_d * T* / n_d` of each domain (T* = min n_d/w_d,
    * the largest achievable total), decided by the deterministic
    * hash-bucket of the id. */
  private def mixtureFilter(df: DataFrame, domainStr: Column, idCol: String,
                            counts: Map[String, Long],
                            weights: Map[String, Double],
                            bucketFn: Column => Column): DataFrame = {
    val tStar = counts.map { case (d, n) => n.toDouble / weights(d) }.min
    // per-domain integer thresholds out of Buckets; the binding domain's
    // fraction is 1.0 so it keeps every bucket
    val thresholds = counts.map { case (d, n) =>
      d -> math.round(weights(d) * tStar / n * Buckets)
    }
    val thrCol = thresholds.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (d, t)) => when(domainStr === lit(d), lit(t)).otherwise(acc)
    }
    df.filter(bucketFn(col(idCol)) < thrCol)
  }

  /** Temperature-based domain rebalancing (the multilingual-sampling
    * rule of XLM-R / mC4: p_d ∝ n_d^alpha): instead of pinning target
    * fractions like [[mixture]], DERIVE them from the observed counts
    * with exponent `alpha` in (0, 1] — alpha 1 keeps the natural
    * distribution, smaller alpha flattens it so low-resource domains
    * are boosted relative to the head. Each domain keeps
    * q_d = min(1, targetTotal · p_d / n_d) of its rows (no
    * upsampling), decided by the same deterministic hash-bucket
    * threshold as every sampler here.
    *
    * Scale shape: identical to [[mixture]] — ONE |domains|-row
    * aggregation to the driver, then a shuffle-free codegen filter. */
  def temperatureSample(df: DataFrame, domainCol: String, idCol: String,
                        alpha: Double, targetTotal: Long,
                        bucketFn: Column => Column = bucket): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1], got $alpha")
    require(targetTotal > 0, s"targetTotal must be > 0, got $targetTotal")
    val domainStr = col(domainCol).cast("string")
    val counts: Map[String, Long] = df
      .filter(domainStr.isNotNull)
      .groupBy(domainStr.as("__domain")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "temperatureSample needs a non-empty corpus")
    val powSum = counts.values.map(n => math.pow(n.toDouble, alpha)).sum
    val thresholds = counts.map { case (d, n) =>
      val p = math.pow(n.toDouble, alpha) / powSum
      d -> math.round(math.min(1.0, targetTotal * p / n) * Buckets)
    }
    val thrCol = thresholds.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (d, t)) => when(domainStr === lit(d), lit(t)).otherwise(acc)
    }
    df.filter(bucketFn(col(idCol)) < thrCol)
  }

  /** Diversity-balanced downsampling over embedding-space cells: assign
    * each row to its nearest centroid (pre-trained `cents` — train once
    * with [[Similarity.IvfIndex.centroids]], assign often; the codegen'd
    * one-pass projection) and keep an EQUAL number of rows from every
    * OBSERVED cell — the "don't let one semantic mode dominate the
    * subset" step (the sampling face of the SemDeDup clustering; cf.
    * cluster-balanced selection in Abbas et al. 2023). The kept total is
    * k·min_cell(n) — the sparsest observed cell binds, every cell
    * contributes that many (to hash-bucket granularity), nothing
    * upsamples.
    *
    * Scale shape: ONE bounded aggregation (≤ |cents| rows to the
    * driver) to learn cell counts, then the same shuffle-free
    * hash-threshold filter as every sampler here. The cell column never
    * materializes in the output. Deterministic: same (corpus, cents,
    * bucketFn) ⇒ same kept set, on any cluster. */
  def diversitySample(df: DataFrame, idCol: String, vecCol: String,
                      cents: Array[Seq[Double]],
                      bucketFn: Column => Column = bucket): DataFrame = {
    require(cents.nonEmpty, "diversitySample needs at least one centroid")
    val cell = graft.functions.VectorExprs
      .nearest_centroid(col(vecCol), cents.toIndexedSeq).cast("string")
    val counts: Map[String, Long] = df
      .groupBy(cell.as("__cell")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) df // empty corpus: nothing to balance
    else {
      val w = counts.keys.map(_ -> 1.0 / counts.size).toMap
      mixtureFilter(df, cell, idCol, counts, w, bucketFn)
    }
  }

  /** Weighted sampling WITHOUT replacement, exactly k rows, by the
    * Efraimidis–Spirakis one-pass rule (Inf. Proc. Letters 2006):
    * each row gets key `u^(1/w)` for a uniform u derived from its id,
    * and the k largest keys are the sample — inclusion probability
    * proportional to weight, no replacement, no sequential scan. The
    * quality-weighted subset selection step of corpus curation
    * ("prefer high-score documents but keep diversity").
    *
    * Deterministic: u = (portableBucket(id + seed) + 0.5) / Buckets —
    * the +0.5 keeps u strictly inside (0,1) so the pow is finite —
    * and ties (same key) break by id, so any engine replays the exact
    * set. Rows with non-positive or null weight have zero inclusion
    * probability by definition and are excluded.
    *
    * Scale shape: a shuffle-free key projection + ONE top-k
    * (TakeOrderedAndProject — per-partition heaps, no global sort).
    * k rows land on the driver side of the limit, so keep k bounded
    * (a training subset selection, not a 100 TB copy). */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, seed: Long = 42L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    Seq(idCol, weightCol).foreach(c =>
      require(df.columns.contains(c), s"no such column '$c'"))
    requireIntegralId(df, idCol, "Sampling.weightedSample")
    Guards.requireFreshColumns(df, Seq("__es_key"), "Sampling.weightedSample")
    val u = (portableBucket(col(idCol) + lit(seed)) + lit(0.5)) /
      lit(Buckets.toDouble)
    val key = pow(u, lit(1.0) / col(weightCol).cast("double"))
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__es_key", key)
      .orderBy(col("__es_key").desc, col(idCol))
      .limit(k)
      .drop("__es_key")
  }

  /** Per-group [[weightedSample]]: at most `k` rows from EVERY group,
    * inclusion odds proportional to weight within the group — the
    * "best k documents per domain, quality-weighted but not
    * deterministic-argmax" selection. Same E-S key rule; the top-k
    * runs per group as ONE hash-partitioned window (groups select in
    * parallel — no driver-side limit, so unlike [[weightedSample]]
    * this shape scales with the number of groups). */
  def weightedSamplePerGroup(df: DataFrame, groupCols: Seq[String],
                             idCol: String, weightCol: String, k: Int,
                             seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    (groupCols ++ Seq(idCol, weightCol)).foreach(c =>
      require(df.columns.contains(c), s"no such column '$c'"))
    requireIntegralId(df, idCol, "Sampling.weightedSamplePerGroup")
    Guards.requireFreshColumns(df, Seq("__es_key", "__es_rn"),
      "Sampling.weightedSamplePerGroup")
    val u = (portableBucket(col(idCol) + lit(seed)) + lit(0.5)) /
      lit(Buckets.toDouble)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__es_key").desc, col(idCol))
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__es_key", pow(u, lit(1.0) / col(weightCol).cast("double")))
      .withColumn("__es_rn", row_number().over(w))
      .filter(col("__es_rn") <= k)
      .drop("__es_key", "__es_rn")
  }

  /** Deterministic token-budget cut: "give me ~`budget` tokens of this
    * corpus, reproducibly". Rows are taken in deterministic shuffle
    * order (seeded portable hash of the id — decorrelated from ingest
    * order, bit-identical across reruns) until the budget is reached.
    *
    * There is NO global running sum — that is a single-partition
    * scalability wall. The budget splits evenly over `shards`
    * hash-shards and each shard keeps its prefix while its OWN running
    * sum stays within budget/shards: one hash exchange + per-shard
    * sorts (the exact shape of [[Shuffling.deterministicShuffle]]),
    * every shard cut in parallel. Kept tokens never exceed the budget;
    * the undershoot is bounded by shards × max-row-tokens (each shard
    * strands less than one boundary row) — at any real corpus scale
    * that is noise against the budget. Deterministic: same
    * (ids, tokens, budget, shards, seed) → same kept set, any cluster.
    *
    * A fraction-based sample cannot do this job: token counts per row
    * vary, so a row-fraction only hits a token target in expectation;
    * this takes an exact deterministic prefix instead. */
  def tokenBudget(df: DataFrame, idCol: String, tokensCol: String,
                  budget: Long, shards: Int = 64,
                  seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shards >= 1, s"shards must be >= 1: $shards")
    require(budget / shards >= 1,
      s"budget $budget splits below 1 token per shard over $shards shards")
    requireIntegralId(df, idCol, "Sampling.tokenBudget")
    Guards.requireFreshColumns(df, Seq("__tb_key", "__tb_shard", "__tb_cum"),
      "Sampling.tokenBudget")
    val perShard = budget / shards
    val w = Window.partitionBy(col("__tb_shard"))
      .orderBy(col("__tb_key"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__tb_key", Shuffling.shuffleKey(col(idCol), seed))
      .withColumn("__tb_shard", pmod(col("__tb_key"), lit(shards.toLong)))
      .withColumn("__tb_cum", sum(col(tokensCol).cast("long")).over(w))
      .filter(col("__tb_cum") <= lit(perShard))
      .drop("__tb_key", "__tb_shard", "__tb_cum")
  }

  /** Per-group quota: keep at most `n` rows of every group,
    * deterministically chosen by the portable Knuth hash of the stable
    * id (ties by id) — "at most N documents per domain" without any
    * group ever exceeding its cap, on any cluster, in any run.
    *
    * Scale shape: the picks come from the native bounded top-k
    * aggregate over (hash, id) KEYS — 2n longs per group at every
    * stage, map-side reduced — and the kept ids re-attach as a
    * LEFT SEMI join. With |groups|×n picks under the broadcast
    * threshold that join broadcasts, so the table itself (the wide
    * text columns) never shuffles at all. The broadcast is FORCED:
    * size the quota × group-count product to executor memory (a
    * million groups × n=100 is 800 MB of longs — shard the corpus
    * first at that scale). Ids must be globally unique (the semi join
    * keys on id alone). */
  def quotaPerGroup(df: DataFrame, groupCols: Seq[String], idCol: String,
                    n: Int): DataFrame = {
    require(groupCols.nonEmpty, "quotaPerGroup needs group columns")
    require(n >= 1, s"quota must be >= 1, got $n")
    val idQ = col("`" + idCol.replace("`", "``") + "`")
    val hashKey = pmod(pmod(idQ.cast("long"), lit(P)) * lit(K), lit(P))
    val picks = df
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.TopK.top_k_longs(hashKey, idQ, n, desc = false)
        .as("__picks"))
      .select(explode(col("__picks")("id")).as(idCol))
    df.join(broadcast(picks), Seq(idCol), "left_semi")
  }

  /** Proportional stratified sampling with LARGEST-REMAINDER
    * allocation (Hamilton's method): exactly `k` rows total, each
    * stratum's share proportional to its population — the survey /
    * eval-set shape where "10% from every language" must also sum to
    * an exact budget. Per-stratum fractions ([[stratified]]) cannot
    * hit an exact total; per-stratum fixed quotas ([[quotaPerGroup]])
    * ignore proportions; this does both.
    *
    * Determinism — the whole allocation is INTEGER arithmetic: base
    * quota floor(k·n_i/N) via integer division, the k − Σbase leftover
    * seats go to the largest remainders (k·n_i mod N), ties by stratum
    * ascending — so any engine allocates identically; the within-
    * stratum picks order by the portable hash (ties by id), the
    * sampling family's standard deterministic order.
    *
    * Scale shape: ONE keys-only size aggregation; the allocation frame
    * is |strata|-sized and broadcasts; picks are a per-stratum window
    * rank over (hash, id) — the bounded per-group sort every grouped
    * top-k here pays. k > N degrades gracefully to everything.
    *
    * @return the sampled rows (full columns, semi-joined by id) */
  def stratifiedExactK(df: DataFrame, stratumCol: String, idCol: String,
                       k: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(df.columns.contains(stratumCol), s"no such column '$stratumCol'")
    require(df.columns.contains(idCol), s"no such column '$idCol'")
    val idQ = col("`" + idCol.replace("`", "``") + "`")
    val sizes = df.groupBy(col(stratumCol).as("__st"))
      .agg(count(lit(1)).as("__n"))
    // the allocation lives entirely inside the |strata|-sized frame:
    // N and the leftover come from whole-frame window sums (no join
    // back to the base lineage — a sizes×aggregate-of-sizes cross join
    // trips Catalyst's self-join attribute dedup; and the total is
    // __tot, NOT __N — Spark resolves identifiers case-insensitively,
    // so __N would silently shadow __n and every quota would read
    // n/n = 1). INTEGER division
    // (div), not double — n·k can exceed 2^53 at corpus scale and a
    // float quotient would misallocate seats; contract: k·N fits a
    // long (k is a sample budget, it does).
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val wRem = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rem").desc, col("__st").asc)
    val alloc = sizes
      .withColumn("__tot", sum(col("__n")).over(wAll))
      .withColumn("__base", expr(s"(__n * $k) div __tot"))
      .withColumn("__rem", pmod(col("__n") * k, col("__tot")))
      .withColumn("__leftover", lit(k) - sum(col("__base")).over(wAll))
      .withColumn("__alloc",
        col("__base") + when(row_number().over(wRem) <=
          greatest(col("__leftover"), lit(0L)), 1L).otherwise(0L))
      .select(col("__st"), col("__alloc"))
    val wPick = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(portableBucket(idQ).asc, idQ.asc)
    df.withColumn("__pr", row_number().over(wPick))
      .join(broadcast(alloc), col(stratumCol) === col("__st"))
      .where(col("__pr") <= col("__alloc"))
      .drop("__pr", "__st", "__alloc")
  }
}
