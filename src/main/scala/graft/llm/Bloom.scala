package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BloomExprs

/** Bloom-filter membership over a reference corpus — the fixed-budget
  * sibling of the exact probes: `InSortedLongSet` holds every key
  * (8 B/key, exact) and stops fitting somewhere past ~10^8 keys;
  * a Bloom filter holds ~10 bits/key at 1% false positives, so a
  * 10-billion-key crawl history probes from a 12 GiB (sharded) or
  * 1.2 GiB-per-1B-keys filter. No false negatives ever — the exact
  * use case is [[Dedup.againstReference]]'s prefilter ("don't pay the
  * hash join for rows provably never seen") and standalone
  * might-have-seen flagging where an FP merely re-checks a row.
  *
  * The hash family is the portable 31/37 codepoint-polynomial pair mod
  * 2^31−1 with Kirsch–Mitzenmacher position derivation
  * ([[BloomExprs]]), so the DuckDB oracle replays the EXACT bit
  * pattern — false positives included (`q_bloom_dedup`).
  *
  * Scale shape: build = one narrow aggregation whose partials are each
  * ONE m/8-byte blob (size m for the heap: 32 map partials of a
  * 256 MiB filter = 8 GiB in flight — coalesce the build input when m
  * is huge); probe = the blob as a plan literal (single copy per task
  * binary) + a codegen'd bit test per row — NO join, no shuffle of
  * the probed corpus (a joined blob column would copy m/8 bytes into
  * every row; measured 400× slower). Past the 256 MiB single-blob
  * cap, [[buildSharded]] splits the key space by a cheap key hash
  * into independently-aggregated filters and [[probeSharded]] probes
  * them through one broadcast HANDLE — the corpus never shuffles. */
object Bloom {

  /** (mBits, k) for `n` keys at false-positive rate `fpp` — the
    * standard m = −n·lnp/ln²2, k = (m/n)·ln2 sizing. */
  def sizeFor(n: Long, fpp: Double): (Int, Int) = {
    require(n > 0, s"n must be positive, got $n")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val m = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2)))
    require(m <= Int.MaxValue.toLong - 63,
      s"sizeFor($n, $fpp) needs ${m.toLong} bits > the 256 MiB " +
        "single-blob cap — shard the build (Bloom.buildSharded)")
    val mBits = math.max(64L, m.toLong).toInt
    val k = math.max(1, math.round(mBits.toDouble / n * math.log(2)).toInt)
    (mBits, math.min(k, 64))
  }

  /** One-row (bloom binary) frame over `key` of `ref`. */
  def build(ref: DataFrame, key: Column, mBits: Int, k: Int): DataFrame =
    ref.select(BloomExprs.keyPositions(key, mBits, k).as("__pos"))
      .agg(BloomExprs.orAgg(col("__pos"), mBits).as("bloom"))

  /** The single blob itself, collected to the driver — for baking
    * into a per-row LITERAL test where a broadcast join is awkward
    * (streaming plans). Bounded by construction at m/8 bytes; capped
    * LOUDLY at 64 MiB because the blob rides the serialized plan of
    * every micro-batch — size bigger references with the broadcast
    * [[probe]] or [[probeSharded]] batch-side. */
  def buildLocal(ref: DataFrame, key: Column, mBits: Int, k: Int): Array[Byte] = {
    require(mBits <= 64L * 1024 * 1024 * 8,
      s"buildLocal: $mBits bits exceeds the 64 MiB plan-literal cap — " +
        "use the broadcast probe or shard the filter (Bloom.probeSharded)")
    build(ref, key, mBits, k).head.getAs[Array[Byte]]("bloom")
  }

  /** Adds `flagName` (might-have-seen) to every `batch` row by testing
    * `key` against the single-blob filter in `bloomDf` (one row, column
    * `bloom`). The blob collects to the driver and rides the plan as a
    * LITERAL (one copy per task binary) — a codegen'd per-row bit test,
    * no join, no shuffle. Deliberately NOT a broadcast join: a joined
    * blob column copies m/8 bytes into EVERY probed row (measured:
    * 28 s for 2M rows against a 1.2 MB blob — 400× slower than this
    * shape). Driver + plan footprint = m/8 bytes, bounded by the
    * 256 MiB single-blob cap. */
  def probe(batch: DataFrame, bloomDf: DataFrame, key: Column,
            mBits: Int, k: Int, flagName: String = "might_seen"): DataFrame = {
    val blob = bloomDf.head.getAs[Array[Byte]]("bloom")
    require(blob.length == ((mBits + 63) / 64) * 8,
      s"probe: filter blob is ${blob.length} B but mBits=$mBits expects " +
        s"${((mBits + 63) / 64) * 8} B — probe and build sized differently")
    batch.withColumn(flagName,
      BloomExprs.test(lit(blob), BloomExprs.keyPositions(key, mBits, k)))
  }

  /** Shard id for a key — xxhash64-based (engine-side only; the
    * oracle-replayable part is the per-shard filter, not the routing). */
  private def shardOf(key: Column, shards: Int): Column =
    pmod(xxhash64(key), lit(shards.toLong)).cast("int")

  /** `shards` independent filters as (shard, bloom) rows — the path
    * past the 256 MiB single-blob cap: total capacity scales linearly
    * in shard count while each blob stays broadcast/join sized. */
  def buildSharded(ref: DataFrame, key: Column, shards: Int,
                   mBitsPerShard: Int, k: Int): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    ref.select(shardOf(key, shards).as("shard"),
        BloomExprs.keyPositions(key, mBitsPerShard, k).as("__pos"))
      .groupBy(col("shard"))
      .agg(BloomExprs.orAgg(col("__pos"), mBitsPerShard).as("bloom"))
  }

  /** Sharded probe: the (shard, blob) rows collect to the driver —
    * bounded at shards × mBitsPerShard/8, i.e. the full filter set,
    * which ANY bloom probe ultimately consults — and ship as ONE Spark
    * broadcast whose HANDLE rides the per-row test expression:
    * executors fetch the blob array once (torrent), rows never copy
    * filter bytes, the probed corpus never shuffles or joins. (The
    * obvious equi-join formulation copies m/8 bytes into every probed
    * row — measured 400× slower; see [[probe]].) Sharding therefore
    * buys BUILD scalability (no agg buffer or blob above the 256 MiB
    * cap, shards aggregate in parallel) and probe-side memory that
    * arrives as S independent fetches; a filter set beyond executor
    * memory needs a probe-side key partition FIRST (filter the corpus
    * by shard range, probe each range against its sub-set). A shard
    * with no reference keys has no blob → never seen → false. */
  def probeSharded(batch: DataFrame, blooms: DataFrame,
                   key: Column, shards: Int, mBitsPerShard: Int, k: Int,
                   flagName: String = "might_seen"): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val arr = new Array[Array[Byte]](shards)
    blooms.select(col("shard"), col("bloom")).collect().foreach { r =>
      val s = r.getInt(0)
      require(s >= 0 && s < shards,
        s"probeSharded: blob for shard $s outside [0, $shards) — " +
          "probe and build used different shard counts")
      arr(s) = r.getAs[Array[Byte]](1)
    }
    arr.filter(_ != null).foreach(b => require(
      b.length == ((mBitsPerShard + 63) / 64) * 8,
      s"probeSharded: blob of ${b.length} B vs mBitsPerShard=" +
        s"$mBitsPerShard — probe and build sized differently"))
    val bc = batch.sparkSession.sparkContext.broadcast(arr)
    batch.withColumn(flagName, BloomExprs.testSharded(bc,
      shardOf(key, shards),
      BloomExprs.keyPositions(key, mBitsPerShard, k)))
  }
}
