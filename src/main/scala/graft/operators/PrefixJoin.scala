package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Longest-prefix-match enrichment join — the CIDR / routing-table
  * lookup shape: each fact row carries an integer key (an IPv4
  * address, a phone number prefix space, a hierarchical account
  * code), the dimension table holds (prefixLen, prefix, payload…)
  * rows meaning "keys whose top `prefixLen` bits equal `prefix`",
  * and each fact must pick the MOST SPECIFIC (longest) matching
  * prefix. Classic uses: IP→geo/ASN enrichment of a crawl log before
  * per-region curation, telco rating tables, product-hierarchy
  * rollups.
  *
  * Naive formulations are a non-equi theta join (range-overlap per
  * row — quadratic) or an explode of every fact into all of its 32
  * prefixes (32× fact shuffle). This operator instead makes one
  * BROADCAST LEFT JOIN PER DISTINCT PREFIX LENGTH present in the
  * dimension (routing tables have few distinct lengths and are
  * small — the dim broadcasts, facts NEVER shuffle), probing lengths
  * in descending order and keeping the first hit via one coalesce
  * chain. The whole operator is a shuffle-free sequence of
  * BroadcastHashJoins over the fact scan; at 100 TB of facts the
  * plan reads facts once, broadcast-hashes a few-MB dim per length,
  * and never exchanges.
  *
  * Dim rows must be unique per (prefixLen, prefix) — enforced
  * loudly, because a duplicate would make the match nondeterministic
  * (and means the routing table itself is corrupt). */
object PrefixJoin {

  /** @param facts      fact frame; `keyCol` is an integral column
    * @param dim        dimension with `lenCol`, `prefixCol`, payloads
    * @param keyBits    total bits in the key space (e.g. 32 for IPv4)
    * @param payloadCols dim columns to carry onto matched facts
    * @return facts + payloads + `matched_len` (null when no prefix
    *         matches) */
  def lpmJoin(facts: DataFrame, dim: DataFrame, keyCol: String,
              lenCol: String, prefixCol: String,
              payloadCols: Seq[String], keyBits: Int = 32): DataFrame = {
    require(facts.columns.contains(keyCol), s"no such fact column '$keyCol'")
    (Seq(lenCol, prefixCol) ++ payloadCols).foreach(c =>
      require(dim.columns.contains(c), s"no such dim column '$c'"))
    require(keyBits >= 1 && keyBits <= 63, s"keyBits in [1,63], got $keyBits")
    payloadCols.foreach(c => require(!facts.columns.contains(c),
      s"payload column '$c' already exists on facts"))

    // distinct lengths: driver-side, bounded by keyBits by definition
    val lens = dim.select(col(lenCol).cast("int").as("l")).distinct()
      .collect().map(_.getInt(0)).sorted.reverse
    require(lens.nonEmpty, "dimension has no rows")
    require(lens.forall(l => l >= 1 && l <= keyBits),
      s"prefix lengths must lie in [1,$keyBits], got ${lens.mkString(",")}")

    // a duplicate (len, prefix) would match nondeterministically
    val dups = dim.groupBy(col(lenCol), col(prefixCol))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).limit(1).collect()
    require(dups.isEmpty,
      s"dim has duplicate (len, prefix) rows, e.g. ${dups.headOption}")

    // probe longest first; each join is a broadcast left join on the
    // fact key truncated to that length
    val out = lens.foldLeft(facts) { (acc, l) =>
      val d = broadcast(dim
        .filter(col(lenCol) === l)
        .select(col(prefixCol).as(s"__p_$l") +:
          payloadCols.map(c => col(c).as(s"__${c}_$l")): _*))
      acc.join(d,
        shiftright(col(keyCol), keyBits - l) === col(s"__p_$l"), "left")
    }

    // select the winning MATCH as one struct per length and coalesce
    // the structs, not the fields: a null payload inside the winning
    // (longest) match must stay null, never fall through to a shorter
    // prefix's value (same single-struct discipline as AsOfJoin)
    val best: Column = lens.map(l =>
      when(col(s"__p_$l").isNotNull,
        struct(lit(l).as("len") +:
          payloadCols.map(c => col(s"__${c}_$l").as(c)): _*)))
      .reduce((a, b) => coalesce(a, b))
    val withPayloads = payloadCols.foldLeft(
      out.withColumn("__best", best)
        .withColumn("matched_len", col("__best.len"))) { (acc, c) =>
      acc.withColumn(c, col(s"__best.$c"))
    }
    withPayloads.drop("__best").drop(
      lens.flatMap(l => s"__p_$l" +: payloadCols.map(c => s"__${c}_$l")): _*)
  }
}
