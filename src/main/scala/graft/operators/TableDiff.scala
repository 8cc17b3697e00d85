package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot delta between two versions of a table keyed by `pk`: which
  * keys were `added`, `removed`, or `changed` between runs. This is the
  * operational core behind incremental loads — the reference stops at
  * `--skip-existing` (anti-join on new keys,
  * `/root/reference/src/engine.rs` transfer path); a real pipeline also
  * wants the removed/changed sides for auditing and CDC-style
  * downstream updates.
  *
  * Scale shape (`viaHash = true`, the default): each side is reduced to
  * `(pk, xxhash64(compare columns))` BEFORE the full-outer join, so the
  * wide payload never crosses the shuffle — per-row network cost is the
  * key plus 8 bytes regardless of table width. `viaHash = false`
  * compares the compare-column structs directly inside the join
  * (payload-wide shuffle) — the semantics every SQL engine can replay
  * (`IS DISTINCT FROM`), equality-pinned against the hash path in
  * units; a 64-bit collision making a changed row read as unchanged is
  * the documented, negligible (~2^-64 per key) trade of the fast path.
  *
  * Nulls: a null in a compare column is a VALUE (null → 3 is a change);
  * null-safe struct equality and xxhash64's null tag agree on this.
  * Unchanged keys are dropped — the result is the delta, not a full
  * annotated join. */
object TableDiff {

  private def colQ(c: String): Column =
    col("`" + c.replace("`", "``") + "`")

  /** One row per added/removed/changed key: pk columns +
    * `change_type`. `compareCols` defaults to all non-pk columns the
    * two sides share (columns only one side has are ignored — schema
    * evolution should not read as every row changed). */
  def diff(old: DataFrame, cur: DataFrame, pk: Seq[String],
           compareCols: Seq[String] = Nil,
           viaHash: Boolean = true): DataFrame = {
    require(pk.nonEmpty, "diff needs at least one primary-key column")
    pk.foreach { c =>
      require(old.columns.contains(c), s"old side misses pk column '$c'")
      require(cur.columns.contains(c), s"new side misses pk column '$c'")
    }
    val shared = cur.columns.filter(old.columns.contains).filterNot(pk.contains)
    val cmp =
      if (compareCols.nonEmpty) {
        compareCols.foreach { c =>
          require(old.columns.contains(c) && cur.columns.contains(c),
            s"compare column '$c' must exist on both sides")
        }
        compareCols
      } else shared.toSeq
    require(cmp.nonEmpty,
      "no compare columns: the two sides share no non-pk column")

    def keyed(df: DataFrame, tag: String): DataFrame = {
      // the null-flag tail matters: Spark's xxhash64 SKIPS null inputs
      // (hash unchanged), so without it (null, "a") and ("a", null)
      // would fingerprint identically
      val fp =
        if (viaHash)
          xxhash64(cmp.map(colQ) ++ cmp.map(colQ(_).isNull.cast("int")): _*)
        else struct(cmp.map(colQ): _*)
      df.select(pk.map(colQ) :+ fp.as(s"__fp_$tag") :+
        lit(true).as(s"__in_$tag"): _*)
    }
    val o = keyed(old, "old")
    val c = keyed(cur, "new")
    val joined = o.join(c, pk, "full_outer")
    val changeType =
      when(col("__in_old").isNull, lit("added"))
        .when(col("__in_new").isNull, lit("removed"))
        .when(!(col("__fp_old") <=> col("__fp_new")), lit("changed"))
    joined
      .select(pk.map(colQ) :+ changeType.as("change_type"): _*)
      .where(col("change_type").isNotNull)
  }

  /** [[diff]] plus the surviving side's payload — `cur`'s values for
    * added/changed keys, `old`'s for removed — over the columns BOTH
    * sides share (one side's extras can't union). Two extra
    * (pk + change_type) joins against the originals — the delta is
    * usually small, so both are broadcast-eligible under AQE. */
  def diffWithPayload(old: DataFrame, cur: DataFrame, pk: Seq[String],
                      compareCols: Seq[String] = Nil,
                      viaHash: Boolean = true): DataFrame = {
    val d = diff(old, cur, pk, compareCols, viaHash)
    val payload =
      cur.columns.filter(old.columns.contains).filterNot(pk.contains).toSeq
    val fromNew = d.where(col("change_type") =!= "removed")
      .join(cur.select((pk ++ payload).map(colQ): _*), pk, "inner")
    val fromOld = d.where(col("change_type") === "removed")
      .join(old.select((pk ++ payload).map(colQ): _*), pk, "inner")
    fromNew.unionByName(fromOld)
  }
}
