package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-column data skipping —
  * the layout step behind Delta's OPTIMIZE ZORDER BY and Hudi's
  * space-filling-curve clustering (Morton 1966). Quantize each
  * clustering column to a 16-bit rank inside pinned [lo, hi] bounds,
  * interleave the bits into one long, then range-partition and sort
  * by that z-value before writing.
  *
  * Why it matters at 100 TB: parquet scans prune files/row-groups by
  * min/max stats. Sorting by ONE column makes its stats tight and
  * every other column's useless; the z-curve's locality makes every
  * written file cover a small hyper-rectangle of the combined filter
  * space, so selective filters on ANY clustered column (or both)
  * skip most files. ZOrderSpec measures exactly that: the summed
  * per-file bounding-box area collapses vs a random layout.
  *
  * The z-value is pure codegen'd Column arithmetic (comparisons,
  * floor, shifts, masks — 16·n terms with disjoint bits joined by
  * `+`), exactly SQL-replayable: the q_zorder oracle rebuilds the
  * identical term sum in DuckDB. Quantization uses DOUBLE division
  * with floor and clamps to [0, 65535]; values outside [lo, hi]
  * clamp to the curve's edge rather than erroring, so a stale stats
  * probe degrades locality, never correctness. */
object ZOrder {

  /** 16-bit quantized rank of `c` within [lo, hi] (degenerate range →
    * rank 0). Null ranks as 0 — nulls cluster at the curve origin. */
  private def quant(c: Column, lo: Column, hi: Column): Column =
    when(c.isNull || hi <= lo, lit(0L)).otherwise(
      least(lit(65535L), greatest(lit(0L),
        floor((c.cast("double") - lo.cast("double")) /
          (hi.cast("double") - lo.cast("double")) * 65535).cast("long"))))

  /** Morton z-value of 2–4 columns with pinned bounds. `specs` are
    * (column, lo, hi) triples; bit j of each 16-bit rank lands at
    * position j·n + i (column-major interleave). */
  def zvalue(specs: Seq[(Column, Column, Column)]): Column = {
    require(specs.size >= 2 && specs.size <= 4,
      s"zvalue interleaves 2-4 columns, got ${specs.size}")
    val n = specs.size
    val qs = specs.map { case (c, lo, hi) => quant(c, lo, hi) }
    (0 until 16).flatMap { bit =>
      qs.zipWithIndex.map { case (q, i) =>
        shiftleft(shiftright(q, bit).bitwiseAND(lit(1L)), bit * n + i)
      }
    }.reduce(_ + _) // disjoint bit positions: + ≡ bitwise OR
  }

  /** Cluster `df` for writing: probe per-column min/max in ONE
    * aggregation pass (the same stats pass OPTIMIZE ZORDER runs),
    * attach `zval`, range-partition into `numFiles` output tasks and
    * sort each — every output file then covers a contiguous z-range,
    * i.e. a small hyper-rectangle of the clustered columns. */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    cols.foreach(c => require(df.columns.contains(c), s"no such column '$c'"))
    require(!df.columns.contains("zval"), "'zval' is reserved by zorder")
    val bounds = df.agg(
      cols.flatMap(c => Seq(min(col(c)).as(s"__mn_$c"),
        max(col(c)).as(s"__mx_$c"))).head,
      cols.flatMap(c => Seq(min(col(c)).as(s"__mn_$c"),
        max(col(c)).as(s"__mx_$c"))).tail: _*).head()
    val specs = cols.map { c =>
      (col(c),
        lit(bounds.getAs[Any](s"__mn_$c")),
        lit(bounds.getAs[Any](s"__mx_$c")))
    }
    df.withColumn("zval", zvalue(specs))
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
  }
}
