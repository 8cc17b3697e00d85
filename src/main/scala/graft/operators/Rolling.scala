package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampType}

/** Trailing time-window features: for every row, aggregates over the
  * rows of the same key whose time falls in `[t - window, t]`
  * (inclusive both ends — SQL RANGE frame semantics). The classic
  * feature-engineering primitive ("events this user fired in the last
  * hour", "spend in the trailing 7 days") the reference engine cannot
  * express at all.
  *
  * Scale shape: ONE hash exchange on the keys and a per-partition sort
  * — Spark's RANGE window frame then advances two pointers over each
  * key's sorted run, so a trailing window of any width is O(rows) per
  * key, never O(rows × width). Times bucketize to microseconds
  * (`unix_micros`) so the frame bound is exact; numeric time columns
  * are used as-is. A heavily skewed key serializes its own sort — the
  * same caveat as any per-key window; salt upstream if one key is a
  * large fraction of the table. */
object Rolling {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  /** WindowSpec for a trailing window of `width` time units ending at
    * the current row (inclusive). Timestamp columns order by
    * microseconds — pass the width in microseconds. */
  def trailingSpec(df: DataFrame, keyCols: Seq[String], tsCol: String,
                   width: Long): WindowSpec = {
    require(keyCols.nonEmpty,
      "rolling features need at least one key column — a keyless window " +
        "moves the whole table onto one task")
    require(width > 0, s"window width must be positive, got $width")
    val ord = df.schema(tsCol).dataType match {
      case TimestampType => unix_micros(q(tsCol))
      case LongType | IntegerType => q(tsCol).cast("long")
      case other => throw new IllegalArgumentException(
        s"rolling time column must be timestamp or integral, got $other")
    }
    Window.partitionBy(keyCols.map(q): _*).orderBy(ord)
      .rangeBetween(-width, 0)
  }

  /** Attach trailing-window aggregate columns. Each entry maps the
    * ready WindowSpec to a named output column, e.g.
    * `w => count(lit(1)).over(w).as("n_1h")`. */
  def withTrailing(df: DataFrame, keyCols: Seq[String], tsCol: String,
                   width: Long)(aggs: (WindowSpec => Column)*): DataFrame = {
    val w = trailingSpec(df, keyCols, tsCol, width)
    df.select(df.columns.toSeq.map(q) ++ aggs.map(_(w)): _*)
  }
}
