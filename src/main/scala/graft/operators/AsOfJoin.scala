package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of join: for every left row, attach the single right row with the
  * greatest right-time ≤ the left row's time (backward, the default) or
  * the smallest right-time ≥ it (forward), matching on equi keys. The
  * reference has no time-series join at all (`/root/reference/src/`
  * transfers are row-independent); this is the canonical operator a
  * feature/training pipeline needs to align events with the latest
  * preceding dimension snapshot, price tick, or model version.
  *
  * Scale shape: the naive formulations are a range join (quadratic
  * per key) or a per-left-row MAX subquery (a second shuffle of the
  * whole left side plus a re-join). This implementation is the
  * sort-merge as-of in ONE exchange: tag each side, union by name,
  * hash-partition on the keys, sort within partitions by
  * (time, side-tag), and carry the latest right payload forward with
  * `last(_, ignoreNulls)` over a running window. Both sides cross the
  * network exactly once, there is no join node at all, and the plan
  * holds at any left/right ratio — the shape pandas' `merge_asof` and
  * kdb's `aj` use, expressed through Catalyst.
  *
  * Tie + determinism contract: a right row at exactly the left time
  * matches (the side tag sorts right rows first within a timestamp).
  * Among right rows tied on (keys, time), the one sorting LAST by the
  * carried columns (ascending) wins — the sort order is total over
  * right rows, so results never depend on partitioning or scheduling.
  * Left rows tied on (keys, time) all see the same set of right rows,
  * so their results are identical and order between them is
  * irrelevant.
  *
  * Row semantics: the matched right row is carried as ONE struct, so a
  * NULL in a carried column of the matched row stays NULL in the output
  * (it is never forward-filled from an older right row), and the
  * tolerance test applies to the time of the row the values actually
  * came from. Null equi-keys follow SQL join semantics: a right row
  * with a null key never matches; a left row with a null key survives
  * with null carried columns. */
object AsOfJoin {

  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  /** Left-join semantics: every left row survives; carried columns are
    * null when no right row qualifies (or the match falls outside
    * `tolerance`).
    *
    * @param on            equi-key column names, present on both sides
    * @param leftTime      left ordering column (timestamp or numeric)
    * @param rightTime     right ordering column, same type as leftTime
    * @param carry         right columns to attach; default = all right
    *                      columns except keys and rightTime. Names must
    *                      not collide with left columns.
    * @param matchedTimeAs when set, also attach the matched right
    *                      row's time under this name
    * @param tolerance     max allowed |leftTime − rightTime|; e.g.
    *                      `expr("INTERVAL 1 HOUR")` for timestamps or
    *                      `lit(30)` for numeric times. Matches farther
    *                      away read as no-match (carried columns null).
    * @param direction     "backward" (latest right ≤ left) or
    *                      "forward" (earliest right ≥ left)
    */
  def asof(left: DataFrame, right: DataFrame, on: Seq[String],
           leftTime: String, rightTime: String,
           carry: Seq[String] = Nil,
           matchedTimeAs: Option[String] = None,
           tolerance: Option[Column] = None,
           direction: String = "backward"): DataFrame = {
    require(on.nonEmpty, "asof needs at least one equi-key column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got '$direction'")
    on.foreach { c =>
      require(left.columns.contains(c), s"left side misses key column '$c'")
      require(right.columns.contains(c), s"right side misses key column '$c'")
    }
    require(left.columns.contains(leftTime), s"left side misses '$leftTime'")
    require(right.columns.contains(rightTime), s"right side misses '$rightTime'")
    val carried =
      if (carry.nonEmpty) carry
      else right.columns.filterNot(c => on.contains(c) || c == rightTime).toSeq
    carried.foreach { c =>
      require(right.columns.contains(c), s"carry column '$c' not on right side")
      require(!left.columns.contains(c),
        s"carry column '$c' collides with a left column — alias it on the right side first")
    }
    val reserved = Seq("__t", "__side", "__asof_p", "__mt")
    matchedTimeAs.foreach { c =>
      require(!left.columns.contains(c) && !carried.contains(c),
        s"matchedTimeAs '$c' collides with an output column")
      require(!reserved.contains(c),
        s"matchedTimeAs '$c' is reserved by asof — pick another name")
    }
    reserved.foreach { c =>
      require(!left.columns.contains(c) && !right.columns.contains(c),
        s"'$c' is reserved by asof — rename the input column")
    }
    require(left.schema(leftTime).dataType == right.schema(rightTime).dataType,
      s"asof time columns must have identical types; got " +
        s"${left.schema(leftTime).dataType} vs ${right.schema(rightTime).dataType}" +
        " — unionByName would silently widen one side")
    val leftOnly =
      left.columns.filterNot(c => on.contains(c) || c == leftTime).toSeq

    def typedNull(src: DataFrame, c: String): Column =
      lit(null).cast(src.schema(c).dataType)

    // SQL equi-join null semantics: Window.partitionBy co-groups null
    // keys, so drop null-key right rows up front — they must never match
    val rightKeyed = right.filter(on.map(c => q(c).isNotNull).reduce(_ && _))

    // the matched right row rides as ONE struct (__mt + carried): the
    // fill picks a whole row, never a per-column mixture, and the
    // tolerance check reads the time of the row the values came from
    val payloadType = StructType(
      StructField("__mt", right.schema(rightTime).dataType) +:
        carried.map(c => StructField(c, right.schema(c).dataType)))

    // union schema: keys ++ __t ++ __side ++ left-only cols ++ payload
    val lSide = left.select(
      on.map(q) ++ Seq(q(leftTime).as("__t"), lit(1).as("__side")) ++
        leftOnly.map(q) :+
        lit(null).cast(payloadType).as("__asof_p"): _*)
    val rSide = rightKeyed.select(
      on.map(q) ++ Seq(q(rightTime).as("__t"), lit(0).as("__side")) ++
        leftOnly.map(c => typedNull(left, c).as(c)) :+
        struct(q(rightTime).as("__mt") +: carried.map(q): _*)
          .cast(payloadType).as("__asof_p"): _*)

    // ordering by the payload struct = (time again, then carried asc):
    // among right rows tied on (keys, time) the carried-ascending-last
    // one wins, matching the documented contract, and the tie-break
    // reads ORIGINAL right values (nothing is overwritten before the
    // window runs)
    val tOrd = if (direction == "backward") col("__t").asc else col("__t").desc
    val w = Window.partitionBy(on.map(q): _*)
      .orderBy(tOrd, col("__side").asc, col("__asof_p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lSide.unionByName(rSide)
      .withColumn("__asof_p", last(col("__asof_p"), ignoreNulls = true).over(w))
    val mt = col("__asof_p")("__mt")
    val inTol = tolerance match {
      case None      => lit(true)
      case Some(tol) =>
        if (direction == "backward") mt >= col("__t") - tol
        else mt <= col("__t") + tol
    }
    val masked = filled.withColumn("__asof_p", when(inTol, col("__asof_p")))
    // restore the left schema's column order, then the attachments
    val out = left.columns.toSeq.map { c =>
      if (c == leftTime) col("__t").as(leftTime) else q(c)
    } ++ carried.map(c => col("__asof_p")(c).as(c)) ++
      matchedTimeAs.map(n => col("__asof_p")("__mt").as(n))
    masked.filter(col("__side") === 1).select(out: _*)
  }
}
