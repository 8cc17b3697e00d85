package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Membership tests against a driver-built literal set — the
  * "broadcast the small side into the plan" primitive for per-row
  * probe matching (decontamination probe indexes, allowlists of
  * hashes). A plain `isin`/`array_contains` over N literals is an
  * O(N) chain per row; this is one binary search over a sorted
  * primitive array — O(log N), no boxing, codegen'd — which is what
  * makes a multi-million-entry probe index affordable inside a
  * projection (and therefore inside a STREAM, where a join-shaped
  * meeting would need corpus-wide state).
  *
  * The array rides the serialized plan as a reference object exactly
  * like the ADC lookup tables in [[VectorExprs]]: shipped once per
  * stage broadcast, shared by every task in the executor. */
object SetExprs {

  /** Boolean: is the child LONG in `sorted`? `sorted` MUST be sorted
    * ascending and duplicate-free (the factory below enforces it). */
  case class InSortedLongSet(child: Expression, sorted: Array[Long])
    extends UnaryExpression {

    require(sorted != null, "set must not be null")

    override def dataType: DataType = BooleanType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "in_sorted_long_set"

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("inLongSet", this,
        classOf[InSortedLongSet].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $ref.contains($c);")
    }

    def contains(v: Long): Boolean =
      java.util.Arrays.binarySearch(sorted, v) >= 0

    protected override def nullSafeEval(input: Any): Any =
      contains(input.asInstanceOf[Long])

    override protected def withNewChildInternal(c: Expression): InSortedLongSet =
      copy(child = c)
  }

  /** `c IN set` for a long column; sorts + dedups the set once here so
    * the expression's binary-search contract always holds. */
  def inLongSet(c: Column, set: Array[Long]): Column =
    GraftBridge.column(InSortedLongSet(GraftBridge.expression(c),
      set.distinct.sorted))
}
