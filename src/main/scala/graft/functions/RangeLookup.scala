package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Broadcast range lookup: the index of the greatest boundary <= the
  * probe key (−1 below the first boundary), as a native codegen
  * expression over a BROADCAST sorted `long[]`.
  *
  * This is the shuffle-free form of "join the fact table to a small
  * ranges dimension on lo <= x < hi" — IP→geo, value→tier,
  * timestamp→era. A range join shuffles (or at best broadcasts and
  * nested-loops) the fact side against every range row; this
  * expression is an O(log k) `Arrays.binarySearch` per row INSIDE
  * whole-stage codegen, the boundaries ship once per executor as a
  * broadcast handle (the [[BloomMightContainBc]] discipline — a plan
  * literal would ride in every task binary), and the "join" leaves no
  * exchange in the plan at all. Correct whenever ranges are
  * contiguous-or-gapless from each boundary to the next; a gapped
  * dimension adds one upper-bound check on the returned index.
  *
  * Not SQL-registrable (the registry builds from Expression children
  * only) — construct via [[LowerBoundBc.column]].
  */
case class LowerBoundBc(
    child: Expression,
    bounds: Broadcast[Array[Long]])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "lower_bound_bc"

  @transient private lazy val arr: Array[Long] = bounds.value

  /** Greatest i with arr(i) <= x, or -1: binarySearch returns the hit
    * index, or (-insertionPoint - 1) — the insertion point minus one
    * is exactly the lower bound.
    */
  private def lookup(arr: Array[Long], x: Long): Long = {
    val bs = java.util.Arrays.binarySearch(arr, x)
    (if (bs >= 0) bs else -(bs + 1) - 1).toLong
  }

  override protected def nullSafeEval(key: Any): Any =
    lookup(arr, key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcCls = classOf[Broadcast[_]].getName
    val ref = ctx.addReferenceObj("boundsBc", bounds, bcCls)
    // addMutableState returns the fresh member name; two different
    // boundary arrays in one codegen class must not dedupe onto one
    val local = ctx.addMutableState(
      "long[]", "graftBounds", v => s"$v = (long[]) $ref.value();")
    nullSafeCodeGen(ctx, ev, key =>
      s"""
         |int graftBs = java.util.Arrays.binarySearch($local, $key);
         |${ev.value} = (long) (graftBs >= 0 ? graftBs : -(graftBs + 1) - 1);
       """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): LowerBoundBc = copy(child = newChild)
}

object LowerBoundBc {
  /** `key` looked up against the broadcast sorted boundaries, as a
    * Column: the greatest index whose boundary is <= key, −1 below
    * the first.
    */
  def column(key: Column, bounds: Broadcast[Array[Long]]): Column =
    org.apache.spark.sql.graftshim.GraftColumns.ofExpr(
      LowerBoundBc(
        org.apache.spark.sql.graftshim.GraftColumns.exprOf(key), bounds))
}
