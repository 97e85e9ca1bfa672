package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Ascending, Attribute, AttributeSet, Expression, GenericInternalRow, JoinedRow, PredicateHelper, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** Native as-of join: a first-class Catalyst operator (logical node +
  * planner strategy + physical exec + optimizer rule, all registered
  * through `GraftExtensions`) for "attach to every left row the latest
  * right row at or before its time, per key" — the enrichment join of
  * every temporal pipeline, which Spark's built-in operators can only
  * express via detours.
  *
  * Why a custom operator when [[graft.operators.AsOfJoin.lastBefore]]
  * already exists: the union+window formulation shuffles BOTH inputs
  * into ONE combined sort and drags a carry-struct through a window
  * frame; this exec instead co-partitions each side independently
  * (`ClusteredDistribution` on the keys, all-cluster-keys required, so
  * EnsureRequirements plans exactly the two exchanges a sort-merge
  * join would get), asks for per-partition (key, time) order, and
  * streams a ONE-PASS MERGE with O(1) state per partition: one
  * retained right row, one lookahead row. No window buffer, no
  * union-width rows, no second sort of the combined stream — at
  * 100 TB the win is the removed combined-stream sort and the
  * constant-memory merge. Semantics (spec-pinned equal to
  * `lastBefore`): right row visible iff rightTime <= leftTime; among
  * right ties on (key, time) the greatest by `rightTieBreak` wins;
  * unmatched left rows carry nulls. Null right times sort first
  * (NULLS FIRST, same as the window formulation's ordering).
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    rightTieBreak: Seq[Attribute],
    direction: String = "backward",
    allowExact: Boolean = true,
    tolerance: Option[Long] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Catalyst does not know what a foreign node computes, so without
  * help a `Filter` above [[AsOfJoinPlan]] stays above it and the scans
  * read everything. This rule (injected into the operator-optimization
  * fixed-point batch) restores the two pushes that are provably sound
  * for as-of semantics: (1) any deterministic conjunct referencing
  * only LEFT output moves below the join — each left row's match is
  * computed independently, so dropping left rows early never changes
  * another row's result; (2) a conjunct referencing only left KEY
  * columns is additionally MIRRORED to the right child (keys are
  * matched by equality, so right rows whose key fails the predicate
  * can only ever pair with left rows that were just filtered away).
  * Right-side non-key predicates must NOT be pushed: removing a right
  * row changes which row is "latest at or before" for survivors.
  * After this rule fires, the stock PushDownPredicates rules in the
  * same fixed-point batch carry the child filters all the way into
  * the scans (`PushedFilters` — spec-pinned).
  */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (leftOnly, rest) = splitConjunctivePredicates(cond)
        .partition(c => c.deterministic && c.references.subsetOf(j.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val keyMap = j.leftKeys.map(_.exprId).zip(j.rightKeys).toMap
        val leftKeySet = AttributeSet(j.leftKeys)
        val mirrored = leftOnly
          .filter(_.references.subsetOf(leftKeySet))
          .map(_.transform { case a: Attribute if keyMap.contains(a.exprId) =>
            keyMap(a.exprId)
          })
        val newLeft = Filter(leftOnly.reduce(And), j.left)
        val newRight =
          if (mirrored.isEmpty) j.right else Filter(mirrored.reduce(And), j.right)
        val pushed = j.copy(left = newLeft, right = newRight)
        if (rest.isEmpty) pushed else Filter(rest.reduce(And), pushed)
      }
  }
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb, dir, ax, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb,
        dir, ax, tol) :: Nil
    case _ => Nil
  }
}

/** Co-partitioned streaming-merge as-of join. Each task walks its left
  * partition once and its right partition once; retained state is ONE
  * copied right row plus ONE lookahead row regardless of partition
  * size. The advance condition is a single lexicographic compare on
  * (keys..., time) — right rows are consumed while their (key, time)
  * prefix is <= the current left row's, which simultaneously skips
  * exhausted keys and absorbs same-key ties so the LAST tie (greatest
  * tieBreak, by the required child ordering) is the one retained.
  */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    rightTieBreak: Seq[Attribute],
    direction: String = "backward",
    allowExact: Boolean = true,
    tolerance: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // exactly the sort-merge-join contract: cluster each side on all of
  // its keys (requireAllClusterKeys => co-partitioned exchanges), sort
  // partitions by (keys, time) — plus the tie-break on the right so
  // "last tie wins" is deterministic
  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(leftKeys, requireAllClusterKeys = true),
    ClusteredDistribution(rightKeys, requireAllClusterKeys = true))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightTieBreak)).map(SortOrder(_, Ascending)))

  // the merge streams left in order and adds no exchange of its own
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  // time-column read-out for the tolerance bound: the merge itself is
  // type-generic (lexicographic compare), but |leftTime - rightTime|
  // needs a numeric value — integral, timestamp (long micros) and
  // date (int days) types qualify; NativeAsOf validates up front
  private def timeAsLong(dt: org.apache.spark.sql.types.DataType,
      row: InternalRow, ordinal: Int): Long = dt match {
    case org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType => row.getLong(ordinal)
    case org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.DateType => row.getInt(ordinal).toLong
    case other => throw new IllegalStateException(
      s"as-of tolerance unsupported for time type ${other.catalogString}")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val ordTypes = (leftKeys :+ leftTime).map(_.dataType)
    val keyTypes = leftKeys.map(_.dataType)
    val dir = direction
    val ax = allowExact
    val tol = tolerance
    val lTimeType = leftTime.dataType
    val rTimeType = rightTime.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lOrdProj = UnsafeProjection.create(leftKeys :+ leftTime, lOut)
      val rOrdProj = UnsafeProjection.create(rightKeys :+ rightTime, rOut)
      val lKeyProj = UnsafeProjection.create(leftKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
      // time ordinals inside the ord projections (last slot)
      val lTimeOrd = leftKeys.length
      val rTimeOrd = rightKeys.length
      val fullOrd = RowOrdering.createNaturalAscendingOrdering(ordTypes)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      // bind against NULLABLE right attributes: unmatched left rows
      // substitute an all-null right row, and a projection bound to the
      // child's non-nullable schema would read those nulls as 0/""
      val resultProj =
        UnsafeProjection.create(output, lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      var rCurr: InternalRow = null
      var rNext: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
      val fw = dir == "forward"
      // nearest consumes like backward-with-exact (equal-time rows
      // land in rCurr; dt 0 beats any forward dt anyway)
      val consumeEq = if (fw) !ax else ax
      lIter.map { l =>
        val lOrd = lOrdProj(l)
        // BACKWARD consumes rows with (key, time) <= (or < when strict)
        // the left's and retains the last consumed — "latest at or
        // before", ties to the GREATEST tieBreak. FORWARD consumes
        // rows strictly behind (or behind-or-equal when strict) and
        // matches the lookahead itself — "earliest at or after", ties
        // to the SMALLEST tieBreak (first in child order). NEAREST
        // holds BOTH candidates at once (the retained row and the
        // lookahead) and picks the smaller |dt|, ties to backward.
        while (rNext != null && {
          val c = fullOrd.compare(rOrdProj(rNext), lOrd)
          c < 0 || (c == 0 && consumeEq)
        }) {
          rCurr = rNext
          rNext = if (rIter.hasNext) rIter.next().copy() else null
        }
        val cand: InternalRow =
          if (dir == "nearest") {
            if (lOrd.isNullAt(lTimeOrd)) null
            else {
              val lt = timeAsLong(lTimeType, lOrd, lTimeOrd)
              // distance of a same-key, in-tolerance candidate, else MaxValue
              def dist(r: InternalRow, forwardSide: Boolean): Long = {
                if (r == null || keyOrd.compare(rKeyProj(r), lKeyProj(l)) != 0)
                  Long.MaxValue
                else {
                  val ro = rOrdProj(r)
                  if (ro.isNullAt(rTimeOrd)) Long.MaxValue
                  else {
                    val d = if (forwardSide)
                      timeAsLong(rTimeType, ro, rTimeOrd) - lt
                    else lt - timeAsLong(rTimeType, ro, rTimeOrd)
                    if (tol.forall(d <= _)) d else Long.MaxValue
                  }
                }
              }
              val dB = dist(rCurr, forwardSide = false)
              val dF = dist(rNext, forwardSide = true)
              if (dB == Long.MaxValue && dF == Long.MaxValue) null
              else if (dB <= dF) rCurr
              else rNext
            }
          } else {
            val c0 = if (fw) rNext else rCurr
            var matched =
              c0 != null && keyOrd.compare(rKeyProj(c0), lKeyProj(l)) == 0
            if (matched && tol.isDefined) {
              val rOrdRow = rOrdProj(c0)
              matched = !lOrd.isNullAt(lTimeOrd) && !rOrdRow.isNullAt(rTimeOrd) && {
                val lt = timeAsLong(lTimeType, lOrd, lTimeOrd)
                val rt = timeAsLong(rTimeType, rOrdRow, rTimeOrd)
                (if (fw) rt - lt else lt - rt) <= tol.get
              }
            }
            if (matched) c0 else null
          }
        resultProj(joined(l, if (cand != null) cand else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API over the native operator. */
object NativeAsOf {

  /** For every `left` row, attach the latest `right` row with
    * `right(time) <= left(time)` sharing `on`, as columns prefixed
    * `asof_` (right keys are dropped — they duplicate the left's).
    * Right (key, time) ties resolve to the greatest `tieBreak`.
    *
    * The full `merge_asof` knob set rides on the same one-pass merge
    * with unchanged O(1) state:
    *  - `direction = "forward"`: earliest right row at or after the
    *    left time instead; (key, time) ties resolve to the SMALLEST
    *    `tieBreak` (first in child sort order).
    *  - `direction = "nearest"`: whichever of the backward/forward
    *    candidates is closer in time; distance ties go to the
    *    backward one. Requires `allowExactMatches = true` and an
    *    integral/timestamp/date time column (distances are measured,
    *    not just compared).
    *  - `allowExactMatches = false`: strictly-before (respectively
    *    strictly-after) — equal times no longer match.
    *  - `tolerance = Some(t)`: a match additionally requires
    *    `|leftTime - rightTime| <= t` in the time column's own units;
    *    out-of-tolerance left rows carry nulls. Requires an
    *    integral / timestamp / date time column.
    *
    * Every right column is re-aliased before the join, which both
    * applies the prefix and mints fresh attribute ids — a self-join
    * (events vs events) therefore never trips analyzer relation
    * deduplication on the custom node.
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      on: Seq[String], time: String,
      tieBreak: Seq[String] = Nil,
      direction: String = "backward",
      allowExactMatches: Boolean = true,
      tolerance: Option[Long] = None): DataFrame = {
    require(on.nonEmpty, "at least one key column")
    require(Set("backward", "forward", "nearest").contains(direction),
      s"direction must be 'backward', 'forward' or 'nearest', got '$direction'")
    require(direction != "nearest" || allowExactMatches,
      "direction='nearest' requires allowExactMatches=true")
    val renamed = right.select(right.columns.toSeq.map { c =>
      if (on.contains(c)) col(c).as(s"_asof_key_$c") else col(c).as(s"asof_$c")
    }: _*)
    def attr(df: DataFrame, name: String): Attribute =
      df.queryExecution.analyzed.output.find(_.name == name).getOrElse(
        sys.error(s"column '$name' not found in ${df.columns.mkString(", ")}"))
    val lPlan = left.queryExecution.analyzed
    val rPlan = renamed.queryExecution.analyzed
    val lk = on.map(k => attr(left, k))
    val rk = on.map(k => attr(renamed, s"_asof_key_$k"))
    val lt = attr(left, time)
    val rt = attr(renamed, s"asof_$time")
    lk.zip(rk).foreach { case (a, b) =>
      require(a.dataType == b.dataType, s"key type mismatch: $a vs $b") }
    require(lt.dataType == rt.dataType, s"time type mismatch: $lt vs $rt")
    val tb = tieBreak.map(c => attr(renamed, s"asof_$c"))
    if (tolerance.isDefined || direction == "nearest") {
      import org.apache.spark.sql.types._
      val ok = Set[DataType](LongType, IntegerType, TimestampType,
        TimestampNTZType, DateType)
      require(ok.contains(lt.dataType),
        s"tolerance/nearest needs an integral/timestamp/date time column, " +
          s"got ${lt.dataType.catalogString}")
      tolerance.foreach(t => require(t >= 0, "tolerance must be non-negative"))
    }
    val node = AsOfJoinPlan(lPlan, rPlan, lk, rk, lt, rt, tb,
      direction = direction,
      allowExact = allowExactMatches,
      tolerance = tolerance)
    org.apache.spark.sql.graftshim.GraftColumns
      .ofPlan(left.sparkSession, node)
      .drop(on.map(k => s"_asof_key_$k"): _*)
  }
}
