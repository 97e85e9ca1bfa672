package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Mutable bottom-k-by-hash PAIR sample: the `n <= k` (hash, value)
  * pairs with the smallest DISTINCT hashes seen so far, kept sorted by
  * hash ascending in two parallel `long[k]` arrays — the
  * [[KmvState]] layout with a value payload riding along. Because the
  * hash is a uniform fingerprint of a unique row id, the retained
  * values are a uniform without-replacement sample of the group's
  * rows, which is exactly what a mergeable quantile sketch needs
  * (bottom-k sampling: Cohen & Kaplan '07).
  *
  * Determinism under any merge order (required for oracle replay): a
  * duplicate hash keeps the SMALLER value, and a full buffer rejects
  * any hash strictly greater than the current k-th minimum, so the
  * final state is a pure function of the input SET.
  */
final class SamplePairsState(val k: Int) {
  var n: Int = 0
  val hashes: Array[Long] = new Array[Long](k)
  val vals: Array[Long] = new Array[Long](k)

  def insert(h: Long, v: Long): Unit = {
    if (n >= k && hashes(n - 1) < h) return // past the k-th min: reject
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (hashes(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < n && hashes(lo) == h) { // collision: order-independent min
      if (v < vals(lo)) vals(lo) = v
      return
    }
    val keep = math.min(n, k - 1) // last slot falls off a full buffer
    System.arraycopy(hashes, lo, hashes, lo + 1, keep - lo)
    System.arraycopy(vals, lo, vals, lo + 1, keep - lo)
    hashes(lo) = h
    vals(lo) = v
    if (n < k) n += 1
  }

  def mergeIn(other: SamplePairsState): SamplePairsState = {
    var i = 0
    while (i < other.n) { insert(other.hashes(i), other.vals(i)); i += 1 }
    this
  }
}

/** Native bottom-k (hash, value) sample aggregate — the quantile
  * sketch's state builder, completing the replayable sketch quartet
  * (KMV distinct / CMS frequency / HLL / equi-width histogram) with
  * the one read-out those cannot give: order statistics of an
  * unbounded-domain value column.
  *
  * Same engineering contract as [[KmvSketchAgg]]: per-row cost is two
  * `child.eval`s plus a primitive binary search; state per group is
  * `2k` longs; serialization (length-prefixed pack of both arrays)
  * only at partial-output and state-store boundaries; the merge is the
  * bottom-k set union, so the aggregate is algebraic and streaming
  * incremental merges are exact. Output is the interleaved pair array
  * `[h0, v0, h1, v1, ...]` sorted by hash — still a mergeable sketch,
  * so downstream algebra (window slides, rollups) can re-merge it.
  *
  * Replayability: the retained pairs are the k smallest md5-derived
  * hashes, so DuckDB rebuilds the identical sample with a
  * `row_number() OVER (ORDER BY h)` filter and the identical quantile
  * read-out with integer rank arithmetic — the whole path hashes.
  */
case class SamplePairsAgg(
    left: Expression,
    right: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SamplePairsState] with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sample_pairs needs (BIGINT hash, BIGINT value), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "sample_pairs"

  override def createAggregationBuffer(): SamplePairsState = new SamplePairsState(k)

  override def update(buf: SamplePairsState, input: InternalRow): SamplePairsState = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null) buf.insert(h.asInstanceOf[Long], v.asInstanceOf[Long])
    buf
  }

  override def merge(a: SamplePairsState, b: SamplePairsState): SamplePairsState =
    a.mergeIn(b)

  override def eval(buf: SamplePairsState): Any = {
    val out = new Array[Long](2 * buf.n)
    var i = 0
    while (i < buf.n) {
      out(2 * i) = buf.hashes(i)
      out(2 * i + 1) = buf.vals(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: SamplePairsState): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.hashes(i)); bb.putLong(buf.vals(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SamplePairsState = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val st = new SamplePairsState(k)
    st.n = n
    var i = 0
    while (i < n) { st.hashes(i) = bb.getLong; st.vals(i) = bb.getLong; i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SamplePairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SamplePairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SamplePairsAgg =
    copy(left = newLeft, right = newRight)
}

object SamplePairsAgg {
  /** Column form: bottom-k (hash, value) pair sample, interleaved
    * `[h, v, ...]` sorted by hash. `hash` must be a uniform BIGINT
    * fingerprint of a unique row id (the `hllKey` convention).
    */
  def sketch(hash: Column, value: Column, k: Int): Column =
    org.apache.spark.sql.graftshim.GraftColumns.ofExpr(
      SamplePairsAgg(
        org.apache.spark.sql.graftshim.GraftColumns.exprOf(hash),
        org.apache.spark.sql.graftshim.GraftColumns.exprOf(value), k)
        .toAggregateExpression())

  /** The quantile read-out both engines share: with the sample's
    * values sorted ascending, quantile `q = qnum/100` is the value at
    * 1-based rank `ceil(n·qnum/100)` (percentile-disc semantics) —
    * pure integer arithmetic, so engine and DuckDB agree bit-for-bit.
    */
  def rankOf(n: Int, qnum: Int): Int = (n * qnum + 99) / 100
}
