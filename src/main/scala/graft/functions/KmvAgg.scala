package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Mutable KMV (k-minimum-values) sketch state: the `n <= k` smallest
  * DISTINCT long keys seen so far, sorted ascending in a fixed
  * `long[k]` — no boxing, no per-insert reallocation. An insert is a
  * binary search plus (on hit inside the prefix) one `arraycopy`
  * shift; a key past the current k-th minimum of a full buffer is
  * rejected in O(log k) without touching the array.
  */
final class KmvState(val k: Int) {
  var n: Int = 0
  val keys: Array[Long] = new Array[Long](k)

  def insert(x: Long): Unit = {
    if (n >= k && keys(n - 1) <= x) return // past the k-th min: reject
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (keys(mid) < x) lo = mid + 1 else hi = mid
    }
    if (lo < n && keys(lo) == x) return // already present: distinct
    val keep = math.min(n, k - 1) // last slot falls off a full buffer
    System.arraycopy(keys, lo, keys, lo + 1, keep - lo)
    keys(lo) = x
    if (n < k) n += 1
  }

  def mergeIn(other: KmvState): KmvState = {
    var i = 0
    while (i < other.n) { insert(other.keys(i)); i += 1 }
    this
  }
}

/** Native KMV bottom-k-distinct aggregate — the
  * [[graft.functions.BottomKDistinct]] semantics (k smallest DISTINCT
  * long keys per group, sorted ascending) as a Catalyst
  * `TypedImperativeAggregate` over an unboxed `long[]` buffer.
  *
  * Why it exists when the typed `Aggregator` already does: the
  * `udaf(...)`-registered form pays the buffer `Encoder` plus an
  * O(k) immutable-`Vector` copy on EVERY input row — the r13 scale
  * canary's worst streaming decade ratio (q175 sf1→sf10 = 3.1×) was
  * entirely that per-row ser/de. This expression's per-row cost is
  * `child.eval` + a primitive binary search; serialization (a
  * length-prefixed `long[]` pack) happens only at partial-output and
  * state-store boundaries. State per group stays ≤ k longs, the merge
  * is the KMV set-union (KmvAggSpec pins agreement with the typed
  * Aggregator row-for-row), and the aggregate remains algebraic, so
  * streaming incremental merges are exact.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvState] with UnaryLike[Expression] {

  // input must already be LongType (the 60-bit md5 key projection) —
  // callers hash/cast before aggregating, same contract as the typed
  // Aggregator this replaces
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch needs a BIGINT key, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(buf: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: KmvState, b: KmvState): KmvState = a.mergeIn(b)

  override def eval(buf: KmvState): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buf.keys, buf.n))

  override def serialize(buf: KmvState): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.keys(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvState = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val st = new KmvState(k)
    st.n = n
    var i = 0
    while (i < n) { st.keys(i) = bb.getLong; i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

object KmvSketchAgg {
  /** Column form: KMV sketch of `key` (a 60-bit long hash key), the
    * drop-in replacement for `udaf(BottomKDistinct)(key)`.
    */
  def sketch(key: Column, k: Int): Column =
    org.apache.spark.sql.graftshim.GraftColumns.ofExpr(
      KmvSketchAgg(
        org.apache.spark.sql.graftshim.GraftColumns.exprOf(key), k)
        .toAggregateExpression())
}
