package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Mutable HLL register state: `long[m]` of per-bucket max rho.
  * Merge is element-wise max — HLL union IS register max.
  */
final class HllState(m: Int) {
  val regs: Array[Long] = new Array[Long](m)
  def maxIn(other: HllState): HllState = {
    var i = 0
    while (i < regs.length) {
      if (other.regs(i) > regs(i)) regs(i) = other.regs(i)
      i += 1
    }
    this
  }
}

/** Native HLL register aggregate over the library's replayable 60-bit
  * key convention (top `bits` bits = bucket, rho = maxRho − bitlength
  * of the suffix, all-zero suffix = maxRho) — identical arithmetic to
  * the Column pair `hllBucket`/`hllRho`, so downstream registers
  * hash-match unchanged.
  *
  * Why it exists when groupBy(window, bkt).max(rho) already does: the
  * relational form holds one state-store ENTRY per observed (window,
  * bucket) — up to m per window, each with per-entry key overhead —
  * where this aggregate keeps ONE 4 KB row per window and updates a
  * single array slot per input. Same motivation (and shape) as
  * [[CmsSketchAgg]].
  */
case class HllRegistersAgg(
    child: Expression,
    bits: Int, maxRho: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HllState] with UnaryLike[Expression] {

  private def m: Int = 1 << bits
  private def suffixBits: Int = 60 - bits

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hll_registers needs a BIGINT key, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hll_registers"

  override def createAggregationBuffer(): HllState = new HllState(m)

  override def update(buf: HllState, input: InternalRow): HllState = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      val bkt = (x >>> suffixBits).toInt
      val suffix = x & ((1L << suffixBits) - 1)
      val rho =
        if (suffix == 0L) maxRho.toLong
        else maxRho.toLong - (64 - java.lang.Long.numberOfLeadingZeros(suffix))
      if (rho > buf.regs(bkt)) buf.regs(bkt) = rho
    }
    buf
  }

  override def merge(x: HllState, y: HllState): HllState = x.maxIn(y)

  override def eval(buf: HllState): Any =
    new GenericArrayData(buf.regs.clone())

  override def serialize(buf: HllState): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * m)
    var i = 0
    while (i < m) { bb.putLong(buf.regs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): HllState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new HllState(m)
    var i = 0
    while (i < m) { st.regs(i) = bb.getLong; i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegistersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegistersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegistersAgg =
    copy(child = newChild)
}

object HllRegistersAgg {
  /** Column form over the library's replayable HLL parameters. */
  def registers(key: Column): Column =
    org.apache.spark.sql.graftshim.GraftColumns.ofExpr(
      HllRegistersAgg(
        org.apache.spark.sql.graftshim.GraftColumns.exprOf(key),
        graft.operators.Corpus.HllBits,
        graft.operators.Corpus.HllMaxRho)
        .toAggregateExpression())
}
