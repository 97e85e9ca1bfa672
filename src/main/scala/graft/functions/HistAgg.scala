package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Mutable fixed-domain histogram state: `long[bins]` counts. */
final class HistState(bins: Int) {
  val cells: Array[Long] = new Array[Long](bins)
  def addIn(other: HistState): HistState = {
    var i = 0
    while (i < cells.length) { cells(i) += other.cells(i); i += 1 }
    this
  }
}

/** Native fixed-domain histogram aggregate — the q168/q174 bin counts
  * as one `long[bins]` state row, bin arithmetic IEEE-identical to the
  * Column form (`floor((v - vmin) * bins / (vmax - vmin))`, clamped to
  * the top bin, degenerate domain collapses to bin 0), so downstream
  * cells hash-match unchanged. Same motivation as [[CmsSketchAgg]]/
  * [[HllRegistersAgg]]: one state row per group instead of up to
  * `bins` state-store entries, single slot increment per input.
  */
case class HistogramAgg(
    child: Expression,
    vmin: Double, vmax: Double, bins: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HistState] with UnaryLike[Expression] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fixed_histogram needs a DOUBLE value, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "fixed_histogram"

  override def createAggregationBuffer(): HistState = new HistState(bins)

  override def update(buf: HistState, input: InternalRow): HistState = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      // IEEE-identical to the Column form: ((x - vmin) * bins) /
      // (vmax - vmin), floored, clamped; degenerate domain -> bin 0
      val bin =
        if (vmax == vmin) 0L
        else math.min(
          math.floor((x - vmin) * bins.toDouble / (vmax - vmin)).toLong,
          bins - 1L)
      buf.cells(bin.toInt) += 1L
    }
    buf
  }

  override def merge(x: HistState, y: HistState): HistState = x.addIn(y)

  override def eval(buf: HistState): Any =
    new GenericArrayData(buf.cells.clone())

  override def serialize(buf: HistState): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * bins)
    var i = 0
    while (i < bins) { bb.putLong(buf.cells(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): HistState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new HistState(bins)
    var i = 0
    while (i < bins) { st.cells(i) = bb.getLong; i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistogramAgg =
    copy(child = newChild)
}

object HistogramAgg {
  /** Column form over the library's bin count. */
  def histogram(value: Column, vmin: Double, vmax: Double): Column =
    org.apache.spark.sql.graftshim.GraftColumns.ofExpr(
      HistogramAgg(
        org.apache.spark.sql.graftshim.GraftColumns.exprOf(value),
        vmin, vmax, graft.operators.Relational.HistBins.toInt)
        .toAggregateExpression())
}
