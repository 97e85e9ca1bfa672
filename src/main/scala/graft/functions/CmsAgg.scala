package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Mutable count-min sketch state: a flat `long[depth * width]` cell
  * grid. One input key increments `depth` slots; merge is element-wise
  * addition (the sketch is a linear map of the frequency vector).
  */
final class CmsState(size: Int) {
  val cells: Array[Long] = new Array[Long](size)
  def addIn(other: CmsState): CmsState = {
    var i = 0
    while (i < cells.length) { cells(i) += other.cells(i); i += 1 }
    this
  }
}

/** Native count-min-sketch aggregate: the q158/q167 cell grid built as
  * ONE `TypedImperativeAggregate` over a flat `long[depth·width]` —
  * h_j(x) = (a_j·hi + b_j·lo + c_j) mod p mod width on the two 30-bit
  * halves of the 60-bit key, identical arithmetic to the Column form
  * (`Corpus.cmsBucketOf`), so downstream cells hash-match unchanged.
  *
  * Why it exists when groupBy(window, j, bkt).count() already does:
  * the relational form must first CROSS JOIN every event with the
  * depth seed rows — a depth-fold row amplification through the
  * shuffle and (in streaming) up to depth·width state-store ENTRIES
  * per window, each with per-entry key overhead. This aggregate
  * updates depth array slots per input row with zero amplification,
  * and streaming state becomes ONE row per window holding the 16 KB
  * grid — the r15 sweep's worst streaming constant (q167, 42 s at
  * sf10) was exactly that amplification.
  */
case class CmsSketchAgg(
    child: Expression,
    a: Array[Long], b: Array[Long], c: Array[Long],
    width: Int, p: Long, halfBits: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CmsState] with UnaryLike[Expression] {

  private def depth: Int = a.length
  private def size: Int = depth * width

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cms_sketch needs a BIGINT key, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): CmsState = new CmsState(size)

  override def update(buf: CmsState, input: InternalRow): CmsState = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      val hi = x >>> halfBits
      val lo = x & ((1L << halfBits) - 1)
      var j = 0
      while (j < depth) {
        val bkt = ((a(j) * hi + b(j) * lo + c(j)) % p % width).toInt
        buf.cells(j * width + bkt) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(x: CmsState, y: CmsState): CmsState = x.addIn(y)

  override def eval(buf: CmsState): Any =
    new GenericArrayData(buf.cells.clone())

  override def serialize(buf: CmsState): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * size)
    var i = 0
    while (i < size) { bb.putLong(buf.cells(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CmsState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new CmsState(size)
    var i = 0
    while (i < size) { st.cells(i) = bb.getLong; i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketchAgg =
    copy(child = newChild)
}

object CmsSketchAgg {
  /** Column form over the library's replayable CMS seeds. */
  def sketch(key: Column): Column =
    org.apache.spark.sql.graftshim.GraftColumns.ofExpr(
      CmsSketchAgg(
        org.apache.spark.sql.graftshim.GraftColumns.exprOf(key),
        graft.operators.Corpus.cmsSeedsA,
        graft.operators.Corpus.cmsSeedsB,
        graft.operators.Corpus.cmsSeedsC,
        graft.operators.Corpus.CmsReplayWidth,
        graft.operators.Corpus.CmsReplayP,
        graft.operators.Corpus.CmsReplayHalfBits)
        .toAggregateExpression())
}
