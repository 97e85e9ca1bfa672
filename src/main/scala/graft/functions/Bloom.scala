package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(key, filter_bytes)`: membership probe of a
  * serialized Bloom filter as a native codegen expression — the probe
  * side of a bloom-pruned join (the published sideways-information-
  * passing idiom: build a compact membership summary of the join's
  * small side, ship it to the big side's scan, drop non-members before
  * the exchange).
  *
  * The right child must be a FOLDABLE binary (the filter built
  * distributed by `DataFrameStatFunctions.bloomFilter` — a tree merge
  * of per-partition filters — then serialized into a literal). It is
  * deserialized ONCE lazily per plan instance, not per row: the
  * generated code references the deserialized `BloomFilter` via
  * `ctx.addReferenceObj`, so the per-row cost is a pure bit-test inside
  * whole-stage codegen. False positives (bounded by the build FPP) must
  * be removed by an exact join downstream; the bloom's only job is to
  * keep non-qualifying rows out of the shuffle — at 100 TB the fact-
  * side exchange is the dominant cost it cuts.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, BinaryType)

  override def dataType: DataType = BooleanType

  override def nullable: Boolean = left.nullable

  @transient private lazy val filter: BloomFilter = {
    require(right.foldable,
      "bloom_might_contain: the filter argument must be a foldable binary literal")
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, "bloom_might_contain: the filter argument is null")
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(key: Any, bytes: Any): Any =
    filter.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // deserialized at codegen time on the driver; ships to executors as
    // one plan reference object (BloomFilterImpl is Serializable). The
    // second operand (the foldable literal) compiles to a reference
    // lookup, so the per-row work is only the bit-test.
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev,
      (key, _) => s"${ev.value} = $ref.mightContainLong($key);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
