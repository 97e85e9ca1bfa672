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

/** [[BloomMightContain]]'s cluster-scale sibling: the filter rides as a
  * [[org.apache.spark.broadcast.Broadcast]] HANDLE instead of a plan
  * literal. A literal filter is serialized into every task binary — at
  * sf1 the q54/q78 filters reached ~5.5 MiB and tripped Spark's
  * task-size warning; at 1000 executors x thousands of tasks that is
  * gigabytes of redundant RPC. The broadcast ships the bytes ONCE per
  * executor (BitTorrent-style), and the task carries only the handle.
  * The probe stays a pure bit-test inside whole-stage codegen: the
  * deserialized filter is pinned to an immutable codegen class member,
  * resolved from the executor-local broadcast store at instance init,
  * never per row.
  *
  * Not SQL-registrable (the registry builds from Expression children
  * only) — construct via [[BloomMightContainBc.column]].
  */
case class BloomMightContainBc(
    child: Expression,
    bf: org.apache.spark.broadcast.Broadcast[BloomFilter])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def dataType: DataType = BooleanType

  override def nullable: Boolean = child.nullable

  @transient private lazy val filter: BloomFilter = bf.value

  override protected def nullSafeEval(key: Any): Any =
    filter.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcCls = classOf[org.apache.spark.broadcast.Broadcast[_]].getName
    val bfCls = classOf[BloomFilter].getName
    val ref = ctx.addReferenceObj("bloomBc", bf, bcCls)
    // addMutableState (NOT addImmutableStateIfNotExists): it returns
    // the fresh variable name, and two different broadcast filters in
    // one codegen class must not be deduped onto one member
    val local = ctx.addMutableState(
      bfCls, "graftBloomFilter", v => s"$v = ($bfCls) $ref.value();")
    nullSafeCodeGen(ctx, ev,
      key => s"${ev.value} = $local.mightContainLong($key);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainBc = copy(child = newChild)
}

object BloomMightContainBc {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.GraftColumns

  /** `key` probed against the broadcast filter, as a Column. */
  def column(
      key: Column,
      bf: org.apache.spark.broadcast.Broadcast[BloomFilter]): Column =
    GraftColumns.ofExpr(BloomMightContainBc(GraftColumns.exprOf(key), bf))
}
