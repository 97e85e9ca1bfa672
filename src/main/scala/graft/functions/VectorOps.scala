package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `fixed_dot(a, b)`: dot product of two BIGINT arrays (the engine's
  * fixed-point quantized embeddings) as a single fused codegen loop.
  *
  * The composable form — `aggregate(zip_with(a, b, *), 0, +)` — builds an
  * intermediate product array per row pair; on an ANN scoring join that
  * is an allocation per candidate pair. This expression is the fused
  * kernel: one pass, no allocation, whole-stage-codegen friendly.
  *
  * Typing: `ImplicitCastInputTypes` makes a non-castable-to-ARRAY<BIGINT>
  * argument an analysis-time error while still letting Catalyst widen
  * e.g. ARRAY<INT> inputs. Ragged (different-length) arrays are a
  * runtime error: a dot product over mismatched dimensions has no
  * meaning, and silently truncating to the shorter length would return a
  * plausible-but-wrong score.
  */
case class FixedPointDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // (typed Seq[DataType]: the parent's AbstractDataType is private[sql],
  // and Seq is covariant so the concrete subtype satisfies the override)
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) {
      throw new IllegalArgumentException(
        s"fixed_dot: dimension mismatch (${n} vs ${y.numElements()})")
    }
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "fixed_dot: dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FixedPointDot =
    copy(left = newLeft, right = newRight)
}
