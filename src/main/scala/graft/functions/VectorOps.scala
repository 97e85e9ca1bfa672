package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** JVM kernels shared by the vector expressions' interpreted and
  * generated code paths (plain static methods so codegen can call them
  * directly).
  */
object VectorKernels {

  /** Exact round-half-away-from-zero to BIGINT — the semantics of
    * Spark's `round(double)` followed by a LONG cast (and of DuckDB's
    * `round`), computed on the exact binary value rather than via the
    * `+0.5` trick, whose double rounding can cross a .5 boundary.
    * `a - floor(a)` is exact for the |v| < 2^52 range in play, so the
    * >= 0.5 comparison is exact too.
    */
  def quantRound(v: Double): Long = {
    val a = Math.abs(v)
    val f = Math.floor(a)
    val r = f.toLong + (if (a - f >= 0.5) 1L else 0L)
    if (v < 0) -r else r
  }
}

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

/** `fixed_quantize(v)`: ARRAY<DOUBLE> (FLOAT widens via implicit cast)
  * -> ARRAY<BIGINT> fixed-point quantization, `round(x * 1e6)` half away
  * from zero, as one fused codegen loop.
  *
  * Replaces `transform(v, x -> cast(round(x * 1e6) as bigint))` in the
  * ANN hot path: Spark evaluates higher-order-function lambdas
  * INTERPRETED (per-element Catalyst eval + boxing, the same cost class
  * measured at 13x for q22's trigrams), so the composable form kept
  * every corpus row's quantization outside whole-stage codegen. Value
  * semantics are identical (see [[VectorKernels.quantRound]]), keeping
  * the fixed-point determinism contract with the DuckDB oracle.
  */
case class FixedPointQuantize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))

  /** A null ELEMENT quantizes to a null element (exactly what the
    * `transform(v, x -> cast(round(x*1e6) as bigint))` form this
    * expression replaces produces) — reading it as garbage-zero would
    * silently corrupt the vector. The nullable branch only exists in
    * the generated code when the input type admits nulls.
    */
  private def elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = elementsNullable)

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (elementsNullable) {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i)) out(i) = VectorKernels.quantRound(x.getDouble(i) * 1e6)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    } else {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) { out(i) = VectorKernels.quantRound(x.getDouble(i) * 1e6); i += 1 }
      ArrayData.toArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      if (elementsNullable)
        s"""
           |int $n = $c.numElements();
           |Object[] $out = new Object[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$c.isNullAt($i)) {
           |    $out[$i] = java.lang.Long.valueOf(
           |      graft.functions.VectorKernels.quantRound($c.getDouble($i) * 1e6));
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      else
        s"""
           |int $n = $c.numElements();
           |long[] $out = new long[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = graft.functions.VectorKernels.quantRound($c.getDouble($i) * 1e6);
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FixedPointQuantize =
    copy(child = newChild)
}

/** `sorted_intersect_count(a, b)`: |a ∩ b| of two SORTED-DISTINCT
  * BIGINT arrays as one fused two-pointer walk.
  *
  * The composable form — `size(array_intersect(a, b))` — builds a
  * lookup hash set AND materializes the intersection array per row
  * pair; in the dedup verify joins that is two allocations per
  * CANDIDATE PAIR, the highest-volume row stream of the near-dup
  * operators. With sorted-distinct inputs (the shingle/gram frames
  * are, by construction — see [[graft.operators.Dedup.shingles]]) the
  * count needs no allocation at all, and Jaccard follows as
  * inter / (|a| + |b| - inter) from the same value.
  *
  * CONTRACT: inputs must be sorted ascending and duplicate-free —
  * unsorted input UNDERCOUNTS silently (this is a kernel for the
  * engine's own canonical-form frames, not a general-purpose
  * function; the registration doc says so).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
