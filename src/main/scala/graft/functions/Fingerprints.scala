package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp-Rabin rolling-hash document fingerprints (mod 2^61-1), exposed
  * as native Catalyst expressions so the hot loop stays inside
  * whole-stage codegen (no Dataset-map deserialization barrier, no UDF
  * boxing): the generated code calls the static JVM helpers below
  * directly per row. The min-window variant is the local-fingerprint
  * idea behind winnowing (Schleimer, Wilkerson, Aiken, "Winnowing:
  * Local Algorithms for Document Fingerprinting", SIGMOD 2003).
  */
object Fingerprints {

  final val Mod: Long = (1L << 61) - 1
  final val Base: Long = 1000003L
  final val WindowK: Int = 16

  /** (a*b) mod (2^61-1) via 128-bit split multiply; a, b in [0, Mod). */
  def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    val part = (hi << 3) | (lo >>> 61)
    val res = (lo & Mod) + part
    val r2 = (res & Mod) + (res >>> 61)
    if (r2 >= Mod) r2 - Mod else r2
  }

  /** Full-document polynomial hash. */
  def full(s: UTF8String): Long = {
    val t = s.toString
    var h = 0L
    var i = 0
    while (i < t.length) {
      h = (mulMod(h, Base) + t.charAt(i).toLong) % Mod
      i += 1
    }
    h
  }

  /** Minimum [[WindowK]]-gram window hash (winnowing-style local
    * fingerprint for containment detection). Falls back to the full hash
    * for texts shorter than the window.
    */
  def minWindow(s: UTF8String): Long = {
    val t = s.toString
    val n = t.length
    if (n < WindowK) return full(s)
    var pow = 1L // Base^(WindowK-1)
    var j = 0
    while (j < WindowK - 1) { pow = mulMod(pow, Base); j += 1 }
    var win = 0L
    var minWin = Long.MaxValue
    var i = 0
    while (i < n) {
      win = (mulMod(win, Base) + t.charAt(i).toLong) % Mod
      if (i >= WindowK) {
        val out = t.charAt(i - WindowK).toLong
        win = (win - mulMod(mulMod(out, pow), Base) % Mod + 2 * Mod) % Mod
      }
      if (i >= WindowK - 1 && win < minWin) minWin = win
      i += 1
    }
    minWin
  }
}

/** `rolling_fingerprint(text)`: 61-bit whole-document hash. */
case class RollingFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    Fingerprints.full(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fingerprints.full($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

/** `min_window_fingerprint(text)`: minimum 16-gram window hash. */
case class MinWindowFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    Fingerprints.minWindow(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fingerprints.minWindow($c)")
  override protected def withNewChildInternal(newChild: Expression): MinWindowFingerprint =
    copy(child = newChild)
}

object FingerprintFunctions {
  /** Registers the engine's native expressions (`rolling_fingerprint`,
    * `min_window_fingerprint`, `fixed_dot`) for `expr(...)`/SQL use in
    * the given session (idempotent; GraftExtensions does the same at
    * session build time).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "rolling_fingerprint", es => RollingFingerprint(es.head), "built-in")
    reg.createOrReplaceTempFunction(
      "min_window_fingerprint", es => MinWindowFingerprint(es.head), "built-in")
    reg.createOrReplaceTempFunction(
      "fixed_dot", es => FixedPointDot(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "fixed_quantize", es => FixedPointQuantize(es.head), "built-in")
    reg.createOrReplaceTempFunction(
      "bloom_might_contain", es => BloomMightContain(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "luhn_valid", es => LuhnValid(es.head), "built-in")
    reg.createOrReplaceTempFunction(
      "sorted_intersect_count", es => SortedIntersectCount(es(0), es(1)), "built-in")
  }
}
