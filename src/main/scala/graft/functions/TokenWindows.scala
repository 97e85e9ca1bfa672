package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[TokenWindows]] (separate object so the generated
  * code calls a stable JVM entry point, the [[TokenWindowKeys]]
  * pattern).
  */
object TokenWindows {

  val OutType: ArrayType = ArrayType(StringType, containsNull = false)

  /** Every n-token window STRING of `s`, in window order —
    * byte-identical to `Curation.grams(Curation.tokenize(t), n)`
    * (tokens are maximal runs of non-0x20 bytes — 0x20 never occurs
    * inside a UTF-8 multibyte sequence — joined by single spaces; no
    * partial tail windows), built with ONE normalized byte buffer per
    * document: every window is a contiguous slice of the
    * single-space-joined token text, so the returned UTF8Strings are
    * zero-copy VIEWS into that buffer (O(corpus) bytes built per doc,
    * not O(n·corpus)). `distinct = true` keeps each window's FIRST
    * occurrence only (per-doc distinctness — the census grain; output
    * order is first-occurrence, callers aggregate so order never
    * matters).
    */
  def windows(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val all = s.getBytes
    val nb = all.length
    // token byte ranges in the RAW text
    var cap = 16
    var starts = new Array[Int](cap)
    var lens = new Array[Int](cap)
    var nt = 0
    var i = 0
    while (i < nb) {
      if (all(i) == 0x20) i += 1
      else {
        val st = i
        while (i < nb && all(i) != 0x20) i += 1
        if (nt == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          lens = java.util.Arrays.copyOf(lens, cap)
        }
        starts(nt) = st; lens(nt) = i - st; nt += 1
      }
    }
    val m = nt - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    // normalized single-space-joined token text + each token's offset
    // in it: window p is norm[normOff(p) ..< normOff(p+n-1)+lens(p+n-1)]
    var normLen = nt - 1
    i = 0
    while (i < nt) { normLen += lens(i); i += 1 }
    val norm = new Array[Byte](normLen)
    val normOff = new Array[Int](nt)
    var off = 0
    i = 0
    while (i < nt) {
      if (i > 0) { norm(off) = 0x20; off += 1 }
      normOff(i) = off
      System.arraycopy(all, starts(i), norm, off, lens(i))
      off += lens(i)
      i += 1
    }
    val out = new Array[Any](m)
    var kept = 0
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    var p = 0
    while (p < m) {
      val a = normOff(p)
      val b = normOff(p + n - 1) + lens(p + n - 1)
      val w = UTF8String.fromBytes(norm, a, b - a)
      if (seen == null || seen.add(w)) { out(kept) = w; kept += 1 }
      p += 1
    }
    new GenericArrayData(
      if (kept == m) out
      else java.util.Arrays.copyOfRange(out.asInstanceOf[Array[AnyRef]], 0, kept))
  }

  /** `text`'s n-token window strings as a Column. */
  def of(text: org.apache.spark.sql.Column, n: Int,
      distinct: Boolean = false): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftshim.GraftColumns
    GraftColumns.ofExpr(TokenWindows(GraftColumns.exprOf(text), n, distinct))
  }
}

/** `token_windows(text, n[, distinct])`: every n-token window string,
  * `array<string>` — the STRING-mode (oracle-grain) sibling of
  * [[TokenWindowKeys]]. Exists so the string-keyed ExactSubstr /
  * decontamination operators' window streams run as
  * scan→project→explode inside whole-stage codegen instead of a
  * corpus-scale `Dataset.flatMap` (a deserialize→JVM-iterator→
  * serialize encoder barrier that also blocks fusion with the
  * downstream aggregate's partial hash map — guide §1.2 step 2).
  * TokenWindowsSpec pins byte-equality with the
  * `grams(tokenize(t), n)` iterator on adversarial corpora.
  */
case class TokenWindows(child: Expression, n: Int, distinct: Boolean = false)
    extends UnaryExpression {
  require(n >= 1, s"token_windows: window length must be >= 1, got $n")
  override def dataType: DataType = TokenWindows.OutType
  override protected def nullSafeEval(input: Any): Any =
    TokenWindows.windows(input.asInstanceOf[UTF8String], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenWindows.windows($c, $n, $distinct)")
  override protected def withNewChildInternal(newChild: Expression): TokenWindows =
    copy(child = newChild)
}
