package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-pattern substring counting (Aho & Corasick,
  * CACM 1975), the one-pass engine behind the blocklist scan: counting
  * occurrences of P patterns costs ONE automaton walk over the text —
  * O(len + matches) — where the regex route costs P independent scans
  * (and a union regex loses the per-pattern counts). The automaton is
  * the full DFA (goto + fail links collapsed into a dense transition
  * table at build time), so the per-character step is one array load,
  * and match emission walks a PRE-MERGED output list per state (each
  * state's outputs include every pattern ending on its suffix-link
  * chain — nested patterns like "able" inside "table" both count at
  * the same position with zero extra walking).
  *
  * Patterns are restricted to non-empty ASCII: the transition table is
  * dense over the 7-bit alphabet, and any char >= 128 provably matches
  * no pattern so the walk resets to the root. ASCII patterns also keep
  * the DuckDB oracle exact — occurrence counts are independent of the
  * UTF-16 (JVM) vs code-point (DuckDB) position numbering as long as no
  * pattern can straddle a surrogate pair, which ASCII guarantees.
  * Counts are OVERLAPPING occurrences (every start position counts:
  * "a a a" contains "a a" twice), the natural automaton semantics and
  * the one the oracle replays positionally.
  */
final class AhoCorasick(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "at least one pattern")
  require(patterns.forall(p => p.nonEmpty && p.forall(_ < 128)),
    "patterns must be non-empty ASCII")

  /** trans: dense DFA transition table, trans(state*128 + char) = next
    * state; out: per-state merged pattern-id output lists.
    */
  private val (trans: Array[Int], out: Array[Array[Int]]) = {
    // 1. raw trie (child = -1 where absent), pattern ids at end nodes
    val maxNodes = patterns.map(_.length).sum + 1
    val child = Array.fill(maxNodes * 128)(-1)
    val ends = Array.fill(maxNodes)(List.empty[Int])
    var nNodes = 1
    patterns.indices.foreach { pid =>
      var u = 0
      patterns(pid).foreach { c =>
        if (child(u * 128 + c) == -1) { child(u * 128 + c) = nNodes; nNodes += 1 }
        u = child(u * 128 + c)
      }
      ends(u) ::= pid
    }
    // 2. BFS: collapse fail links into full transitions; merge each
    // state's outputs with its fail state's (already-merged) outputs
    val t = new Array[Int](nNodes * 128)
    val fail = new Array[Int](nNodes)
    val outArr = new Array[Array[Int]](nNodes)
    outArr(0) = Array.empty
    val queue = new java.util.ArrayDeque[Integer]()
    var c = 0
    while (c < 128) {
      val v = child(c)
      if (v != -1) { fail(v) = 0; t(c) = v; queue.add(v) } else t(c) = 0
      c += 1
    }
    while (!queue.isEmpty) {
      val u: Int = queue.poll()
      outArr(u) = (ends(u) ++ outArr(fail(u)).toList).toArray
      var c = 0
      while (c < 128) {
        val v = child(u * 128 + c)
        if (v != -1) { fail(v) = t(fail(u) * 128 + c); t(u * 128 + c) = v; queue.add(v) }
        else t(u * 128 + c) = t(fail(u) * 128 + c)
        c += 1
      }
    }
    (t, outArr)
  }

  /** Occurrence count per pattern over one automaton pass. */
  def countAll(s: UTF8String): Array[Long] = {
    val t = s.toString
    val counts = new Array[Long](patterns.length)
    var st = 0
    var i = 0
    while (i < t.length) {
      val ch = t.charAt(i)
      st = if (ch < 128) trans(st * 128 + ch) else 0
      val o = out(st)
      var j = 0
      while (j < o.length) { counts(o(j)) += 1; j += 1 }
      i += 1
    }
    counts
  }
}

/** `multi_pattern_count(text)`: per-pattern overlapping occurrence
  * counts as `array<bigint>` (index = pattern position in the
  * constructor list). The automaton rides the plan as a reference
  * object — built once on the driver, shipped once per task binary
  * (node-count·128 ints, kilobytes for a real blocklist), and the
  * per-row walk stays inside whole-stage codegen.
  */
case class MultiPatternCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val ac = new AhoCorasick(patterns.toArray)

  override protected def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(ac.countAll(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", ac, classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($ref.countAll($c))")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternCount =
    copy(child = newChild)
}

object MultiPatternCount {
  /** Column-API constructor (the patterns live outside the Expression
    * tree, so this goes through the graftshim bridge like the Bloom
    * broadcast probe).
    */
  def of(text: Column, patterns: Seq[String]): Column = {
    import org.apache.spark.sql.graftshim.GraftColumns
    GraftColumns.ofExpr(MultiPatternCount(GraftColumns.exprOf(text), patterns))
  }
}
