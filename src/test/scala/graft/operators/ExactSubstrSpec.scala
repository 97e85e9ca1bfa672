package graft.operators

import graft.mr.SparkSpec

/** q208 — cross-document exact-substring duplication census (the
  * ExactSubstr dedup signal, Lee et al. '21). Fixtures pin the window
  * semantics the DuckDB oracle then re-checks at driver SF: per-doc
  * distinct windows, corpus-wide (cross-source) doc frequency, the
  * >=2-docs duplication rule, and the deterministic top tiebreak.
  */
class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  private val L = Curation.ExactSubstrL

  private def run(rows: Seq[(String, Long, String)]) =
    Curation.exactSubstrOf(rows.toDF("source", "doc_id", "text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  // 16 distinct filler tokens keyed on a tag — no window of one filler
  // ever repeats in another (tags differ), and doc_ids stay off the
  // %17 plant to isolate the semantics under test
  private def filler(tag: String): String =
    (1 to 16).map(i => s"f$tag$i").mkString(" ")

  private val span = (1 to L).map(i => s"shared$i").mkString(" ") // one exact window

  test("a span shared by two docs in DIFFERENT sources is duplicated in both") {
    val got = run(Seq(
      ("a", 1L, s"${filler("a")} $span ${filler("b")}"),
      ("b", 2L, s"${filler("c")} $span ${filler("d")}"),
      ("c", 3L, filler("e"))))
    // exactly the interior window is shared; straddling windows differ
    assert(got("a")._2 == 1L && got("b")._2 == 1L, s"n_dup_windows: $got")
    assert(got("a")._3 == 1L && got("b")._3 == 1L) // each carries df=1 mass
    assert(got("c")._2 == 0L)
  }

  test("a window repeated INSIDE one doc only is not duplicated (per-doc distinct)") {
    val got = run(Seq(
      ("a", 1L, s"$span $span"), // twice in the same doc
      ("b", 2L, filler("z"))))
    // the doubled span creates dup windows ONLY if straddling windows
    // collide; the pure repeat of the same window dedups to df=1.
    // "$span $span" = 2L tokens -> windows at offsets 0..L; offset 0
    // and offset L are the SAME window string (the span) -> distinct
    // -> df=1 -> but offsets 1..L-1 straddle and each occurs once.
    val expectedDup = 0L
    assert(got("a")._2 == expectedDup, s"got $got")
  }

  test("three docs sharing a span: dup mass counts all three, max_docs = 3, tiebreak lexicographic") {
    val rows = Seq(
      ("a", 1L, s"${filler("a")} $span"),
      ("a", 2L, s"${filler("b")} $span"),
      ("b", 3L, s"${filler("c")} $span"))
    val df = Curation.exactSubstrOf(rows.toDF("source", "doc_id", "text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.get(4), r.getString(5)))).toMap
    // source a: the span window occurs in 2 of its docs -> mass 2
    assert(df("a")._1 == 1L && df("a")._2 == 2L)
    assert(df("b")._1 == 1L && df("b")._2 == 1L)
    assert(df("a")._3 == 3L && df("b")._3 == 3L) // corpus-wide doc count
    assert(df("a")._4 == span && df("b")._4 == span)
  }

  test("the %17 plant makes planted docs share exactly the interior plant windows") {
    val got = run(Seq(
      ("a", 0L, filler("a")),   // planted (0 % 17 == 0)
      ("b", 17L, filler("b")),  // planted
      ("c", 5L, filler("c")))) // not planted
    val plantTokens = 10 // the fixed global sentence
    val interior = (plantTokens - L + 1).toLong
    assert(got("a")._2 == interior && got("b")._2 == interior, s"got $got")
    assert(got("c")._2 == 0L)
  }

  test("documents shorter than L tokens contribute no windows and no null crashes") {
    val got = run(Seq(
      ("a", 1L, "too short"),
      ("b", 2L, null.asInstanceOf[String]),
      ("c", 3L, filler("x"))))
    assert(!got.contains("a") && !got.contains("b")) // no windows at all
    assert(got("c")._1 == 16L - L + 1L) // 16 tokens -> 9 windows
  }
}
