package graft.functions

import graft.mr.SparkSpec
import graft.operators.Curation
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** [[AhoCorasick]] / [[MultiPatternCount]]: automaton correctness vs a
  * brute-force position scan (the oracle's semantics), the fail-chain
  * output merge on nested patterns, overlap counting, the non-ASCII
  * reset, null handling through the expression, and the blocklist
  * operator's dense-grid fixture.
  */
class MultiPatternSpec extends SparkSpec {
  import spark.implicits._

  /** The oracle's semantics verbatim: count every start position. */
  private def brute(text: String, p: String): Long =
    (0 to text.length - p.length).count(i => text.regionMatches(i, p, 0, p.length)).toLong

  test("countAll equals the brute-force position scan on random text") {
    val rnd = new scala.util.Random(179)
    val alphabet = "ab "
    val patterns = Array("a", "ab", "b a", "aba", "a a", "bb")
    val ac = new AhoCorasick(patterns)
    (1 to 200).foreach { _ =>
      val text = Seq.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val got = ac.countAll(UTF8String.fromString(text))
      patterns.zipWithIndex.foreach { case (p, i) =>
        assert(got(i) === brute(text, p), s"pattern '$p' on '$text'")
      }
    }
  }

  test("nested patterns both count at the same end position") {
    val ac = new AhoCorasick(Array("able", "table", "ble"))
    val got = ac.countAll(UTF8String.fromString("a table is stable"))
    // "table", "able", "ble" each occur inside both "table" and "stable"
    assert(got.toSeq === Seq(2L, 2L, 2L))
  }

  test("self-overlapping occurrences all count") {
    val ac = new AhoCorasick(Array("a a"))
    assert(ac.countAll(UTF8String.fromString("a a a a")).head === 3L)
  }

  test("non-ASCII characters reset the walk and match nothing") {
    val ac = new AhoCorasick(Array("ab"))
    assert(ac.countAll(UTF8String.fromString("abéab")).head === 2L)
    assert(ac.countAll(UTF8String.fromString("aéb")).head === 0L)
  }

  test("expression: codegen path equals direct evaluation; null in, null out") {
    val pats = Seq("ab", "b a", "zz")
    val ac = new AhoCorasick(pats.toArray)
    val texts = Seq("ab ab a", "b a b a b", "", "zzz")
    val df = (texts.map(Option(_)) :+ Option.empty[String]).toDF("text")
    val rows = df.select(MultiPatternCount.of(col("text"), pats).as("c")).collect()
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(rows(i).getSeq[Long](0) === ac.countAll(UTF8String.fromString(t)).toSeq)
    }
    assert(rows.last.isNullAt(0))
  }

  test("blocklistScan: dense grid, hit counts, and the never-matching pattern") {
    val docs = Seq(
      (1L, "s0", "a table value part scan scan"),
      (2L, "s0", "nothing here"),
      (3L, "s1", null.asInstanceOf[String])).toDF("doc_id", "source", "text")
    val pats = Seq("table", "able", "scan", "zzz never")
    val got = Curation.blocklistScan(docs, pats)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // dense: every (source, pattern) combo present, including all-zero
    assert(got.size === 2 * pats.size)
    assert(got(("s0", "table")) === ((1L, 1L)))
    assert(got(("s0", "able")) === ((1L, 1L)))
    assert(got(("s0", "scan")) === ((1L, 2L)))
    assert(got(("s0", "zzz never")) === ((0L, 0L)))
    assert(got(("s1", "scan")) === ((0L, 0L)))
  }
}
