package graft.operators

import graft.mr.SparkSpec

/** Iterative BPE merge training (q114). The driver hash-matches the
  * merge table against the unrolled SQL; these fixtures pin the
  * SEMANTICS on a hand-computed corpus (the Sennrich '16 example
  * family) — greedy leftmost merge application, overlap counting,
  * deterministic tie-breaks — which the oracle equality alone can't
  * distinguish from a shared bug.
  */
class BpeSpec extends SparkSpec {

  private def corpus(rows: Seq[String]) = {
    import spark.implicits._
    rows.toDF("text")
  }

  private def run(rows: Seq[String], merges: Int): Seq[(Long, String, Long)] =
    Curation.bpeMerges(corpus(rows), merges).collect()
      .map(r => (r.getAs[Long]("merge_rank"), r.getAs[String]("pair"),
        r.getAs[Long]("cnt"))).toSeq

  test("hand-computed merge table on the classic low/lower/newest/widest corpus") {
    // freqs: low 5, lower 2, newest 6, widest 3.
    // round 1: "e s" and "s t" tie at 9 -> pair-asc picks "e s"
    // round 2: "es t" 9  round 3: "l o"/"o w" tie at 7 -> "l o"
    // round 4: "lo w" 7  round 5: "e w"/"n e"/"w est" tie at 6 -> "e w"
    val docs = Seq(
      "low low low low low",
      "lower lower",
      "newest newest newest newest newest newest",
      "widest widest widest")
    assert(run(docs, 5) == Seq(
      (1L, "e s", 9L),
      (2L, "es t", 9L),
      (3L, "l o", 7L),
      (4L, "lo w", 7L),
      (5L, "e w", 6L)))
  }

  test("greedy leftmost application: 'aaaa' merges to two 'aa', 'aaa' to one") {
    // round 1 counts: "a a" = 3 (aaaa, overlapping) + 2 (aaa) = 5;
    // application is non-overlapping leftmost, so round 2 sees
    // aaaa -> aa|aa ("aa aa" = 1) and aaa -> aa|a ("aa a" = 1)
    val docs = Seq("aaaa aaa")
    val got = run(docs, 2)
    assert(got.head == ((1L, "a a", 5L)))
    // round 2: tie "aa a" vs "aa aa" at 1 -> "aa a" wins pair-asc
    assert(got(1) == ((2L, "aa a", 1L)))
  }

  test("non-[a-z] words are excluded from the dictionary") {
    val docs = Seq("abc Abc a1c abc!  abc abc")
    val got = run(docs, 1)
    // only the three clean "abc" occurrences count: "b c"/"a b" tie at
    // 3, pair-asc picks "a b"
    assert(got == Seq((1L, "a b", 3L)))
  }

  test("merge table is exhausted gracefully when words go single-symbol") {
    val docs = Seq("ab ab")
    val got = run(docs, 5)
    assert(got == Seq((1L, "a b", 2L))) // one merge possible, then stop
  }

  test("encoder applies the trained merges: token counts shrink, OOV falls back to 1") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low lower Mixed99"),
      (2L, "newest newest"))
    // train on the classic corpus, then encode these docs with the
    // first-5 merge table: e s, es t, l o, lo w, e w (hand-computed)
    val trainDocs = corpus(Seq(
      "low low low low low", "lower lower",
      "newest newest newest newest newest newest", "widest widest widest"))
    val merges = Curation.bpeMerges(trainDocs, 5)
      .collect().map(_.getAs[String]("pair")).toSeq
    val got = Curation.bpeEncode(docs.toDF("doc_id", "text"), merges)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens"))).toSeq
    // low -> "low" (1 sym: l o, lo w); lower -> "low e r" (3);
    // Mixed99 is OOV -> 1. newest -> n ew es t -> with es t: n ew est (3)
    assert(got == Seq((1L, 3L, 1L + 3L + 1L), (2L, 2L, 3L + 3L)))
  }

  test("driver-local merge loop == distributed loop (r20 gate): ties, " +
    "overlap counting, exhaustion, and the over-budget fall-through") {
    def both(rows: Seq[String], merges: Int): Unit = {
      val local = Curation.bpeMerges(corpus(rows), merges).collect()
        .map(_.toString).toSeq
      val dist = Curation.bpeMerges(corpus(rows), merges, localMax = 0L)
        .collect().map(_.toString).toSeq
      assert(local == dist, s"rows=$rows merges=$merges")
    }
    val families = Seq(
      Seq("low low low low low", "lower lower",
        "newest newest newest newest newest newest", "widest widest widest"),
      Seq("aaaa aaa", "abab abab baba"), // overlap counting + ties
      Seq("a b c d e"),                  // exhausts immediately
      Seq("zz zy yz", "yy zy"))
    for (docs <- families; merges <- Seq(1, 5, 10)) both(docs, merges)
  }
}
