package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** Exact prefix-filtered all-pairs similarity join (q88). The driver
  * hash-matches a brute-force DuckDB oracle; these fixtures pin the
  * prefix filter's COMPLETENESS (its only failure mode is silently
  * dropping a true pair) via a randomized differential against the
  * unfiltered quadratic join, plus boundary semantics at exactly-t.
  */
class AllPairsSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def run(rows: Seq[(Long, String)], t: Double): Set[(Long, Long)] =
    Dedup.allPairsJaccard(docs(rows), t)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet

  /** Quadratic ground truth on driver-side gram sets. */
  private def brute(rows: Seq[(Long, String)], t: Double): Set[(Long, Long)] = {
    def grams(s: String): Set[String] =
      s.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val g = rows.map { case (id, s) => id -> grams(s) }.filter(_._2.nonEmpty)
    (for {
      (a, ga) <- g; (b, gb) <- g
      if a < b
      j = (ga & gb).size.toDouble / (ga | gb).size
      if j >= t
    } yield (a, b)).toSet
  }

  test("verbatim and near-verbatim duplicates are found; unrelated are not") {
    val corpus = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "the quick brown fox jumps over the lazy dog again and again", // verbatim
      3L -> "the quick brown fox jumps over the lazy cat again and again", // near
      4L -> "completely different content with no shared trigrams at all here")
    val got = run(corpus, 0.5)
    assert(got.contains((1L, 2L)) && got.contains((1L, 3L)) && got.contains((2L, 3L)))
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("pairs at exactly the threshold are kept") {
    // two docs, gram sets of size 4 and 4 with intersection 4... craft
    // j == 0.5: |A|=3, |B|=3, inter=2 -> 2/4 = 0.5
    val a = "w1 w2 w3 w4 w5"        // grams: (w1w2w3)(w2w3w4)(w3w4w5)
    val b = "w2 w3 w4 w5 w6"        // grams: (w2w3w4)(w3w4w5)(w4w5w6) -> inter 2, union 4
    val got = Dedup.allPairsJaccard(docs(Seq(1L -> a, 2L -> b)), 0.5).collect()
    assert(got.length == 1 && got.head.getAs[Double]("jaccard") == 0.5)
  }

  test("differential vs quadratic brute force on a randomized corpus") {
    val rng = new scala.util.Random(13)
    val vocab = Array("aa", "bb", "cc", "dd", "ee")
    def doc(): String = Seq.fill(6 + rng.nextInt(8))(vocab(rng.nextInt(vocab.length))).mkString(" ")
    val corpus = (1L to 50L).map(i => i -> doc())
    for (t <- Seq(0.3, 0.5, 0.8))
      assert(run(corpus, t) == brute(corpus, t), s"prefix filter lost pairs at t=$t")
  }

  test("q98 flow matrix conserves q88's pair count and canonicalizes source order") {
    val d = "/root/testdata/sf0.01"
    val flows = Dedup.q98DupFlow(spark, d).collect()
    assert(flows.map(_.getAs[Long]("n_pairs")).sum == Dedup.q88AllPairs(spark, d).count())
    assert(flows.forall(r =>
      r.getAs[String]("source_a") <= r.getAs[String]("source_b")))
  }

  test("q88 binding finds the corpus's planted exact duplicates") {
    val rows = Dedup.q88AllPairs(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("a") < r.getAs[Long]("b")))
    assert(rows.forall(r => r.getAs[Double]("jaccard") >= 0.5))
  }
}
