package graft.operators

import graft.mr.SparkSpec

/** Replayable count-min sketch (q158). The driver hash-matches the full
  * DuckDB replay; these fixtures pin the sketch's defining guarantees —
  * the ONE-SIDED error (an estimate never undercounts) and
  * merge-order/partitioning invariance (the property that makes
  * `groupBy(row, bucket)` a legitimate distributed sketch build).
  */
class CmsReplaySpec extends SparkSpec {

  /** Skewed corpus: one heavy token, a mid tier, and a wide tail (the
    * tail is what forces collisions at width 512 if anything will).
    */
  private def corpus(parts: Int) = {
    import spark.implicits._
    val docs =
      Seq.fill(80)("heavy heavy heavy") ++
        (0 until 60).map(i => s"mid${i % 6} heavy tail$i") ++
        (0 until 400).map(i => s"tail${i} tail${i + 400} x${i * 7}")
    docs.toDF("text").repartition(parts)
  }

  private def estimates(parts: Int): Map[String, (Long, Long)] = {
    val all = Corpus.cmsFreqOf(spark, corpus(parts), Int.MaxValue)
    all.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  test("one-sided guarantee: no token's estimate undercounts") {
    val got = estimates(parts = 4)
    assert(got.nonEmpty)
    got.foreach { case (tok, (exact, est)) =>
      assert(est >= exact, s"token '$tok': est $est < exact $exact")
    }
  }

  test("the heavy hitter surfaces with its exact count reachable") {
    val got = estimates(parts = 4)
    val (exact, est) = got("heavy")
    assert(exact == 80L * 3 + 60)
    assert(est >= exact)
  }

  test("sketch is merge-order invariant: stable under repartitioning") {
    assert(estimates(parts = 1) == estimates(parts = 7))
  }

  /** Three sources: s1/s2 heavily overlapping vocabularies, s3 fully
    * disjoint from both.
    */
  private def innerCorpus = {
    import spark.implicits._
    ((0 until 50).map(i => ("s1", s"shared${i % 20} one$i")) ++
      (0 until 50).map(i => ("s2", s"shared${i % 20} two$i")) ++
      (0 until 50).map(i => ("s3", s"other$i elsewhere$i")))
      .toDF("source", "text").repartition(4)
  }

  private def inner(parts: Int = 4): Map[(String, String), (Long, Long)] = {
    import spark.implicits._
    Corpus.cmsInnerOf(spark, innerCorpus.repartition(parts), exactRider = true)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
  }

  test("inner product is one-sided: the estimate never undercounts") {
    inner().foreach { case (pair, (exact, est)) =>
      assert(est >= exact, s"$pair: est $est < exact $exact")
    }
  }

  test("inner product separates affinity: overlapping pair >> disjoint pairs") {
    val got = inner()
    // s1·s2 exact: 20 shared tokens with counts ~ (50/20 rounded); the
    // point is the ESTIMATE preserves the ordering against s3's zeros
    val (e12, est12) = got(("s1", "s2"))
    assert(e12 > 0 && est12 >= e12)
    Seq(("s1", "s3"), ("s2", "s3")).foreach { p =>
      val (ex, es) = got(p)
      assert(ex == 0L, s"$p exact $ex")
      assert(es < est12, s"$p est $es should be far below the true pair $est12")
    }
  }

  test("inner product is merge-order invariant") {
    assert(inner(parts = 1) == inner(parts = 7))
  }

  test("estimate-only default drops the exact rider but not a single estimate") {
    import spark.implicits._
    val lean = Corpus.cmsInnerOf(spark, innerCorpus)
    assert(lean.columns.toSeq == Seq("src_a", "src_b", "ip_est"))
    val got = lean.as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == inner().map { case (p, (_, est)) => p -> est })
  }
}
