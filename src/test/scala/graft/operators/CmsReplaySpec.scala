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
}
