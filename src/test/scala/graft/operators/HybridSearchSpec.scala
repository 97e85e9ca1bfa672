package graft.operators

import graft.mr.SparkSpec

/** Hybrid retrieval (q81): the fused ranking is internally consistent —
  * score is exactly the 0.5/0.5 fusion of its own jaccard and cosine
  * columns, ranks are dense per probe, and the top-5 cut respects the
  * (score desc, doc_id) order.
  */
class HybridSearchSpec extends SparkSpec {

  test("q81 fuses its own signal columns and ranks densely per probe") {
    val rows = Similarity.q81HybridSearch(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      val c = r.getAs[Double]("cosine")
      assert(r.getAs[Double]("score") == 0.5 * j + 0.5 * c)
      assert(j >= 0.0 && j <= 1.0)
      assert(c >= -1.0 && c <= 1.0)
    }
    rows.groupBy(_.getAs[Long]("probe_id")).foreach { case (p, rs) =>
      val ranks = rs.map(_.getAs[Long]("rnk")).sorted.toSeq
      assert(ranks == (1L to rs.length), s"probe $p ranks: $ranks")
      assert(rs.length <= 5)
      // ranks follow score desc (ties broken by doc_id asc)
      val byRank = rs.sortBy(_.getAs[Long]("rnk"))
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          val sa = a.getAs[Double]("score"); val sb = b.getAs[Double]("score")
          assert(sa > sb || (sa == sb && a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
        case _ => ()
      }
    }
  }

  test("re-ranking changes the order lexical ranking alone would give") {
    // not guaranteed for every corpus, but on the test data at least
    // one probe's top-5 must differ from its pure-lexical top-5 —
    // otherwise the cosine stage is a no-op and the fusion is vacuous
    val hybrid = Similarity.q81HybridSearch(spark, "/root/testdata/sf0.001")
      .collect().groupBy(_.getAs[Long]("probe_id"))
      .map { case (p, rs) => p -> rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Long]("doc_id")).toSeq }
    val lexical = Dedup.ngramScoredPairs(spark, "/root/testdata/sf0.001")
      .collect().groupBy(_.getAs[Long]("probe_id"))
      .map { case (p, rs) =>
        p -> rs.sortBy(r => (-r.getAs[Double]("jaccard"), r.getAs[Long]("doc_id")))
          .map(_.getAs[Long]("doc_id")).take(5).toSeq
      }
    assert(hybrid.keys.exists(p => hybrid(p) != lexical.getOrElse(p, Seq.empty)))
  }
}
