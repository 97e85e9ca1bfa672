package graft.operators

import graft.mr.SparkSpec

/** Path-equality pinning for the q22 probe engine: the zero-shuffle
  * closure probe and the join-shaped inverted probe (the auto-switch
  * target once the closure payload would trip Spark's per-task size
  * warning, the sf1 sweep's 15.5 MiB flag) must produce the identical
  * (probe_id, doc_id, jaccard) set — same filtered vocabulary, same
  * integer intersection counts, same one-double division.
  */
class NgramPathSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def rows(budget: Long): Set[(Long, Long, Double)] =
    Dedup.ngramScoredPairs(spark, sf, closureBudget = budget)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("closure probe == join-shaped inverted probe, bit for bit") {
    val viaClosure = rows(Long.MaxValue) // forced inline path
    val viaJoin = rows(0L)               // forced join path
    assert(viaClosure.nonEmpty)
    assert(viaClosure == viaJoin)
  }

  test("default budget keeps the driver corpus on the closure path") {
    // the sf0.001/0.01 corpora are far under the ~900 KiB payload
    // ceiling — the switch exists for sf1-and-up probe/hot-set growth
    assert(rows(Dedup.ProbeClosureBudgetBytes) == rows(Long.MaxValue))
  }
}
