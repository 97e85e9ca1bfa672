package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.DataFrame

/** Synchronous label propagation (q124). The driver hash-matches the
  * unrolled SQL oracle; these fixtures pin the per-round update rule —
  * simultaneous adoption of the most frequent neighbour label with a
  * min-label tie-break — including the oscillation case that makes
  * fixed-round (not fixpoint) the only well-defined synchronous
  * semantics.
  */
class LpaSpec extends SparkSpec {

  private def sym(edges: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    (edges ++ edges.map(_.swap)).toDF("src", "dst")
  }

  private def run(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    Corpus.labelPropagation(sym(edges), rounds)
      .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("lbl")).toMap

  test("two triangles with a bridge settle into two communities in 4 rounds") {
    // triangle {1,2,3}, triangle {10,11,12}, bridge 3-10; hand-rolled
    // sync rounds give {1,2,3}->1 and {10,11,12}->3 after round 4
    // (label 3 wins side B because the bridge injected it at round 1)
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
    assert(run(g, 4) == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 3L, 11L -> 3L, 12L -> 3L))
  }

  test("intermediate rounds match the hand-computed synchronous trace") {
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
    // round 1: every node adopts the min neighbour id (all votes tie)
    assert(run(g, 1) == Map(
      1L -> 2L, 2L -> 1L, 3L -> 1L, 10L -> 3L, 11L -> 10L, 12L -> 10L))
    // round 2: majorities start to matter — 10 keeps label 10 (two
    // votes from 11,12) against the bridge's single label-1 vote
    assert(run(g, 2) == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 3L, 12L -> 3L))
  }

  test("a single edge oscillates: even rounds restore own labels") {
    // sync LPA on K2 swaps labels every round — the bipartite
    // oscillation from the original paper; fixed-round semantics makes
    // it deterministic instead of divergent
    val g = Seq((100L, 200L))
    assert(run(g, 1) == Map(100L -> 200L, 200L -> 100L))
    assert(run(g, 2) == Map(100L -> 100L, 200L -> 200L))
    assert(run(g, 4) == Map(100L -> 100L, 200L -> 200L))
  }

  test("vote ties break toward the smallest label") {
    // star centre 5 with leaves 6,7: centre sees one vote each for 6
    // and 7 -> adopts 6
    val g = Seq((5L, 6L), (5L, 7L))
    assert(run(g, 1)(5L) == 6L)
  }
}
