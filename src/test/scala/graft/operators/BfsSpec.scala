package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** Multi-source BFS (q135). The driver hash-matches the fixed-depth
  * recursive SQL oracle; these fixtures pin the distance semantics:
  * min-hop over multiple seeds, ties to the nearest seed, the maxHops
  * cutoff, unreachable nodes absent, and early exit at convergence.
  */
class BfsSpec extends SparkSpec {

  private def run(seeds: Seq[Long], edges: Seq[(Long, Long)],
      maxHops: Int): Map[Long, Long] = {
    import spark.implicits._
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    Corpus.bfsHops(seeds.toDF("v"), sym.toDF("src", "dst"), maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  // a path 1-2-3-4-5-6 with a spur 3-7
  private val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (3L, 7L))

  test("hop distances along a path with a spur") {
    val got = run(Seq(1L), path, maxHops = 10)
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      5L -> 4L, 6L -> 5L, 7L -> 3L))
  }

  test("multi-source: distance is min over seeds") {
    val got = run(Seq(1L, 6L), path, maxHops = 10)
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L,
      5L -> 1L, 6L -> 0L, 7L -> 3L))
  }

  test("maxHops truncates: nodes farther than the bound are absent") {
    val got = run(Seq(1L), path, maxHops = 2)
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("disconnected components are unreachable") {
    val got = run(Seq(1L), path ++ Seq((100L, 101L)), maxHops = 10)
    assert(!got.contains(100L) && !got.contains(101L))
  }

  test("a converged BFS equals any deeper unroll (early-exit soundness)") {
    val a = run(Seq(1L), path, maxHops = 6)
    val b = run(Seq(1L), path, maxHops = 50)
    assert(a == b)
  }

  test("cycle: BFS terminates and takes the short way around") {
    val ring = (1L to 6L).map(i => (i, i % 6 + 1))
    val got = run(Seq(1L), ring, maxHops = 10)
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      5L -> 2L, 6L -> 1L))
  }
}
