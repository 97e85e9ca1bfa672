package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The driver-local graph solves (r20 optimization round) must be
  * bit-equal to the distributed loops they shortcut — CC min-label
  * union-find vs pointer doubling, local PageRank/HITS integer
  * dynamics vs the Catalyst expressions — and the budget gate must
  * route over-budget graphs to the distributed path untouched.
  */
class GraphLocalSpec extends SparkSpec {

  private def det(df: DataFrame, cols: String*): Seq[String] =
    df.orderBy(cols.map(col): _*).collect().map(_.toString).toSeq

  /** Deterministic pseudo-random graph: ~n nodes, m edges from a mixed
    * congruence so components of several sizes and shapes appear.
    */
  private def randomGraph(n: Int, m: Int, seed: Long): (DataFrame, DataFrame) = {
    import spark.implicits._
    val nodes = (0 until n).map(_.toLong).toDF("p")
    val edges = (0 until m).map { i =>
      val a = ((i * 2654435761L + seed) % n + n) % n
      val b = ((i * 40503L + seed * 7919L) % n + n) % n
      (a, b)
    }.toDF("src", "dst")
    (nodes, edges)
  }

  test("ccLocal == ccDistributed on random graphs (incl. singletons)") {
    for (seed <- Seq(1L, 17L)) {
      val (nodes, edges) = randomGraph(60, 45, seed)
      val sym = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
      val localOut = Corpus.ccLocal(nodes, sym, maxRows = 1000000L)
      assert(localOut.isDefined, "graph under budget must take the local path")
      assert(det(localOut.get, "p") == det(Corpus.ccDistributed(nodes, sym), "p"))
    }
  }

  test("ccLocal bridge corner: an endpoint absent from nodes conducts " +
    "connectivity but never labels or emits") {
    import spark.implicits._
    // 1 - 99 - 2: node 99 not in the node set; 1 and 2 must merge to 1
    val nodes = Seq(1L, 2L, 3L).toDF("p")
    val edges = Seq((1L, 99L), (99L, 1L), (99L, 2L), (2L, 99L)).toDF("src", "dst")
    val out = Corpus.ccLocal(nodes, edges, 1000L).get.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 3L), s"got $out")
  }

  test("pageRankLocal == pageRankDistributed (integer dynamics bit-equal)") {
    val (nodes, edges) = randomGraph(50, 80, 23L)
    val sym = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
    val localOut = Corpus.pageRankLocal(nodes, sym, Corpus.PageRankIterations, 1000000L)
    assert(localOut.isDefined)
    assert(det(localOut.get, "p") ==
      det(Corpus.pageRankDistributed(nodes, sym, Corpus.PageRankIterations), "p"))
  }

  test("hitsLocal == hitsDistributed (renorm and interleave bit-equal)") {
    import spark.implicits._
    val edges = (0 until 120).map { i =>
      ((i * 2654435761L % 13 + 13) % 13, (i * 40503L % 29 + 29) % 29)
    }.distinct.toDF("c", "p")
    val localOut = Corpus.hitsLocal(edges, Corpus.HitsIterations, 1000000L)
    assert(localOut.isDefined)
    assert(det(localOut.get, "l_partkey") ==
      det(Corpus.hitsDistributed(edges, Corpus.HitsIterations), "l_partkey"))
  }

  test("budget gate: over-budget graphs return None and the public entry " +
    "points fall through to the distributed loop") {
    val (nodes, edges) = randomGraph(40, 30, 5L)
    val sym = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
    assert(Corpus.ccLocal(nodes, sym, maxRows = 10L).isEmpty)
    assert(Corpus.pageRankLocal(nodes, sym, 2, 10L).isEmpty)
    assert(Corpus.hitsLocal(sym.select(col("src").as("c"), col("dst").as("p")), 2, 10L).isEmpty)
    assert(Corpus.takeBounded(nodes.select(col("p"), col("p")), 0L).isEmpty,
      "budget 0 must disable the local path outright")
    // the gated entry points still produce the same answer over budget
    assert(det(Corpus.connectedComponents(nodes, sym, localMax = 10L), "p") ==
      det(Corpus.connectedComponents(nodes, sym), "p"))
  }

  test("kCoreLocal == kCoreLoop in peel AND fixpoint modes (incl. " +
    "duplicate-edge weighting and the zero-surviving-neighbor drop)") {
    import spark.implicits._
    for (seed <- Seq(3L, 29L)) {
      val (_, edges) = randomGraph(40, 70, seed)
      // duplicate rows on purpose: degree counts edge ROWS
      val sym = edges
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
        .union(edges.limit(5))
      for ((rounds, fix) <- Seq((3, false), (1000, true))) {
        val localOut = Corpus.kCoreLocal(sym, k = 2, rounds, fix, 1000000L)
        assert(localOut.isDefined, "graph under budget must take the local path")
        assert(det(localOut.get, "v") ==
          det(Corpus.kCoreLoop(sym, 2, rounds, fix), "v"))
      }
    }
    assert(Corpus.kCoreLocal(Seq((1L, 2L)).toDF("src", "dst"),
      2, 3, toFixpoint = false, maxRows = 0L).isEmpty,
      "budget 0 must disable the local path outright")
  }

  test("lpaLocal == lpaDistributed (vote counts, min-label tie-break)") {
    for (seed <- Seq(7L, 41L)) {
      val (_, edges) = randomGraph(36, 60, seed)
      val sym = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
      for (rounds <- Seq(1, Corpus.Q124LpaRounds)) {
        val localOut = Corpus.lpaLocal(sym, rounds, 1000000L)
        assert(localOut.isDefined)
        assert(det(localOut.get, "v") ==
          det(Corpus.lpaDistributed(sym, rounds), "v"))
      }
    }
  }

  test("bfsLocal == bfsDistributed (multi-seed, early exit, " +
    "duplicate-seed multiplicity at hop 0)") {
    import spark.implicits._
    for (seed <- Seq(11L, 53L)) {
      val (_, edges) = randomGraph(48, 40, seed)
      val sym = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
      // duplicate seed row 0 on purpose: hop-0 multiplicity must survive
      val seeds = Seq(0L, 0L, 5L, 200L).toDF("v") // 200 isolated: stays hop 0
      for (maxHops <- Seq(0, 2, 9)) {
        val localOut = Corpus.bfsLocal(seeds, sym, maxHops, 1000000L)
        assert(localOut.isDefined)
        assert(det(localOut.get, "v", "hop") ==
          det(Corpus.bfsDistributed(seeds, sym, maxHops), "v", "hop"))
      }
    }
  }
}
