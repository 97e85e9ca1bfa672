package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.DataFrame

/** Fixed-depth k-core peeling (q96). The driver hash-matches the
  * unrolled SQL; these fixtures pin the peel semantics on known
  * graphs — a clique survives intact, a chain peels to nothing, and a
  * clique with a pendant path loses exactly the path (in depth order).
  */
class KCoreSpec extends SparkSpec {

  private def sym(edges: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    (edges ++ edges.map(_.swap)).toDF("src", "dst")
  }

  private def run(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] =
    Corpus.kCorePeel(sym(edges), k, rounds)
      .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("core_degree")).toMap

  test("K5 is its own 3-core: nothing peels, degrees stay 4") {
    val k5 = for { a <- 1L to 5L; b <- (a + 1) to 5L } yield (a, b)
    assert(run(k5, 3, 4) == (1L to 5L).map(_ -> 4L).toMap)
  }

  test("a chain has no 2-core: endpoints peel inward until empty") {
    val chain = (1L to 5L).sliding(2).map(s => (s.head, s.last)).toSeq
    assert(run(chain, 2, 5) == Map.empty)
  }

  test("pendant path peels off a clique, one hop per round") {
    // K4 on 1-4, path 4-10-11
    val g = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)) ++
      Seq((4L, 10L), (10L, 11L))
    // depth 1: 11 (deg 1) and 10 (deg 2) both peel round-by-round at k=3
    val got = run(g, 3, 4)
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(1L) == 3L && got(4L) == 3L)
    // but a single round only strips what is sub-k NOW: node 10 keeps
    // degree 2 < 3, so it goes in round 1 too; 11 also (deg 1)
    assert(run(g, 3, 1) == run(g, 3, 4))
  }

  test("differential vs a driver-side peel on random graphs") {
    val rng = new scala.util.Random(31)
    for (trial <- 1 to 5) {
      val n = 25
      val edges = (for {
        a <- 1L to n.toLong; b <- (a + 1) to n.toLong
        if rng.nextDouble() < 0.2
      } yield (a, b)).toSeq
      val sym = edges ++ edges.map(_.swap)
      for ((k, rounds) <- Seq((2, 3), (3, 4))) {
        var alive = sym.map(_._1).toSet
        for (_ <- 1 to rounds) {
          val deg = sym.filter(e => alive(e._1) && alive(e._2))
            .groupBy(_._1).map { case (v, es) => v -> es.size }
          alive = deg.filter(_._2 >= k).keySet
        }
        val finalDeg = sym.filter(e => alive(e._1) && alive(e._2))
          .groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
        assert(run(edges, k, rounds) == finalDeg,
          s"trial $trial diverged at k=$k rounds=$rounds")
      }
    }
  }

  test("kCoreFull reaches the true core and is invariant to maxRounds") {
    // K4 with a long pendant chain: fixed depth 2 has NOT finished
    // peeling the chain, the fixpoint has — and extra headroom is a
    // no-op once converged
    val g = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)) ++
      Seq((4L, 10L), (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L))
    def full(maxRounds: Int): Map[Long, Long] =
      Corpus.kCoreFull(sym(g), 2, maxRounds)
        .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("core_degree")).toMap
    val core = full(100)
    assert(core.keySet == Set(1L, 2L, 3L, 4L), core)
    assert(core == full(7)) // converged well before either bound
    // chain peels one hop per round at k=2: depth 2 still holds 4-10-11
    val shallow = run(g, 2, 2)
    assert(shallow.keySet != core.keySet)
  }

  test("no forced broadcast hint anywhere in the peel's induced-join plan") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.functions.col
    // round 1's alive set is ALL vertices — a forced broadcast there is
    // the guaranteed-OOM shape at scale, so strategy must be AQE's call.
    // Asserted on the un-executed induced-degree frame (the returned
    // peel result is already collapsed to an InMemoryRelation).
    val g = sym((for { a <- 1L to 6L; b <- (a + 1) to 6L } yield (a, b)).toSeq)
    val alive = g.select(col("src").as("v")).distinct()
    val induced = Corpus.kCoreInduced(g, alive)
    val hinted = induced.queryExecution.optimizedPlan.collect {
      case j: Join if j.hint.leftHint.exists(_.strategy.isDefined) ||
        j.hint.rightHint.exists(_.strategy.isDefined) => j
    }
    assert(hinted.isEmpty,
      s"induced-join plan carries join-strategy hints:\n${induced.queryExecution.optimizedPlan}")
  }

  test("q96 binding converges within its fixed depth at test scale") {
    import spark.implicits._
    // the sf0.01 co-purchase 3-core, pre-extracted once (the binding
    // itself is oracle-checked by the driver; this pins the FIXPOINT
    // claim: one extra round changes nothing at depth 4)
    val hi = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .filter(org.apache.spark.sql.functions.col("l_quantity") >= 49)
      .select(org.apache.spark.sql.functions.col("l_orderkey"),
        org.apache.spark.sql.functions.col("l_partkey"))
    val pairs = LshJoin.boundedBucketPairs(hi, "l_partkey",
      LshJoin.MaxBucket, "l_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val r4 = Corpus.kCorePeel(edges, 3, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r5 = Corpus.kCorePeel(edges, 3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r4.nonEmpty)
    assert(r4 == r5)

    // q112's oracle bet: the FIXPOINT equals the unrolled peel at the
    // oracle's depth — if a fixture change ever slows convergence past
    // Q112OracleRounds, this spec fails before the driver hash does
    val full = Corpus.kCoreFull(edges, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val atOracleDepth = Corpus.kCorePeel(edges, 3, Corpus.Q112OracleRounds)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == atOracleDepth)
    assert(full == r4)
  }
}
