package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.DataFrame

/** Fixed-point PageRank (q73). The driver hash-matches the unrolled
  * DuckDB oracle; these fixtures pin the arithmetic against an
  * independently-written in-memory reference and the structural
  * invariants (isolated nodes, symmetry, partition invariance).
  */
class PageRankSpec extends SparkSpec {

  private def nodesDF(ps: Seq[Long]): DataFrame = {
    import spark.implicits._
    ps.toDF("p")
  }
  private def edgesDF(es: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    es.toDF("src", "dst")
  }

  /** Reference: same integer recurrence, plain Scala maps. */
  private def ref(
      nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> Corpus.PrScale).toMap
    for (_ <- 1 to iters) {
      val cs = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / deg(s) }.sum).toMap
      r = nodes.map(p => p -> (150000L + 85L * cs.getOrElse(p, 0L) / 100L)).toMap
    }
    r
  }

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    Corpus.pageRank(nodesDF(nodes), edgesDF(edges))
      .collect().map(r => r.getAs[Long]("p") -> r.getAs[Long]("rank_fp")).toMap

  test("matches the integer reference on a star graph (hub outranks leaves)") {
    val nodes = Seq(1L, 2L, 3L, 4L)
    // star: 1 <-> {2,3,4}, symmetric
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 1L), (3L, 1L), (4L, 1L))
    val got = run(nodes, edges)
    assert(got == ref(nodes, edges, Corpus.PageRankIterations))
    assert(got(1L) > got(2L)) // the hub accumulates rank
    assert(got(2L) == got(3L) && got(3L) == got(4L)) // leaves symmetric
  }

  test("isolated nodes settle at the damping base; chain matches reference") {
    val nodes = Seq(1L, 2L, 3L, 9L) // 9 is isolated
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    val got = run(nodes, edges)
    assert(got == ref(nodes, edges, Corpus.PageRankIterations))
    assert(got(9L) == 150000L)
    assert(got(2L) > got(1L)) // the middle of the chain is central
  }

  test("result is partition-invariant") {
    val nodes = (1L to 30L)
    val edges = (1L until 30L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val a = run(nodes, edges)
    val b = Corpus.pageRank(nodesDF(nodes).repartition(7), edgesDF(edges).repartition(11))
      .collect().map(r => r.getAs[Long]("p") -> r.getAs[Long]("rank_fp")).toMap
    assert(a == b)
    assert(a == ref(nodes, edges, Corpus.PageRankIterations))
  }

  test("deep runs still match the reference (lineage truncation is semantics-free)") {
    val nodes = (1L to 12L)
    val edges = (1L until 12L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val got = Corpus.pageRank(nodesDF(nodes), edgesDF(edges), iterations = 30)
      .collect().map(r => r.getAs[Long]("p") -> r.getAs[Long]("rank_fp")).toMap
    assert(got == ref(nodes, edges, 30))
  }

  test("plan size is independent of iteration count (per-round truncation)") {
    // without the in-loop localCheckpoint the rank plan deepens every
    // round and a long run pays quadratic planning; truncation makes the
    // returned frame's plan the same size whatever the depth
    val nodes = (1L to 8L)
    val edges = (1L until 8L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    def planSize(iters: Int): Int =
      Corpus.pageRank(nodesDF(nodes), edgesDF(edges), iterations = iters)
        .queryExecution.analyzed.collect { case n => n }.size
    assert(planSize(2) == planSize(20))
  }

  test("q73 runs on the test data with sane shape") {
    val rows = Corpus.q73PageRank(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("rank_fp") >= 150000L)
      assert(r.getAs[Long]("degree") >= 0L)
    }
  }
}
