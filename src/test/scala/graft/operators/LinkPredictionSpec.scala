package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** Common-neighbor link prediction (q141). The driver hash-matches the
  * wedge self-join oracle; these fixtures pin the statistic on
  * hand-computed graphs: wedge counting, exclusion of existing edges,
  * duplicate-edge sensitivity (why the binding distincts), and the
  * top-k ordering contract.
  */
class LinkPredictionSpec extends SparkSpec {

  private def run(edges: Seq[(Long, Long)], k: Int = 25) = {
    import spark.implicits._
    Corpus.linkPrediction(edges.toDF("a", "b"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  test("square graph: both diagonals predicted with two common neighbors") {
    // 1-2-3-4-1: non-edges (1,3) and (2,4) each share two neighbors
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)))
    assert(got.toSet == Set((1L, 3L, 2L), (2L, 4L, 2L)))
  }

  test("path graph: only the two-hop pair is predicted, existing edges never") {
    val got = run(Seq((1L, 2L), (2L, 3L)))
    assert(got.toSeq == Seq((1L, 3L, 1L)))
  }

  test("star hub: all leaf pairs predicted with cn = 1, ordered by (a, b)") {
    val got = run(Seq((10L, 1L), (10L, 2L), (10L, 3L)).map { case (a, b) =>
      (math.min(a, b), math.max(a, b))
    })
    assert(got.toSeq == Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("counts are per-distinct-neighbor: a repeated edge would double-count") {
    // the operator contract requires DISTINCT edges; feeding a dup
    // shows why the q141 binding calls distinct() first
    val clean = run(Seq((1L, 2L), (2L, 3L)))
    val dup = run(Seq((1L, 2L), (1L, 2L), (2L, 3L)))
    assert(clean.head == ((1L, 3L, 1L)))
    assert(dup.head == ((1L, 3L, 2L))) // inflated — the documented hazard
  }

  test("top-k is a TakeOrderedAndProject, not a global sort") {
    import spark.implicits._
    val df = Corpus.linkPrediction(
      Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b"), 25)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"global sort for top-k:\n$plan")
  }
}
