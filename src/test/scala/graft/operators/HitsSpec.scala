package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions.col

/** HITS hubs/authorities (q166). The driver hash-matches the unrolled
  * DuckDB replay; these fixtures pin the dynamics against an
  * independently-written in-memory reference and the defining ordering
  * property (heavier hub endorsement ⟹ higher authority).
  */
class HitsSpec extends SparkSpec {

  /** Straight-line reference: T authority updates, T−1 hub updates,
    * max-renormalization, truncating division.
    */
  private def reference(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = Corpus.HitsScale
    val hubs = edges.map(_._1).distinct
    var h = hubs.map(_ -> s).toMap
    var a = Map.empty[Long, Long]
    for (k <- 1 to Corpus.HitsIterations) {
      val ar = edges.groupBy(_._2).view
        .mapValues(_.map { case (c, _) => h(c) }.sum).toMap
      val am = math.max(ar.values.max, 1L)
      a = ar.view.mapValues(v => v * s / am).toMap
      if (k < Corpus.HitsIterations) {
        val hr = edges.groupBy(_._1).view
          .mapValues(_.map { case (_, p) => a(p) }.sum).toMap
        val hm = math.max(hr.values.max, 1L)
        h = hr.view.mapValues(v => v * s / hm).toMap
      }
    }
    a
  }

  private def run(edges: Seq[(Long, Long)], parts: Int = 4): Map[Long, Long] = {
    import spark.implicits._
    Corpus.hits(edges.toDF("c", "p").repartition(parts))
      .select(col("l_partkey"), col("auth_fp"))
      .as[(Long, Long)].collect().toMap
  }

  /** Star-ish bipartite graph with asymmetric endorsement. */
  private def fixture: Seq[(Long, Long)] = Seq(
    (1L, 10L), (1L, 11L), (1L, 12L), // big hub
    (2L, 10L), (2L, 11L),
    (3L, 10L), // p10: endorsed by all three hubs
    (4L, 13L)) // isolated pair

  test("engine matches the independent in-memory reference exactly") {
    assert(run(fixture) == reference(fixture))
  }

  test("authority ordering follows hub-weighted endorsement") {
    val a = run(fixture)
    // p10 (3 hubs) > p11 (2 hubs) > p12 (1 big hub) > nothing; p13's
    // lone hub is weak (its only part), but p13 is its own max cluster
    assert(a(10L) > a(11L) && a(11L) > a(12L), a)
    assert(a(10L) == Corpus.HitsScale) // the renormalization pin
  }

  test("result is partitioning-invariant") {
    assert(run(fixture, parts = 1) == run(fixture, parts = 7))
  }
}
