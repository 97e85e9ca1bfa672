package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree-oriented triangle counting (q85). The driver hash-matches the
  * naive three-way-join oracle at sf0.01; these fixtures pin the
  * orientation argument itself: every triangle is seen exactly once
  * (never zero, never double), on graphs chosen to stress the
  * orientation — cliques (max triangles), stars (zero triangles from a
  * hub), and a randomized differential against the naive enumeration.
  */
class TriangleSpec extends SparkSpec {

  private def edgeDf(edges: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("a", "b")
  }

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Corpus.triangleCounts(edgeDf(edges))
      .collect().map(r => r.getAs[Long]("p") -> r.getAs[Long]("n_triangles")).toMap

  test("K4: every node sits in C(3,2) = 3 triangles") {
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    assert(counts(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("star hub has many wedges but zero triangles") {
    val star = (2L to 20L).map(i => (1L, i))
    assert(counts(star) == Map.empty)
  }

  test("square plus one diagonal: two triangles sharing the diagonal") {
    // 1-2-3-4-1 plus 1-3: triangles {1,2,3} and {1,3,4}
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))
    assert(counts(g) == Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("differential vs naive enumeration on a random graph (fixed seed)") {
    val rng = new scala.util.Random(7)
    val n = 40
    val edges = (for {
      a <- 1L to n.toLong; b <- (a + 1) to n.toLong
      if rng.nextDouble() < 0.15
    } yield (a, b)).toSeq
    val e = edgeDf(edges)
    val naive = e.as("e1")
      .join(e.as("e2"), col("e2.a") === col("e1.b"))
      .join(e.as("e3"), col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val expected = naive.select(col("x").as("p"))
      .unionAll(naive.select(col("y").as("p")))
      .unionAll(naive.select(col("z").as("p")))
      .groupBy(col("p")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("p") -> r.getAs[Long]("n")).toMap
    assert(counts(edges) == expected)
  }

  test("q85 binding is non-empty and keyed by part") {
    val rows = Corpus.q85Triangles(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_triangles") >= 1L))
  }
}
