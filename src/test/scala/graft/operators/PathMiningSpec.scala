package graft.operators

import graft.mr.SparkSpec

/** Sequential-pattern mining (q115). The driver hash-matches the top-k
  * against the self-join oracle; these pin the running-set scan's
  * semantics — strict i<j<k ordering, gaps allowed, per-user distinct
  * support — on hand-computed and randomized fixtures.
  */
class PathMiningSpec extends SparkSpec {

  private def frame(rows: Seq[(Long, Long, Long, String)]) = {
    import spark.implicits._
    rows.toDF("user_id", "us", "event_id", "event_type")
  }

  private def mine(rows: Seq[(Long, Long, Long, String)], k: Int = 100): Map[String, Long] =
    Temporal.pathMining(frame(rows), k).collect()
      .map(r => r.getAs[String]("path") -> r.getAs[Long]("n_users")).toMap

  /** Brute force: all strict index triples/pairs/singles per user. */
  private def brute(rows: Seq[(Long, Long, Long, String)]): Map[String, Long] =
    rows.groupBy(_._1).values.flatMap { evs =>
      val t = evs.sortBy(e => (e._2, e._3)).map(_._4).toIndexedSeq
      val n = t.length
      val pats = scala.collection.mutable.HashSet.empty[String]
      for (i <- 0 until n) {
        pats += t(i)
        for (j <- i + 1 until n) {
          pats += s"${t(i)}>${t(j)}"
          for (kk <- j + 1 until n) pats += s"${t(i)}>${t(j)}>${t(kk)}"
        }
      }
      pats
    }.groupBy(identity).map { case (p, occ) => p -> occ.size.toLong }

  test("hand-computed supports: gaps allowed, order strict, repeats count once") {
    // user 1: x y x z   user 2: x z
    val rows = Seq(
      (1L, 10L, 1L, "x"), (1L, 20L, 2L, "y"), (1L, 30L, 3L, "x"), (1L, 40L, 4L, "z"),
      (2L, 10L, 5L, "x"), (2L, 20L, 6L, "z"))
    val got = mine(rows)
    assert(got("x") == 2L && got("z") == 2L && got("y") == 1L)
    assert(got("x>z") == 2L) // gap allowed for user 1 (x..z)
    assert(got("x>y") == 1L && got("y>x") == 1L && got("x>x") == 1L)
    assert(got("x>y>x") == 1L && got("x>y>z") == 1L && got("x>x>z") == 1L
      && got("y>x>z") == 1L)
    assert(!got.contains("z>x")) // order is strict
    assert(!got.contains("x>z>y"))
  }

  test("same-timestamp ties order by event_id") {
    val rows = Seq((1L, 10L, 2L, "b"), (1L, 10L, 1L, "a"))
    val got = mine(rows)
    assert(got.contains("a>b") && !got.contains("b>a"))
  }

  test("randomized differential vs the brute-force index enumeration") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val rows = (1L to 200L).map { id =>
        (rnd.nextInt(12).toLong, rnd.nextInt(40).toLong, id,
          s"e${rnd.nextInt(5)}")
      }
      val want = brute(rows)
      val got = mine(rows, k = 10000)
      assert(got == want, s"trial $trial diverged")
    }
  }

  test("top-k cut is deterministic: support desc, then path asc") {
    val rows = Seq(
      (1L, 1L, 1L, "a"), (2L, 1L, 2L, "a"),
      (3L, 1L, 3L, "b"), (4L, 1L, 4L, "c"))
    val got = Temporal.pathMining(frame(rows), 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 2L), ("b", 1L)))
  }
}
