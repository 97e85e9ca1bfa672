package graft.operators

import graft.mr.SparkSpec

/** Ordered funnel (q80): stages must be reached in order, each
  * strictly after the user's earliest qualifying previous stage —
  * out-of-order events must not count.
  */
class FunnelSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Temporal.funnelStages(
      rows.toDF("user_id", "event_type", "us"),
      Seq("view", "click", "purchase"), maxGapUs = 100L)
      .collect().map(r => r.getAs[Long]("stage") -> r.getAs[Long]("n_users")).toMap
  }

  test("ordered sequences count; out-of-order and partial ones stop at the right stage") {
    val got = run(Seq(
      // user 1: full ordered funnel -> stage 3
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // user 2: click BEFORE the first view, none after -> stage 1
      (2L, "click", 5L), (2L, "view", 10L), (2L, "purchase", 20L),
      // user 3: purchase before the qualifying click -> stage 2
      (3L, "view", 10L), (3L, "purchase", 15L), (3L, "click", 20L),
      // user 4: view only -> stage 1
      (4L, "view", 10L),
      // user 5: purchase only -> stage 0
      (5L, "purchase", 10L)))
    assert(got == Map(3L -> 1L, 2L -> 1L, 1L -> 2L, 0L -> 1L))
  }

  test("strict ordering: same-timestamp stage events do not chain") {
    // click at the SAME instant as the first view is not 'after' it
    val got = run(Seq((1L, "view", 10L), (1L, "click", 10L)))
    assert(got == Map(1L -> 1L))
  }

  test("a later view can still be the anchor for an even later click") {
    // first view at 10; click at 5 doesn't count, click at 15 does
    val got = run(Seq(
      (1L, "click", 5L), (1L, "view", 10L), (1L, "click", 15L)))
    assert(got == Map(2L -> 1L))
  }

  test("conversion window: a stage past the window does not chain") {
    // click at 150 is > 100us after the view anchor at 10 -> stage 1
    val got = run(Seq((1L, "view", 10L), (1L, "click", 150L)))
    assert(got == Map(1L -> 1L))
    // exactly at the window edge (inclusive) still counts
    val edge = run(Seq((1L, "view", 10L), (1L, "click", 110L)))
    assert(edge == Map(2L -> 1L))
  }

  test("q80 runs on the test events and covers all users") {
    val rows = Temporal.q80Funnel(spark, "/root/testdata/sf0.001").collect()
    val total = rows.map(_.getAs[Long]("n_users")).sum
    val users = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id").distinct().count()
    assert(total == users)
  }
}
