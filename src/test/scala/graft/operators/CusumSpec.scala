package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** q185 CUSUM changepoint: the windowed reflection-identity form must
  * equal the textbook sequential recursion s_i = max(0, s_{i-1} + x_i
  * − k) row for row, and a planted mean shift must be flagged at (and
  * not before) the shift.
  */
class CusumSpec extends SparkSpec {
  import spark.implicits._

  // textbook recursion, plain Scala
  private def seqCusum(xs: Seq[Long], k: Long): Seq[Long] =
    xs.scanLeft(0L)((s, x) => math.max(0L, s + x - k)).drop(1)

  private def windowed(rows: Seq[(Long, Long, Long)], k: Long) = {
    // (user, ts, x) through the same two-window pipeline as q185
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    rows.toDF("user_id", "ts_us", "x")
      .withColumn("p", sum(col("x") - lit(k)).over(w))
      .withColumn("s", col("p") - least(min(col("p")).over(w), lit(0L)))
      .select(col("user_id"), col("ts_us"), col("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("reflection identity equals the sequential recursion on random walks") {
    val rnd = new scala.util.Random(185)
    val users = (0L until 6L)
    val rows = users.flatMap { u =>
      val xs = Seq.fill(200)(rnd.nextLong(100).abs)
      xs.zipWithIndex.map { case (x, i) => (u, i.toLong, x) }
    }
    val k = 49L
    val got = windowed(rows, k)
    for (u <- users) {
      val xs = rows.filter(_._1 == u).sortBy(_._2).map(_._3)
      val want = seqCusum(xs, k)
      want.zipWithIndex.foreach { case (s, i) =>
        assert(got((u, i.toLong)) == s, s"user $u step $i")
      }
    }
  }

  test("a planted mean shift is flagged at the shift, not before") {
    // user 0: steady at k (never crosses); user 1: shifts to k+20 at
    // step 100 — the statistic starts climbing exactly there
    val k = 50L
    val rows =
      (0 until 200).map(i => (0L, i.toLong, k)) ++
      (0 until 100).map(i => (1L, i.toLong, k)) ++
      (100 until 200).map(i => (1L, i.toLong, k + 20L))
    val got = windowed(rows, k)
    assert((0 until 200).forall(i => got((0L, i.toLong)) == 0L))
    assert((0 until 100).forall(i => got((1L, i.toLong)) == 0L))
    assert(got((1L, 100L)) == 20L && got((1L, 199L)) == 2000L)
  }

  test("downward chart: running-max reflection equals the recursion on k - x") {
    val rnd = new scala.util.Random(192)
    val k = 49L
    for (_ <- 1 to 20) {
      val xs = Seq.fill(150)(rnd.nextLong(100).abs)
      // textbook downward recursion: s_i = max(0, s_{i-1} + (k - x_i))
      val want = xs.scanLeft(0L)((s, x) => math.max(0L, s + (k - x))).drop(1)
      // one prefix sum serves both charts: s_dn = max(0, runmax(p)) - p
      val p = xs.scanLeft(0L)((a, x) => a + (x - k)).drop(1)
      val got = p.zipWithIndex.map { case (pi, i) =>
        math.max(0L, p.take(i + 1).max) - pi
      }
      assert(got == want)
    }
  }

  test("a planted collapse is flagged by the downward chart, not the upward") {
    val k = 50L
    val rows =
      (0 until 100).map(i => (1L, i.toLong, k)) ++
      (100 until 200).map(i => (1L, i.toLong, k - 20L))
    val out = rows.toDF("user_id", "ts_us", "x")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val c = out
      .withColumn("p", sum(col("x") - lit(k)).over(w))
      .withColumn("s_up", col("p") - least(min(col("p")).over(w), lit(0L)))
      .withColumn("s_dn", greatest(max(col("p")).over(w), lit(0L)) - col("p"))
      .agg(max(col("s_up")).as("up"), max(col("s_dn")).as("dn"))
      .collect().head
    assert(c.getLong(0) == 0L && c.getLong(1) == 2000L)
  }

  test("q185 driver binding returns one row per user, non-negative stats") {
    val out = Temporal.q185Cusum(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    assert(out.forall(r => r.getLong(2) >= 0L && r.getLong(3) >= 0L))
    // first_cross_us is null exactly when nothing sat above h
    assert(out.forall(r => (r.getLong(3) == 0L) == r.isNullAt(4)))
  }
}
