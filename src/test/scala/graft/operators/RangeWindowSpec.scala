package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** RANGE-frame trailing window (q148). The driver hash-matches the
  * DuckDB mirror; these fixtures pin the frame semantics ROWS frames
  * cannot express: peers share a frame, the horizon is value-defined,
  * and the boundary is inclusive.
  */
class RangeWindowSpec extends SparkSpec {

  private def trail(rows: Seq[(Long, Long, Long, Double)]): Map[Long, (Double, Long)] = {
    import spark.implicits._
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-600000000L, 0L)
    rows.toDF("user_id", "event_id", "us", "value")
      .withColumn("trail_sum",
        sum(col("value").cast(DecimalType(18, 6))).over(w).cast("double"))
      .withColumn("trail_n", count(lit(1)).over(w))
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Double]("trail_sum"), r.getAs[Long]("trail_n")))).toMap
  }

  private val M = 60000000L // one minute in micros

  test("the horizon is event-time, not row count") {
    // three events in one minute, a fourth 30 minutes later: the
    // fourth's trailing window holds only itself — a ROWS(3) frame
    // would wrongly reach back across the gap
    val got = trail(Seq(
      (1L, 1L, 0L, 1.0), (1L, 2L, M, 2.0), (1L, 3L, 2 * M, 4.0),
      (1L, 4L, 32 * M, 8.0)))
    assert(got(3L) == ((7.0, 3L)))
    assert(got(4L) == ((8.0, 1L)))
  }

  test("equal timestamps are peers: every one sees the whole burst") {
    // RANGE frames are defined by the ORDER BY value, so all three
    // same-instant events share one frame (a ROWS frame would give
    // each a different prefix depending on arbitrary tie order)
    val got = trail(Seq(
      (1L, 1L, 0L, 1.0), (1L, 2L, 0L, 2.0), (1L, 3L, 0L, 4.0)))
    assert(got.values.toSet == Set((7.0, 3L)))
  }

  test("the 10-minute boundary is inclusive; one micro past it is out") {
    val got = trail(Seq(
      (1L, 1L, 0L, 1.0),
      (1L, 2L, 10 * M, 2.0),          // exactly 10 min later: includes event 1
      (2L, 3L, 0L, 1.0),
      (2L, 4L, 10 * M + 1L, 2.0)))    // one micro past: excludes
    assert(got(2L) == ((3.0, 2L)))
    assert(got(4L) == ((2.0, 1L)))
  }

  test("users are independent partitions") {
    val got = trail(Seq((1L, 1L, 0L, 1.0), (2L, 2L, 0L, 100.0)))
    assert(got(1L) == ((1.0, 1L)) && got(2L) == ((100.0, 1L)))
  }

  test("q148 on the test data covers every event exactly once") {
    val out = Relational.q148RangeWindow(spark, "/root/testdata/sf0.001")
    val n = out.count()
    assert(n == graft.Tables.events(spark, "/root/testdata/sf0.001").count())
    assert(out.filter(col("trail_n") < 1).count() == 0) // self is always in frame
  }
}
