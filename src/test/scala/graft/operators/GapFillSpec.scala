package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.DataFrame

/** Daily LOCF gap-fill (q86). The driver hash-matches a
  * generate_series + IGNORE-NULLS-window oracle; these fixtures pin
  * the semantics on planted shapes: gap days carry the PREVIOUS day's
  * LAST event value, same-day ties resolve by (us, id) descending, and
  * each key's grid spans exactly [first, last] event day.
  */
class GapFillSpec extends SparkSpec {

  private val Day = 86400000000L

  private def run(rows: Seq[(Long, Long, Long, Double)]): Seq[(Long, Long, Double, Long)] = {
    import spark.implicits._
    val df: DataFrame = rows.toDF("key", "us", "id", "v")
    Temporal.gapFillLocf(df)
      .collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("d"),
        r.getAs[Double]("v"), r.getAs[Long]("was_gap")))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  test("gap days carry the previous day's last value") {
    val got = run(Seq(
      (1L, 0L * Day + 10, 1L, 1.5), // day 0
      (1L, 3L * Day + 99, 2L, 9.0))) // day 3; days 1-2 are gaps
    assert(got == Seq(
      (1L, 0L, 1.5, 0L), (1L, 1L, 1.5, 1L), (1L, 2L, 1.5, 1L), (1L, 3L, 9.0, 0L)))
  }

  test("same-day events: the (us, id)-latest value wins") {
    val got = run(Seq(
      (1L, 5L, 1L, 1.0), (1L, 9L, 2L, 2.0),   // same us would tie...
      (1L, 9L, 3L, 3.0)))                     // ...id 3 wins
    assert(got == Seq((1L, 0L, 3.0, 0L)))
  }

  test("single-event key yields a one-row grid; keys are independent") {
    val got = run(Seq(
      (1L, 0L, 1L, 1.0),
      (2L, 7L * Day, 1L, 2.0), (2L, 8L * Day, 2L, 3.0)))
    assert(got == Seq(
      (1L, 0L, 1.0, 0L), (2L, 7L, 2.0, 0L), (2L, 8L, 3.0, 0L)))
  }

  test("differential vs a driver-side LOCF simulation on random events") {
    val rng = new scala.util.Random(23)
    val rows = (1 to 200).map { i =>
      (rng.nextInt(5).toLong + 1, rng.nextInt(10).toLong * Day + rng.nextInt(1000),
        i.toLong, rng.nextInt(100) / 10.0)
    }
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (k, es) =>
      val lastPerDay = es.groupBy(_._2 / Day).map { case (day, dayEs) =>
        day -> dayEs.maxBy(e => (e._2, e._3))._4
      }
      val (d0, d1) = (lastPerDay.keys.min, lastPerDay.keys.max)
      var carry = 0.0
      (d0 to d1).map { d =>
        val hit = lastPerDay.get(d)
        carry = hit.getOrElse(carry)
        (k, d, carry, if (hit.isEmpty) 1L else 0L)
      }
    }.sortBy(t => (t._1, t._2))
    assert(run(rows) == expected)
  }

  test("q86 binding: grids are dense and gap rows only on event-free days") {
    val df = Temporal.q86GapFill(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, rs) =>
      val ds = rs.map(_.getAs[Long]("d")).sorted
      assert(ds.zip(ds.tail).forall { case (a, b) => b == a + 1 }, "grid not dense")
    }
    // carried values are never null once the first day is an event day
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("v"))))
  }
}
