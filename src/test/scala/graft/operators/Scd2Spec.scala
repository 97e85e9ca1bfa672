package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** SCD Type-2 build (q132). The driver hash-matches the lag/lead SQL
  * oracle; these fixtures pin the dimension-history rules: no-op
  * versions never fragment history, null-safe change detection, revert
  * intervals, and exactly one open (current) interval per key.
  */
class Scd2Spec extends SparkSpec {

  // rows: (key, version, attr)
  private def build(rows: Seq[(Long, Long, String)]) = {
    import spark.implicits._
    Relational.scd2Build(rows.toDF("k", "version", "a"), "k", "version", Seq("a"))
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("a"),
        r.getAs[Long]("valid_from"), Option(r.getAs[Any]("valid_to")),
        r.getAs[Boolean]("is_current")))
      .sortBy(t => (t._1, t._3)).toList
  }

  test("no-op re-statement does not open a new interval") {
    val got = build(Seq((1L, 0L, "x"), (1L, 1L, "x"), (1L, 2L, "y")))
    assert(got == Seq(
      (1L, "x", 0L, Some(2L), false),
      (1L, "y", 2L, None, true)))
  }

  test("a revert to an earlier value IS a new interval") {
    val got = build(Seq((1L, 0L, "x"), (1L, 1L, "y"), (1L, 2L, "x")))
    assert(got == Seq(
      (1L, "x", 0L, Some(1L), false),
      (1L, "y", 1L, Some(2L), false),
      (1L, "x", 2L, None, true)))
  }

  test("null-safe change detection: null->value and value->null both open intervals, null->null does not") {
    val got = build(Seq((1L, 0L, null), (1L, 1L, null), (1L, 2L, "v"), (1L, 3L, null)))
    assert(got == Seq(
      (1L, null, 0L, Some(2L), false),
      (1L, "v", 2L, Some(3L), false),
      (1L, null, 3L, None, true)))
  }

  test("exactly one current interval per key; intervals tile the version axis") {
    val rows = for {
      k <- 1L to 20L
      v <- 0L to 9L
    } yield (k, v, s"v${(v * k) % 4}")
    val got = build(rows)
    val byKey = got.groupBy(_._1)
    byKey.values.foreach { ivs =>
      assert(ivs.count(_._5) == 1)
      // each interval's valid_to equals the next interval's valid_from
      ivs.sortBy(_._3).toList.sliding(2).foreach {
        case List(a, b) => assert(a._4.contains(b._3))
        case _ =>
      }
      assert(ivs.last._4.isEmpty)
    }
  }

  test("one exchange: the window cascade shares a single key partitioning") {
    import spark.implicits._
    val df = Relational.scd2Build(
      Seq((1L, 0L, "x"), (1L, 1L, "y")).toDF("k", "version", "a"),
      "k", "version", Seq("a"))
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, s"want 1 exchange in:\n$plan")
  }
}
