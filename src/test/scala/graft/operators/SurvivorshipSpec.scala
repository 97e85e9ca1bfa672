package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** Survivorship merge (q129). The driver hash-matches the DuckDB
  * struct-max oracle on the customer version stack; these fixtures pin
  * the per-field recency-wins semantics directly: a newer null never
  * erases an older value, fields interleave across versions, the
  * all-null field surfaces as (null, null) lineage, and version ties
  * break by value deterministically.
  */
class SurvivorshipSpec extends SparkSpec {

  private def merge(rows: Seq[(Long, Long, String, String)]) = {
    import spark.implicits._
    Linkage.survivorshipMerge(
      rows.toDF("k", "version", "a", "b"), "k", "version", Seq("a", "b"))
      .collect()
      .map(r => r.getAs[Long]("k") ->
        ((Option(r.getAs[String]("a")), Option(r.getAs[Any]("a_v")),
          Option(r.getAs[String]("b")), Option(r.getAs[Any]("b_v")))))
      .toMap
  }

  test("newer null does not erase; fields interleave across versions") {
    val got = merge(Seq(
      (1L, 1L, "old-a", "old-b"),
      (1L, 2L, null, "new-b"),
      (1L, 3L, "new-a", null)))
    assert(got(1L) == ((Some("new-a"), Some(3L), Some("new-b"), Some(2L))))
  }

  test("field null in every version yields null value and null lineage") {
    val got = merge(Seq((5L, 1L, "x", null), (5L, 2L, "y", null)))
    assert(got(5L) == ((Some("y"), Some(2L), None, None)))
  }

  test("single-version key passes through") {
    val got = merge(Seq((9L, 4L, "only", "one")))
    assert(got(9L) == ((Some("only"), Some(4L), Some("one"), Some(4L))))
  }

  test("version tie breaks by max value, deterministically") {
    val got = merge(Seq((2L, 1L, "aa", "zz"), (2L, 1L, "bb", "yy")))
    assert(got(2L) == ((Some("bb"), Some(1L), Some("zz"), Some(1L))))
  }

  test("merge is one aggregate exchange with map-side partials, no window") {
    import spark.implicits._
    val df = Linkage.survivorshipMerge(
      Seq((1L, 1L, "a", "b")).toDF("k", "version", "a", "b"),
      "k", "version", Seq("a", "b"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected Window in:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1, s"want 1 exchange in:\n$plan")
    assert(plan.contains("partial_max"), s"want map-side partial max in:\n$plan")
  }
}
