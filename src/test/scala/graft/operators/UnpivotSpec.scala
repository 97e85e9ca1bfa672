package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** Unpivot / melt (q140). The driver hash-matches the relational
  * oracle; these pin the reshape semantics: melt(pivot(x)) recovers
  * the long frame with the zero rows the pivot grid implies, and the
  * melt itself adds no exchange to the plan.
  */
class UnpivotSpec extends SparkSpec {

  test("melt of a zero-filled pivot is the dense long grid") {
    import spark.implicits._
    val long = Seq((1L, "a", 3L), (1L, "b", 2L), (2L, "a", 1L))
      .toDF("id", "k", "n")
    val wide = long.groupBy(col("id")).pivot("k", Seq("a", "b")).agg(sum(col("n")))
    val melted = wide
      .unpivot(Array(col("id")), Array(col("a"), col("b")), "k", "n")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val got = melted.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // the grid is dense: (2, "b") exists with n = 0
    assert(got == Set((1L, "a", 3L), (1L, "b", 2L), (2L, "a", 1L), (2L, "b", 0L)))
  }

  test("pivot -> melt -> pivot is the identity on the wide frame") {
    import spark.implicits._
    val long = Seq((1L, "a", 3L), (1L, "b", 2L), (2L, "a", 1L), (3L, "b", 7L))
      .toDF("id", "k", "n")
    def widen(df: org.apache.spark.sql.DataFrame) = {
      val w = df.groupBy(col("id")).pivot("k", Seq("a", "b")).agg(sum(col("n")))
      w.withColumn("a", coalesce(col("a"), lit(0L)))
        .withColumn("b", coalesce(col("b"), lit(0L)))
    }
    val wide = widen(long)
    val roundTrip = widen(
      wide.unpivot(Array(col("id")), Array(col("a"), col("b")), "k", "n"))
    assert(wide.collect().map(_.toSeq).toSet == roundTrip.collect().map(_.toSeq).toSet)
  }

  test("melt adds no exchange: only the pivot aggregate and output sort shuffle") {
    val df = Relational.q140Unpivot(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // the pivot's two-phase aggregate (2 hash exchanges) + the final
    // orderBy range exchange; the Expand itself must add none
    assert("Exchange".r.findAllIn(plan).size <= 3, s"melt shuffled:\n$plan")
    assert(plan.contains("Expand"), s"no Expand (unpivot) in plan:\n$plan")
    assert(df.count() > 0)
  }
}
