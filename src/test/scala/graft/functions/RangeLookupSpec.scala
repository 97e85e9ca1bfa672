package graft.functions

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** [[LowerBoundBc]]: binary-search semantics pinned against a linear
  * scan (boundary hits, gaps, below-first, above-last), codegen and
  * interpreted paths agree, nulls pass through, and the q189 plan has
  * no join node — the "range join" is one expression.
  */
class RangeLookupSpec extends SparkSpec {
  import spark.implicits._

  private val bounds = Array(0L, 10L, 10L + 15L, 100L, 1000L)

  private def ref(x: Long): Long =
    bounds.lastIndexWhere(_ <= x).toLong // -1 below the first

  private def run(xs: Seq[Long], codegen: Boolean): Map[Long, Long] = {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
    try {
      val bc = spark.sparkContext.broadcast(bounds)
      xs.toDF("x")
        .withColumn("i", LowerBoundBc.column(col("x"), bc))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("matches a linear scan on edges, hits, and gaps — codegen and interpreted") {
    val xs = Seq(-5L, -1L, 0L, 1L, 9L, 10L, 11L, 24L, 25L, 26L,
      99L, 100L, 500L, 999L, 1000L, 5000L)
    for (codegen <- Seq(true, false)) {
      val got = run(xs, codegen)
      xs.foreach(x => assert(got(x) == ref(x), s"x=$x codegen=$codegen"))
    }
  }

  test("null keys pass through as null") {
    val bc = spark.sparkContext.broadcast(bounds)
    val got = Seq(Some(50L), None).toDF("x")
      .withColumn("i", LowerBoundBc.column(col("x"), bc))
      .collect()
    assert(got.exists(r => !r.isNullAt(0) && r.getLong(1) == 2L))
    assert(got.exists(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("q189 plan has no join node: the range 'join' is one expression") {
    val df = graft.operators.Layout.q189RangeLookup(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty, s"unexpected join in:\n$plan")
  }

  test("q189 agrees with an explicit inequality-join formulation") {
    import org.apache.spark.sql.DataFrame
    val d = "/root/testdata/sf0.001"
    val got = graft.operators.Layout.q189RangeLookup(spark, d)
      .collect().map(_.toString).toSeq
    val tiers = graft.operators.Layout.tierBounds.zipWithIndex
      .map { case (lo, i) => (i.toLong, lo) }.toSeq.toDF("i", "lo")
    val e: DataFrame = graft.Tables.events(spark, d)
      .select(col("event_id"), col("event_type"),
        round(col("value") * lit(1e6)).cast("long").as("x"))
    val want = e.join(tiers, col("lo") <= col("x"))
      .groupBy(col("event_id"), col("event_type"), col("x"))
      .agg(max(col("i")).as("tier"))
      .groupBy(col("tier"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("x")).as("sum_x"))
      .orderBy(col("tier"), col("event_type"))
      .collect().map(_.toString).toSeq
    assert(got.nonEmpty && got == want)
  }
}
