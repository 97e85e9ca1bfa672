package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental aggregate maintenance (q128). The driver hash-matches a
  * recompute-from-scratch oracle; these fixtures pin the state-merge
  * algebra directly: one-sided groups pass through untouched, two-sided
  * groups combine state-wise with exact DECIMAL sums, and the merged
  * result equals recomputation on a randomized split.
  */
class IncrementalAggSpec extends SparkSpec {

  private def summarize(rows: Seq[(Long, Double, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "price", "day")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("price").cast(DecimalType(18, 2))).as("tot"),
        min(col("day")).as("dmin"),
        max(col("day")).as("dmax"))
  }

  private def collect(df: DataFrame): Map[Long, (Long, BigDecimal, String, String)] =
    df.collect().map(r => r.getAs[Long]("k") ->
      ((r.getAs[Long]("n"), BigDecimal(r.getAs[java.math.BigDecimal]("tot")),
        r.getAs[String]("dmin"), r.getAs[String]("dmax")))).toMap

  test("groups on one side pass through; shared groups combine state-wise") {
    val stored = summarize(Seq(
      (1L, 10.50, "2024-01-01"), (1L, 2.25, "2024-01-05"),
      (2L, 7.00, "2024-01-02")))
    val delta = summarize(Seq(
      (1L, 0.25, "2024-02-01"),
      (3L, 99.99, "2024-02-03")))
    val got = collect(Relational.mergeAggStates(stored, delta, Seq("k")))
    assert(got(1L) == ((3L, BigDecimal("13.00"), "2024-01-01", "2024-02-01")))
    assert(got(2L) == ((2L - 1L, BigDecimal("7.00"), "2024-01-02", "2024-01-02")))
    assert(got(3L) == ((1L, BigDecimal("99.99"), "2024-02-03", "2024-02-03")))
  }

  test("randomized split: merge(base, delta) == recompute over the union") {
    val rng = new scala.util.Random(11)
    val rows = (1 to 500).map { i =>
      (rng.nextInt(40).toLong, rng.nextInt(10000) / 100.0,
        f"2024-01-${1 + rng.nextInt(28)}%02d")
    }
    val (base, delta) = rows.partition { case (k, p, _) => (k + p * 100).toLong % 3 != 0 }
    val got = collect(Relational.mergeAggStates(
      summarize(base), summarize(delta), Seq("k")))
    val want = collect(summarize(rows))
    assert(got == want)
  }
}
