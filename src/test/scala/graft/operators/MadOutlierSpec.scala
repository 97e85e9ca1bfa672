package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** Median/MAD robust outliers (q138). The driver hash-matches the SQL
  * oracle; these fixtures pin the statistic: a hand-computed Hampel
  * cut, the MAD = 0 degenerate rule, robustness to the outlier itself
  * (where a moment z-score breaks down), group independence, and the
  * broadcast-stats plan shape.
  */
class MadOutlierSpec extends SparkSpec {

  private def run(rows: Seq[(String, Long, Long)], k: Double = 3.0) = {
    import spark.implicits._
    Relational.madOutliers(rows.toDF("g", "id", "v"), "g", "v", k)
      .select(col("g"), col("id"), col("v"), col("med"), col("mad"), col("z"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), Option(r.getAs[Any]("z")).map(_.asInstanceOf[Double])))
  }

  test("hand-computed Hampel cut: only the planted extreme is flagged") {
    // values 1..9 plus 1000: med = 5.5, devs sorted
    // [0.5 .. 4.5, 994.5] => mad = 2.5; cut 3*1.4826*2.5 = 11.1195
    val rows = ((1L to 9L) :+ 1000L).zipWithIndex.map {
      case (v, i) => ("g", i.toLong, v)
    }
    val got = run(rows)
    assert(got.length == 1)
    val (_, _, v, med, mad, z) = got.head
    assert(v == 1000L && med == 5.5 && mad == 2.5)
    assert(math.abs(z.get - 994.5 / (1.4826 * 2.5)) < 1e-12)
  }

  test("MAD = 0 degenerates to flagging every row off the median, z null") {
    val rows = Seq(("g", 0L, 7L), ("g", 1L, 7L), ("g", 2L, 7L), ("g", 3L, 9L))
    val got = run(rows)
    assert(got.length == 1)
    val (_, id, v, _, mad, z) = got.head
    assert(id == 3L && v == 9L && mad == 0.0 && z.isEmpty)
  }

  test("robust to the outlier itself: flag survives growing the extreme") {
    // a moment z-score's sigma grows with the outlier; MAD does not
    val base = (1L to 20L).map(v => ("g", v, v))
    for (extreme <- Seq(100L, 10000L, 1000000L)) {
      val got = run(base :+ ("g", 99L, extreme))
      assert(got.map(_._3).toSeq == Seq(extreme))
    }
  }

  test("groups are independent and tight groups flag nothing") {
    val tight = (1L to 10L).map(v => ("tight", v, 50L + v % 3))
    val wide = (1L to 10L).map(v => ("wide", v, v * v)) :+ ("wide", 99L, 100000L)
    val got = run(tight ++ wide)
    assert(got.forall(_._1 == "wide"))
    assert(got.exists(_._3 == 100000L))
  }

  test("stats frames broadcast: no sort-merge join in the plan") {
    import spark.implicits._
    val df = Relational.madOutliers(
      (1L to 10L).map(v => ("g", v, v)).toDF("g", "id", "v"), "g", "v")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"stats join shuffled:\n$plan")
  }
}
