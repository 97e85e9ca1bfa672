package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** DECIMAL-moment correlation matrix (q133). The driver hash-matches
  * the SQL oracle; these fixtures pin the statistic itself: known
  * hand-computable correlations, invariance under row order, the
  * zero-variance null guard, and the one-scan plan shape.
  */
class CorrMatrixSpec extends SparkSpec {

  private def corr(rows: Seq[(String, Double, Double, Double)]): Map[(String, String, String), Option[Double]] = {
    import spark.implicits._
    Relational.correlationMatrix(
      rows.toDF("g", "a", "b", "c"), "g", Seq("a", "b", "c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        Option(r.getAs[Any]("corr")).map(_.asInstanceOf[Double]))
      .toMap
  }

  test("perfect positive, perfect negative, and known intermediate correlation") {
    val rows = Seq[(String, Double, Double, Double)](
      ("g", 1.0, 2.0, 3.0), ("g", 2.0, 4.0, 2.0), ("g", 3.0, 6.0, 1.0))
    val got = corr(rows)
    assert(math.abs(got(("g", "a", "b")).get - 1.0) < 1e-12)   // b = 2a
    assert(math.abs(got(("g", "a", "c")).get + 1.0) < 1e-12)   // c = 4-a
    assert(math.abs(got(("g", "b", "c")).get + 1.0) < 1e-12)
  }

  test("matches a direct two-pass computation on pseudo-random data") {
    val rows = (1 to 200).map { i =>
      val a = ((i * 7919) % 100).toDouble
      val b = a * 0.5 + ((i * 104729) % 50).toDouble
      val c = ((i * 31) % 7).toDouble
      ("g", a, b, c)
    }
    def direct(xs: Seq[Double], ys: Seq[Double]): Double = {
      val n = xs.size
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val vx = xs.map(x => (x - mx) * (x - mx)).sum
      val vy = ys.map(y => (y - my) * (y - my)).sum
      cov / math.sqrt(vx * vy)
    }
    val got = corr(rows)
    val (as, bs, cs) = (rows.map(_._2), rows.map(_._3), rows.map(_._4))
    assert(math.abs(got(("g", "a", "b")).get - direct(as, bs)) < 1e-9)
    assert(math.abs(got(("g", "a", "c")).get - direct(as, cs)) < 1e-9)
  }

  test("result is invariant under row order (DECIMAL sums are order-free)") {
    val rows = (1 to 100).map { i =>
      ("g", ((i * 13) % 29).toDouble, ((i * 17) % 31).toDouble, ((i * 7) % 11).toDouble)
    }
    val a = corr(rows)
    val b = corr(rows.reverse)
    assert(a == b) // exact, not approximate: same bits required
  }

  test("zero-variance column yields null, never NaN") {
    val got = corr(Seq(("g", 1.0, 5.0, 1.0), ("g", 2.0, 5.0, 2.0)))
    assert(got(("g", "a", "b")).isEmpty)
    assert(got(("g", "b", "c")).isEmpty)
    assert(math.abs(got(("g", "a", "c")).get - 1.0) < 1e-12)
  }

  test("one scan, one exchange: moments aggregate once, pairs explode after") {
    import spark.implicits._
    val df = Relational.correlationMatrix(
      Seq(("g", 1.0, 2.0, 3.0)).toDF("g", "a", "b", "c"), "g", Seq("a", "b", "c"))
    val plan = df.queryExecution.executedPlan.toString
    // aggregate exchange + the final orderBy range exchange only
    assert("Exchange".r.findAllIn(plan).size <= 2, s"too many exchanges:\n$plan")
    assert("LocalTableScan".r.findAllIn(plan).size == 1, s"input scanned more than once:\n$plan")
  }
}
