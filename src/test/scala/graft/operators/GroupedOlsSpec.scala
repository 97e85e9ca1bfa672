package graft.operators

import graft.mr.SparkSpec

/** Grouped OLS trend (q136). The driver hash-matches the SQL oracle;
  * these fixtures pin the statistic itself: a hand-computable exact
  * line, a two-pass differential on pseudo-random data, bit-exact
  * row-order invariance (DECIMAL moments), the degenerate-variance
  * null guards, and the one-scan plan shape.
  */
class GroupedOlsSpec extends SparkSpec {

  private case class Fit(n: Long, slope: Option[Double],
                         intercept: Option[Double], r2: Option[Double])

  private def fit(rows: Seq[(String, Double, Double)]): Map[String, Fit] = {
    import spark.implicits._
    Relational.groupedOls(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect()
      .map { r =>
        def d(c: String) = Option(r.getAs[Any](c)).map(_.asInstanceOf[Double])
        r.getString(0) -> Fit(r.getAs[Long]("n"), d("slope"), d("intercept"), d("r2"))
      }
      .toMap
  }

  test("exact line y = 2x + 1 recovers slope, intercept, and r2 = 1") {
    val rows = Seq(1.0, 2.0, 3.0, 4.0).map(x => ("g", x, 2 * x + 1))
    val got = fit(rows)("g")
    assert(got.n == 4)
    assert(math.abs(got.slope.get - 2.0) < 1e-12)
    assert(math.abs(got.intercept.get - 1.0) < 1e-12)
    assert(math.abs(got.r2.get - 1.0) < 1e-12)
  }

  test("matches a direct mean-centered computation on pseudo-random data") {
    val rows = (1 to 300).map { i =>
      val x = ((i * 7919) % 100).toDouble
      val y = 3.0 * x + ((i * 104729) % 50).toDouble
      ("g", x, y)
    }
    val xs = rows.map(_._2); val ys = rows.map(_._3)
    val n = xs.size
    val (mx, my) = (xs.sum / n, ys.sum / n)
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val vx = xs.map(x => (x - mx) * (x - mx)).sum
    val vy = ys.map(y => (y - my) * (y - my)).sum
    val got = fit(rows)("g")
    assert(math.abs(got.slope.get - cov / vx) < 1e-9)
    assert(math.abs(got.intercept.get - (my - cov / vx * mx)) < 1e-9)
    assert(math.abs(got.r2.get - (cov * cov) / (vx * vy)) < 1e-9)
  }

  test("result is invariant under row order (DECIMAL sums are order-free)") {
    val rows = (1 to 100).map { i =>
      ("g", ((i * 13) % 29).toDouble, ((i * 17) % 31).toDouble)
    }
    assert(fit(rows) == fit(rows.reverse)) // same bits required
  }

  test("zero x-variance nulls everything; zero y-variance nulls only r2") {
    val flatX = fit(Seq(("g", 5.0, 1.0), ("g", 5.0, 2.0)))("g")
    assert(flatX.slope.isEmpty && flatX.intercept.isEmpty && flatX.r2.isEmpty)
    val flatY = fit(Seq(("g", 1.0, 7.0), ("g", 2.0, 7.0)))("g")
    assert(flatY.slope.contains(0.0))            // cov = 0 exactly
    assert(math.abs(flatY.intercept.get - 7.0) < 1e-12)
    assert(flatY.r2.isEmpty)                     // never NaN
  }

  test("groups fit independently") {
    val rows = Seq(1.0, 2.0, 3.0).flatMap(x =>
      Seq(("up", x, 2 * x), ("down", x, -x + 10)))
    val got = fit(rows)
    assert(math.abs(got("up").slope.get - 2.0) < 1e-12)
    assert(math.abs(got("down").slope.get + 1.0) < 1e-12)
  }

  test("one scan, one aggregate exchange") {
    import spark.implicits._
    val df = Relational.groupedOls(
      Seq(("g", 1.0, 2.0)).toDF("g", "x", "y"), "g", "x", "y")
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size <= 2, s"too many exchanges:\n$plan")
    assert("LocalTableScan".r.findAllIn(plan).size == 1, s"input scanned more than once:\n$plan")
  }
}
