package graft.operators

import graft.Tables
import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** Numeric check for the q37 approximate sketches: the driver can only
  * rows-check them (approximate results aren't SQL-reproducible), so
  * this spec pins that HLL++ and the quantile sketch land within their
  * CONFIGURED error bounds of the exact answers at sf0.01 — the
  * guarantee a 100 TB user actually relies on when trading exactness
  * for O(1) sketch state.
  */
class ApproxSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.01"

  private def num(x: Any): Double = x match {
    case b: java.math.BigDecimal => b.doubleValue()
    case n: Number => n.doubleValue()
    case other => fail(s"non-numeric value $other")
  }

  test("q37 approx_count_distinct is within bounds of the exact distinct count") {
    val approx = Relational.q37ApproxStats(spark, d).collect()
      .map(r => r.getString(0) -> num(r.get(1))).toMap
    val exact = Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, ex) =>
      val rel = math.abs(approx(flag) - ex) / ex
      // HLL++ configured at rsd = 0.01; allow 5 sigma before failing
      assert(rel <= 0.05, s"flag=$flag approx=${approx(flag)} exact=$ex rel=$rel")
    }
  }

  test("q37 percentile_approx brackets the exact quantiles at its configured accuracy") {
    val approx = Relational.q37ApproxStats(spark, d).collect()
      .map(r => r.getString(0) -> (num(r.get(2)), num(r.get(3)))).toMap
    // accuracy=10000 bounds the RANK error at n/10000 (~2 ranks per
    // group at sf0.01); a +/-0.01-quantile value bracket is far looser
    // than that guarantee, so a pass here is implied by a correct sketch
    val exact = Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, array(0.49, 0.51))").as("med_lo_hi"),
        expr("percentile(l_extendedprice, array(0.94, 0.96))").as("p95_lo_hi"))
      .collect()
      .map { r =>
        val m = r.getSeq[Double](1)
        val p = r.getSeq[Double](2)
        r.getString(0) -> (m(0), m(1), p(0), p(1))
      }.toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, (mLo, mHi, pLo, pHi)) =>
      val (med, p95) = approx(flag)
      assert(med >= mLo && med <= mHi, s"flag=$flag median=$med not in [$mLo, $mHi]")
      assert(p95 >= pLo && p95 <= pHi, s"flag=$flag p95=$p95 not in [$pLo, $pHi]")
    }
  }
}
