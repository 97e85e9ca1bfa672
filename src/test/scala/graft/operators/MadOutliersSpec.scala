package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** q204 median/MAD robust outliers: exact when the group fits the
  * sample, zero-MAD degenerate groups flag every off-median point,
  * and the median holds under contamination that drags the mean —
  * the robustness property that justifies the operator.
  */
class MadOutliersSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def events(rows: Seq[(String, Long, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_type", "event_id", "value")
  }

  private def run(df: DataFrame): Map[String, (Long, Long, Long, Long)] =
    Temporal.madOutliersOf(df).collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap

  test("groups inside the sample size get the exact median/MAD and flag planted spikes") {
    // 101 values 10.0 +- small jitter, 3 spikes far out
    val base = (1L to 101L).map(i =>
      ("a", i, 10.0 + 0.001 * (i % 5))) // dev <= 4000 fx
    val spikes = Seq(("a", 900L, 250.0), ("a", 901L, -80.0), ("a", 902L, 300.0))
    val (n, med, mad, out) = run(events(base ++ spikes))("a")
    assert(n == 104L)
    assert(med >= 10000000L && med <= 10004000L) // ~10.0 in fx
    assert(mad <= 2000L) // jitter-scale
    assert(out == 3L, s"med $med mad $mad out $out")
  }

  test("zero MAD: constant values flag exactly the off-median points") {
    val rows = (1L to 50L).map(i => ("c", i, 7.0)) ++
      Seq(("c", 90L, 7.5), ("c", 91L, 6.5))
    val (n, med, mad, out) = run(events(rows))("c")
    assert(n == 52L && med == 7000000L && mad == 0L && out == 2L)
  }

  test("the median holds under 20% contamination that would drag a mean") {
    val rnd = new scala.util.Random(73)
    val clean = (1L to 4000L).map(i => ("m", i, 50.0 + rnd.nextGaussian()))
    val dirty = (1L to 1000L).map(i => ("m", 10000L + i, 5000.0))
    val (_, med, _, out) = run(events(clean ++ dirty))("m")
    // a mean would sit near 1040; the sampled median stays near 50
    assert(med > 45000000L && med < 56000000L, s"median drifted: $med")
    // all 1000 contaminated points flag (sampling error on med/mad is
    // tiny relative to the 100x separation)
    assert(out >= 990L && out <= 1010L, s"outliers $out")
  }
}
