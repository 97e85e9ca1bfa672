package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-touch linear attribution (q130). The driver hash-matches the
  * two-window SQL oracle; these fixtures pin the model itself:
  * last-N windowing, equal split in exact grains, direct-channel
  * routing, post-conversion touches rolling into the NEXT conversion,
  * and conservation of total credit.
  */
class AttributionSpec extends SparkSpec {

  // (user, us, event_id, event_type)
  private def run(rows: Seq[(Long, Long, Long, String)],
      maxTouches: Int = 4): Map[String, (Long, Long, Double)] = {
    import spark.implicits._
    Temporal.linearAttribution(
      rows.toDF("user_id", "us", "event_id", "event_type"),
      "purchase", Seq("click", "view", "signup"), maxTouches)
      .collect()
      .map(r => r.getAs[String]("channel") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("credit_grains"),
          r.getAs[Double]("credit"))))
      .toMap
  }

  test("equal split across the last-4 touches, in exact twelfths") {
    // 3 touches then purchase: each touch earns 12/3 = 4 grains
    val got = run(Seq(
      (1L, 10L, 1L, "click"), (1L, 20L, 2L, "view"), (1L, 30L, 3L, "signup"),
      (1L, 40L, 4L, "purchase")))
    assert(got("click") == ((1L, 4L, 4.0 / 12.0)))
    assert(got("view") == ((1L, 4L, 4.0 / 12.0)))
    assert(got("signup") == ((1L, 4L, 4.0 / 12.0)))
    assert(!got.contains("direct"))
  }

  test("only the most recent maxTouches touches are credited") {
    // 6 clicks then purchase at maxTouches=4: first two earn nothing
    val rows = (1L to 6L).map(i => (1L, i * 10L, i, "click")) :+
      (1L, 100L, 99L, "purchase")
    val got = run(rows)
    assert(got("click") == ((4L, 12L, 1.0)))
  }

  test("conversion with no prior touch routes to direct; later touches roll to the next conversion") {
    val got = run(Seq(
      (1L, 10L, 1L, "purchase"),           // nothing before it -> direct
      (1L, 20L, 2L, "click"),              // before the SECOND purchase
      (1L, 30L, 3L, "purchase")))
    assert(got("direct") == ((1L, 12L, 1.0)))
    assert(got("click") == ((1L, 12L, 1.0)))
  }

  test("touches after the last conversion earn nothing") {
    val got = run(Seq(
      (1L, 10L, 1L, "click"), (1L, 20L, 2L, "purchase"),
      (1L, 30L, 3L, "view")))
    assert(got("click") == ((1L, 12L, 1.0)))
    assert(!got.contains("view"))
  }

  test("non-touch, non-conversion events are invisible to the window") {
    val got = run(Seq(
      (1L, 10L, 1L, "click"), (1L, 20L, 2L, "error"),
      (1L, 30L, 3L, "purchase")))
    assert(got("click") == ((1L, 12L, 1.0)))
    assert(got.keySet == Set("click"))
  }

  test("total credit is conserved: sum(grains) = 12 * conversions") {
    // deterministic pseudo-random stream over 7 users
    val types = Vector("click", "view", "signup", "purchase", "error")
    val rows = (1L to 400L).map { i =>
      ((i * 7919) % 7, i * 100L, i, types(((i * 104729) % 5).toInt))
    }
    val nConv = rows.count(_._4 == "purchase").toLong
    val got = run(rows)
    assert(got.values.map(_._2).sum == 12L * nConv)
  }

  test("grains denominator generalizes: maxTouches=3 uses lcm(1..3)=6") {
    val got = run(Seq(
      (1L, 10L, 1L, "click"), (1L, 20L, 2L, "view"),
      (1L, 30L, 3L, "purchase")), maxTouches = 3)
    assert(got("click") == ((1L, 3L, 0.5)))
    assert(got("view") == ((1L, 3L, 0.5)))
  }
}
