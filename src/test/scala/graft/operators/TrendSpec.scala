package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** q198 exact OLS trend: planted linear data recovers the exact
  * slope and sign, constants and single-point groups are zero-safe,
  * and the integer pipeline never leaves fixed-point (the value that
  * makes it oracle-replayable).
  */
class TrendSpec extends SparkSpec {

  // (event_type, minute index, value) -> the (event_type, ts, value)
  // frame trendOf expects (ts in int64 nanos, the Tables.events shape)
  private def frame(rows: Seq[(String, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("event_type", "minute", "value")
      .select(col("event_type"),
        (col("minute") * lit(60000000000L)).as("ts"), col("value"))
  }

  test("exact linear data recovers the exact per-day slope and sign") {
    // value climbs 0.001/minute: slope = 1000 fx/min = 1,440,000 fx/day
    val up = (0L until 200L).map(i => ("up", i, 0.5 + 0.001 * i))
    val dn = (0L until 200L).map(i => ("dn", i, 5.0 - 0.002 * i))
    val out = Temporal.trendOf(frame(up ++ dn))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("up") == ((200L, 1L, 1440000L)))
    assert(out("dn") == ((200L, -1L, 2880000L)))
  }

  test("constant values and degenerate groups are flat and zero-safe") {
    val flat = (0L until 50L).map(i => ("flat", i, 2.5))
    val single = Seq(("single", 7L, 1.0))
    // two rows in the same minute: den = 0, slope must be 0 not a crash
    val samet = Seq(("samet", 3L, 1.0), ("samet", 3L, 9.0))
    val out = Temporal.trendOf(frame(flat ++ single ++ samet))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out("flat") == ((0L, 0L)))
    assert(out("single") == ((0L, 0L)))
    assert(out("samet")._2 == 0L)
  }

  test("noise around a trend keeps the sign; slope is within the planted rate") {
    // alternate +-0.4 noise on a 0.01/minute climb: OLS sign must hold
    val rows = (0L until 400L).map { i =>
      val noise = if (i % 2 == 0) 0.4 else -0.4
      ("noisy", i, 10.0 + 0.01 * i + noise)
    }
    val Array(r) = Temporal.trendOf(frame(rows)).collect()
    assert(r.getLong(2) == 1L)
    val slope = r.getLong(3) // fx/day; planted 0.01*1e6*1440 = 14.4M
    assert(slope > 13000000L && slope < 16000000L, s"slope $slope")
  }
}
