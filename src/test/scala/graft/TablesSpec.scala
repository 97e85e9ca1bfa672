package graft

import graft.mr.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-drift canary for the driver testdata (TESTDATA.md). Round 9
  * lost 20 driver queries because the physical type of `events.ts`
  * changed vintage (int64 nanos → parquet TIMESTAMP_NTZ) and every
  * event-time operator trusted the physical layout. This suite pins the
  * LOGICAL contract each loader must deliver — so a future vintage
  * change fails HERE, loudly, instead of 20 analysis errors downstream.
  */
class TablesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("every driver table loads and is non-empty") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      val df = Tables.load(spark, dir, t)
      assert(df.limit(1).count() == 1, s"table $t is empty or unreadable")
    }
  }

  test("events delivers the canonical event-time contract: ts is int64 nanos") {
    val e = Tables.events(spark, dir)
    assert(e.schema("ts").dataType == LongType,
      s"Tables.events must canonicalize ts to LongType nanos, got ${e.schema("ts").dataType}")
    // the operators' idiom must ANALYZE against whatever vintage is on
    // disk — this line is exactly what died in round 9
    val Row(us: Long) = e.agg(max(expr("ts div 1000"))).head()
    // plausibility window: micros-since-epoch between 2000 and 2100
    assert(us > 946684800000000L && us < 4102444800000000L,
      s"ts div 1000 = $us is not micros-since-epoch — wrong unit in normalization")
    val required = Set("event_id", "user_id", "event_type", "value", "props")
    assert(required.subsetOf(e.columns.toSet),
      s"events missing required columns: ${required -- e.columns.toSet}")
  }

  test("events canonical micros agree with the physical timestamp instants") {
    // the raw vintage on disk today is TIMESTAMP_NTZ(us); under the UTC
    // session, canonical ts div 1000 must equal unix_micros of the cast
    // instant — the same value DuckDB's epoch_us(ts) sees
    val raw = Tables.eventsRaw(spark, dir)
    raw.schema("ts").dataType match {
      case LongType => succeed // already canonical vintage: nothing to cross-check
      case _ =>
        val expected = raw.select(
          col("event_id"),
          (unix_micros(col("ts").cast(TimestampType)) * 1000L).as("want"))
        val got = Tables.events(spark, dir).select(col("event_id"), col("ts"))
        val diff = got.join(expected, "event_id")
          .filter(col("ts") =!= col("want")).count()
        assert(diff == 0, s"$diff rows where canonical ts != instant micros*1000")
    }
  }

  test("normalizeEventTime handles all three vintages instant-preservingly") {
    import spark.implicits._
    val us = 1735689600123456L // 2025-01-01T00:00:00.123456Z
    // vintage 1: already int64 nanos — passthrough
    val fromLong = Tables.normalizeEventTime(Seq(us * 1000L).toDF("ts"))
    assert(fromLong.head().getLong(0) == us * 1000L)
    // vintage 2: TIMESTAMP (instant)
    val tz = Seq(us).toDF("us").select(timestamp_micros(col("us")).as("ts"))
    assert(tz.schema("ts").dataType == TimestampType)
    assert(Tables.normalizeEventTime(tz).head().getLong(0) == us * 1000L)
    // vintage 3: TIMESTAMP_NTZ — UTC session makes the cast instant-preserving
    val ntz = tz.select(col("ts").cast(TimestampNTZType).as("ts"))
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    assert(Tables.normalizeEventTime(ntz).head().getLong(0) == us * 1000L)
  }

  test("normalizeEventTime fails loudly on an unsupported vintage") {
    import spark.implicits._
    val bad = Seq("2025-01-01").toDF("ts")
    val e = intercept[IllegalStateException] {
      Tables.normalizeEventTime(bad)
    }
    assert(e.getMessage.contains("unsupported physical type"))
  }

  test("key tables keep their join-key columns") {
    val keys = Map(
      "lineitem" -> Set("l_orderkey", "l_partkey", "l_suppkey"),
      "orders" -> Set("o_orderkey", "o_custkey"),
      "customer" -> Set("c_custkey", "c_nationkey"),
      "supplier" -> Set("s_suppkey", "s_nationkey"),
      "part" -> Set("p_partkey"),
      "nation" -> Set("n_nationkey", "n_regionkey"),
      "region" -> Set("r_regionkey"),
      "documents" -> Set("doc_id", "text"),
      "embeddings" -> Set("vec_id", "embedding"))
    keys.foreach { case (t, cols) =>
      val have = Tables.load(spark, dir, t).columns.toSet
      assert(cols.subsetOf(have), s"$t missing ${cols -- have}")
    }
  }
}
