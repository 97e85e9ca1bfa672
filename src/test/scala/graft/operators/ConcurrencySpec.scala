package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sweep-line concurrency histogram (q131). The driver hash-matches a
  * plain-global-window oracle; these fixtures pin the sweep semantics
  * (inclusive ends, touching intervals don't stack, idle gaps surface
  * as level 0) and prove the bucketed two-phase scan is exactly the
  * single-window computation across bucket boundaries.
  */
class ConcurrencySpec extends SparkSpec {

  private def run(iv: Seq[(Long, Long)], bucketUs: Long): Map[Long, Long] = {
    import spark.implicits._
    Temporal.concurrencyHistogram(iv.toDF("start_us", "end_us"), bucketUs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("hand-computed overlap profile, inclusive ends") {
    // [0,9] and [5,14] overlap on [5,9]; [20,29] is isolated
    val got = run(Seq((0L, 9L), (5L, 14L), (20L, 29L)), bucketUs = 1000L)
    assert(got == Map(0L -> 5L, 1L -> 20L, 2L -> 5L))
  }

  test("touching intervals do not stack: departure sorts before arrival") {
    val got = run(Seq((0L, 9L), (10L, 19L)), bucketUs = 1000L)
    assert(got == Map(1L -> 20L, 0L -> 0L))
  }

  test("single-point interval occupies exactly 1us") {
    val got = run(Seq((5L, 5L)), bucketUs = 1000L)
    assert(got == Map(1L -> 1L, 0L -> 0L))
  }

  test("span conservation: total duration = max(end)+1 - min(start)") {
    val iv = (1L to 50L).map(i => ((i * 7919) % 1000, (i * 7919) % 1000 + (i * 31) % 200))
    val got = run(iv, bucketUs = 97L)
    val span = iv.map(_._2).max + 1 - iv.map(_._1).min
    assert(got.values.sum == span)
  }

  test("bucketed scan equals the single-window sweep across bucket boundaries") {
    import spark.implicits._
    val iv = (1L to 200L).map { i =>
      val a = (i * 104729) % 10000
      (a, a + (i * 7919) % 500)
    }
    // tiny buckets force many boundary crossings incl. empty buckets
    val got = run(iv, bucketUs = 53L)
    val d = iv.toDF("s", "e")
      .select(col("s").as("ts"), lit(1L).as("delta"))
      .unionByName(iv.toDF("s", "e").select((col("e") + 1).as("ts"), lit(-1L).as("delta")))
    val w = Window.orderBy(col("ts"), col("delta"))
    val want = d
      .withColumn("level", sum(col("delta")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("dur", coalesce(lead(col("ts"), 1).over(w) - col("ts"), lit(0L)))
      .groupBy(col("level")).agg(sum(col("dur")).as("total_us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("plan has no SinglePartition window") {
    import spark.implicits._
    val df = Temporal.concurrencyHistogram(
      Seq((0L, 9L), (5L, 14L)).toDF("start_us", "end_us"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"SinglePartition in:\n$plan")
  }
}
