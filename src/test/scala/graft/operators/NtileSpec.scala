package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact NTILE (q87). The driver hash-matches DuckDB's
  * single-partition NTILE(8); these fixtures pin the bucket formula
  * against Spark's own `ntile` window function (single partition,
  * ground truth) across remainder shapes — n divisible by k, n < k,
  * n % k != 0 — and assert the two-phase plan carries no global
  * single-partition exchange.
  */
class NtileSpec extends SparkSpec {

  private def viaWindow(rows: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    import spark.implicits._
    rows.toDF("id", "score")
      .withColumn("bucket",
        ntile(k).over(Window.orderBy(col("score"), col("id"))).cast("long"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("bucket")).toMap
  }

  private def viaTwoPhase(rows: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    import spark.implicits._
    Relational.exactNtile(rows.toDF("id", "score"), k)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("bucket")).toMap
  }

  test("matches window NTILE across remainder shapes") {
    val rng = new scala.util.Random(11)
    for ((n, k) <- Seq((24, 8), (25, 8), (31, 8), (5, 8), (1, 3), (100, 7))) {
      val rows = (1L to n.toLong).map(i => i -> rng.nextInt(10).toLong)
      assert(viaTwoPhase(rows, k) == viaWindow(rows, k), s"diverged at n=$n k=$k")
    }
  }

  test("bucket sizes differ by at most one, earlier buckets larger") {
    val rows = (1L to 43L).map(i => i -> (i % 9))
    val sizes = viaTwoPhase(rows, 8).groupBy(_._2).map { case (b, m) => b -> m.size }
    assert(sizes.values.max - sizes.values.min <= 1)
    val sorted = sizes.toSeq.sortBy(_._1).map(_._2)
    assert(sorted == sorted.sortBy(-_), s"remainder not front-loaded: $sorted")
  }

  test("no single-partition exchange in the two-phase plan") {
    import spark.implicits._
    val plan = Relational.exactNtile(
      (1L to 50L).map(i => i -> i).toDF("id", "score"), 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"two-phase ntile must not plan a global single-partition exchange:\n$plan")
  }

  test("q87 binding: 8 buckets, front-loaded sizes, ordered ranges") {
    val rows = Relational.q87NtileStratify(spark, "/root/testdata/sf0.01").collect()
    assert(rows.map(_.getAs[Long]("bucket")).toSeq == (1L to 8L))
    val mins = rows.map(_.getAs[Long]("min_chars"))
    val maxs = rows.map(_.getAs[Long]("max_chars"))
    // octile ranges are non-overlapping and ascending
    assert(maxs.zip(mins.tail).forall { case (hi, nextLo) => hi <= nextLo })
  }
}
