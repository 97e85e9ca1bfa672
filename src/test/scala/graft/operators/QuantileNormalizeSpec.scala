package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** Quantile normalization (q126). The driver hash-matches the
  * plain-window SQL oracle; these fixtures pin the rank map
  * `norm = pooled value at ceil(r*N/ns)` on hand-computed cases, the
  * identity invariant for already-aligned sources, and a randomized
  * differential proving [[Curation.globalRank]]'s two-phase bucketed
  * scan equals a plain global ROW_NUMBER.
  */
class QuantileNormalizeSpec extends SparkSpec {

  private def stats(rows: Seq[(Long, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "n_tok")
  }

  private def run(rows: Seq[(Long, String, Long)]): Map[Long, Long] =
    Curation.quantileNormalize(stats(rows))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("norm_tok")).toMap

  test("hand-computed map: two sources of different size and skew") {
    // pooled order: 1,2,4,5,6,8,9,10,12 at positions 1..9 (N=9)
    // source a (ns=3): r -> p = ceil(9r/3) = 3,6,9 -> 4,8,12
    // source b (ns=6): p = ceil(9r/6) = 2,3,5,6,8,9 -> 2,4,8,6... no:
    //   positions 2,3,5,6,8,9 -> values 2,4,6,8,10,12
    val rows = Seq(
      (1L, "a", 1L), (2L, "a", 5L), (3L, "a", 9L),
      (11L, "b", 2L), (12L, "b", 4L), (13L, "b", 6L),
      (14L, "b", 8L), (15L, "b", 10L), (16L, "b", 12L))
    assert(run(rows) == Map(
      1L -> 4L, 2L -> 8L, 3L -> 12L,
      11L -> 2L, 12L -> 4L, 13L -> 6L, 14L -> 8L, 15L -> 10L, 16L -> 12L))
  }

  test("sources with identical distributions are fixed points") {
    val rows = Seq(
      (1L, "a", 3L), (2L, "a", 7L),
      (11L, "b", 3L), (12L, "b", 7L))
    assert(run(rows) == Map(1L -> 3L, 2L -> 7L, 11L -> 3L, 12L -> 7L))
  }

  test("every doc appears exactly once in the output") {
    val rng = new Random(13)
    val rows = (1L to 150L).map(id =>
      (id, if (id % 3 == 0) "a" else "b", rng.nextInt(20).toLong))
    val out = Curation.quantileNormalize(stats(rows))
      .collect().map(_.getAs[Long]("doc_id"))
    assert(out.length == 150 && out.toSet.size == 150)
  }

  test("randomized differential: bucketed globalRank == plain ROW_NUMBER") {
    val rng = new Random(97)
    import spark.implicits._
    // ids straddle several RankBucketWidth buckets; heavy value ties
    val rows = (1 to 400).map { i =>
      (rng.nextLong().abs % 1000000L * 1000L + i, rng.nextInt(5).toLong)
    }.toDF("id", "v")
    val got = Curation.globalRank(rows)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank_g")).toMap
    val want = rows
      .withColumn("rank_g",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank_g")).toMap
    assert(got == want)
  }

  test("10^6 distinct values: driver fold stays range-bounded and ranks stay exact") {
    // Continuous-score regime — every v distinct, the case where the
    // old per-(v, gb) collect degenerated to one driver row per input
    // row. The fold must stay <= RankRangeCount, and the rank must
    // still equal a plain global ROW_NUMBER bit-for-bit.
    val n = 1000000L
    val rows = spark.range(n).toDF("id")
      .withColumn("v", xxhash64(col("id")))
    val (ranked, foldRows) = Curation.globalRankWithFold(rows)
    assert(foldRows <= Curation.RankRangeCount,
      s"driver fold was $foldRows rows; must be <= ${Curation.RankRangeCount}")
    val want = rows.withColumn("want",
      row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
    val r = ranked.join(want, Seq("id", "v"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("rank_g") =!= col("want"), 1L).otherwise(0L)).as("bad"))
      .head()
    assert(r.getLong(0) == n && r.getLong(1) == 0L)
  }
}
