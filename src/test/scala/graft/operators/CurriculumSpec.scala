package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** Length-curriculum schedule (q145). The driver hash-matches the
  * DuckDB mirror; these fixtures pin the ntile bucket arithmetic, the
  * (n_tok, doc_id) total order, and partition invariance.
  */
class CurriculumSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def schedule(rows: Seq[(Long, String, Long)], parts: Int = 1): DataFrame = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "source", "n_tok").repartition(parts)
    df.withColumn("bucket", ntile(Curation.CurriculumBuckets).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
          .orderBy(col("n_tok"), col("doc_id"))).cast("long"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_tok")).as("min_tok"), max(col("n_tok")).as("max_tok"),
        sum(col("n_tok")).as("sum_tok"))
  }

  test("ntile splits 12 docs into 10 buckets as 2,2,1,...,1 in length order") {
    val rows = (1L to 12L).map(i => (i, "s", i * 10)) // strictly increasing lengths
    val got = schedule(rows).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == (1L to 10L).toSet)
    assert(got(1L) == ((2L, 10L, 20L)))  // first two buckets get the extra doc
    assert(got(2L) == ((2L, 30L, 40L)))
    assert(got(3L) == ((1L, 50L, 50L)))
    assert(got(10L) == ((1L, 120L, 120L)))
  }

  test("equal lengths: doc_id breaks ties, buckets stay deterministic") {
    val rows = (1L to 20L).map(i => (i, "s", 7L)) // all the same length
    val a = schedule(rows, parts = 1).collect().map(_.toString).sorted.toSeq
    val b = schedule(rows, parts = 13).collect().map(_.toString).sorted.toSeq
    assert(a == b)
    // every bucket carries exactly 2 docs
    val counts = schedule(rows).collect().map(_.getAs[Long]("n_docs")).toSeq
    assert(counts.forall(_ == 2L))
  }

  test("sources bucket independently") {
    val rows = (1L to 10L).map(i => (i, "a", i)) ++ (11L to 13L).map(i => (i, "b", i))
    val got = schedule(rows).collect()
    assert(got.count(_.getString(0) == "a") == 10)
    assert(got.count(_.getString(0) == "b") == 3) // 3 docs -> buckets 1..3 only
  }

  test("q145 on the test data: dense schedule, totals cover the corpus") {
    val rows = Curation.q145CurriculumSchedule(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == graft.Tables.documents(spark, "/root/testdata/sf0.001").count())
    rows.foreach { r =>
      assert(r.getAs[Long]("min_tok") <= r.getAs[Long]("max_tok"))
      val b = r.getAs[Long]("bucket")
      assert(b >= 1L && b <= Curation.CurriculumBuckets)
    }
  }
}
