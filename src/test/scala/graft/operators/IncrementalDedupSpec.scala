package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.DataFrame

/** Incremental new-batch-vs-existing dedup (q78). The driver
  * hash-matches a plain semi-join oracle; these fixtures pin the
  * classification itself: verbatim copies are dups, edited copies are
  * new (the exact verify removes Bloom false positives by
  * construction), and an empty existing corpus makes everything new.
  */
class IncrementalDedupSpec extends SparkSpec {

  private def df(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  test("verbatim copies are dups; edited and novel docs are new") {
    val existing = df(Seq(
      (1L, "old", "the quick brown fox jumps over the lazy dog"),
      (2L, "old", "distributed query engines use columnar storage")))
      .select(org.apache.spark.sql.functions.col("text"))
    val incoming = df(Seq(
      (10L, "s1", "the quick brown fox jumps over the lazy dog"), // dup
      (11L, "s1", "the quick brown fox jumps over the lazy dogs"), // one char off: new
      (12L, "s2", "entirely novel content about stream processing")))
    val got = Dedup.incrementalDedup(existing, incoming)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_incoming"), r.getAs[Long]("n_dup"), r.getAs[Long]("n_new"))))
      .toMap
    assert(got("s1") == ((2L, 1L, 1L)))
    assert(got("s2") == ((1L, 0L, 1L)))
  }

  test("empty existing corpus classifies everything as new") {
    val existing = df(Seq.empty[(Long, String, String)])
      .select(org.apache.spark.sql.functions.col("text"))
    val incoming = df(Seq((1L, "s1", "anything at all")))
    val got = Dedup.incrementalDedup(existing, incoming).collect().head
    assert(got.getAs[Long]("n_dup") == 0L)
    assert(got.getAs[Long]("n_new") == 1L)
  }

  test("q78 plants deterministic cross-batch dups: dup and new both non-empty") {
    val rows = Dedup.q78IncrementalDedup(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    var dup = 0L; var n = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("n_incoming") ==
        r.getAs[Long]("n_dup") + r.getAs[Long]("n_new"))
      dup += r.getAs[Long]("n_dup"); n += r.getAs[Long]("n_incoming")
    }
    assert(dup > 0L && dup < n)
  }
}
