package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.DataFrame

/** Cross-corpus near-dup contamination (q69). MinHash is not
  * SQL-expressible, so the driver check is rows-only and the semantics
  * are pinned here: a lightly-edited copy of a benchmark document is
  * flagged, an unrelated document is not, and exact copies score
  * Jaccard 1.0.
  */
class CrossCorpusSpec extends SparkSpec {

  private def df(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  private val benchText =
    "the committee reviewed the annual budget proposal and approved the " +
      "allocation of funds for the new research initiative in the spring"

  test("lightly-edited benchmark copies are flagged; unrelated docs are not") {
    val bench = df(Seq((100L, "bench", benchText)))
    val corpus = df(Seq(
      // one word changed — high Jaccard near-dup, must be flagged
      (1L, "s1", benchText.replace("spring", "autumn")),
      // verbatim copy — exact contamination, must be flagged
      (2L, "s1", benchText),
      // unrelated text — must stay clean
      (3L, "s2", "completely different content about distributed query " +
        "engines and columnar storage formats with vectorized execution")))
    val got = Dedup.crossCorpusNearDups(corpus, bench, threshold = 0.5)
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_contaminated"),
          r.getAs[Long]("n_clean"), r.getAs[Double]("max_jaccard"))))
      .toMap
    assert(got("s1")._1 == 2L && got("s1")._2 == 2L && got("s1")._3 == 0L)
    assert(got("s1")._4 == 1.0) // the verbatim copy
    assert(got("s2") == ((1L, 0L, 1L, 0.0)))
  }

  test("empty benchmark contaminates nothing") {
    val corpus = df(Seq((1L, "s1", benchText)))
    val bench = df(Seq.empty[(Long, String, String)])
    val got = Dedup.crossCorpusNearDups(corpus, bench).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("n_contaminated") == 0L)
    assert(got.head.getAs[Long]("n_clean") == 1L)
  }

  test("q69 runs on the test corpus and covers every source") {
    val out = Dedup.q69CrossContamination(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("n_contaminated") + r.getAs[Long]("n_clean"))
    }
  }
}
