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

  test("mass-duplicate flood: N identical copies collapse to one probe and all inherit the verdict") {
    val bench = df(Seq((100L, "bench", benchText)))
    // 200 verbatim copies of a near-benchmark doc (> LshJoin.MaxBucket):
    // without the exact-collapse stage these would either blow the
    // candidate broadcast or be dropped by the fan-out cap; with it they
    // probe as ONE representative and every copy inherits its verdict
    val flood = (1L to 200L).map(i =>
      (i, "s1", benchText.replace("spring", "autumn")))
    val got = Dedup.crossCorpusNearDups(
      df(flood :+ ((300L, "s2", "unrelated content about columnar " +
        "storage engines and vectorized execution pipelines"))),
      bench, threshold = 0.5).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(got("s1").getAs[Long]("n_docs") == 200L)
    assert(got("s1").getAs[Long]("n_contaminated") == 200L)
    assert(got("s2").getAs[Long]("n_contaminated") == 0L)
    // the collapse leaves a single distinct representative per bucket,
    // so the fan-out cap drops nothing
    got.values.foreach { r =>
      assert(r.getAs[Long]("n_dropped_buckets") == 0L)
      assert(r.getAs[Long]("n_dropped_members") == 0L)
    }
  }

  test("over-cap buckets are dropped with surfaced stats and invariants hold") {
    val bench = df(Seq((100L, "bench", benchText)))
    // five DISTINCT near-dups of the benchmark text: they share most
    // bands, so bucketCap = 1 forces hot-bucket drops
    val variants = Seq("spring", "summer", "autumn", "winter", "solstice")
      .zipWithIndex.map { case (w, i) =>
        ((i + 1).toLong, "s1", benchText.replace("spring", w))
      }
    val out = Dedup.crossCorpusNearDups(
      df(variants), bench, threshold = 0.5, bucketCap = 1).collect()
    assert(out.nonEmpty)
    assert(out.head.getAs[Long]("n_dropped_buckets") >= 1L)
    assert(out.head.getAs[Long]("n_dropped_members") >= 2L)
    out.foreach { r =>
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("n_contaminated") + r.getAs[Long]("n_clean"))
    }
  }

  test("shuffle-join fallback (maxBroadcastCand = 0) matches the broadcast path") {
    val bench = df(Seq((100L, "bench", benchText)))
    val corpus = df(Seq(
      (1L, "s1", benchText.replace("spring", "autumn")),
      (2L, "s1", benchText),
      (3L, "s2", "completely different content about distributed query " +
        "engines and columnar storage formats with vectorized execution")))
    val broadcastPath = Dedup.crossCorpusNearDups(corpus, bench, threshold = 0.5)
      .collect().map(_.toString).sorted
    val shufflePath = Dedup.crossCorpusNearDups(
        corpus, bench, threshold = 0.5, maxBroadcastCand = 0L)
      .collect().map(_.toString).sorted
    assert(broadcastPath.sameElements(shufflePath))
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
