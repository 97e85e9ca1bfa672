package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.DataFrame

/** Embedding-space decontamination (q71). The driver hash-matches the
  * fixed-point rollup; these fixtures pin the semantics: an exact
  * embedding copy scores cosine 1.0 and is flagged, an orthogonal
  * vector stays clean, zero vectors never produce NaN, and an empty
  * benchmark contaminates nothing.
  */
class EmbedDecontamSpec extends SparkSpec {

  private def df(rows: Seq[(Long, Int, Array[Float])]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "label", "embedding")
  }

  private val v1 = Array(1f, 0f, 0f, 0f)
  private val v2 = Array(0f, 1f, 0f, 0f) // orthogonal to v1
  private val near = Array(0.9f, 0.1f, 0f, 0f)

  test("exact copy is flagged at cosine 1.0; orthogonal vector stays clean") {
    val corpus = df(Seq((1L, 0, v1), (2L, 1, v2)))
    val bench = df(Seq((100L, 9, v1)))
    val got = Similarity.embedDecontaminate(corpus, bench, threshold = 0.5)
      .collect().map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("n_contaminated"), r.getAs[Double]("max_cosine")))).toMap
    assert(got(0) == ((1L, 1.0)))
    assert(got(1)._1 == 0L)
    assert(math.abs(got(1)._2) < 1e-9)
  }

  test("near-duplicate embedding above threshold is flagged") {
    val corpus = df(Seq((1L, 0, near)))
    val bench = df(Seq((100L, 9, v1)))
    val got = Similarity.embedDecontaminate(corpus, bench, threshold = 0.9)
      .collect()
    // cos(near, v1) = 0.9/sqrt(0.82) ~ 0.9939
    assert(got.head.getAs[Long]("n_contaminated") == 1L)
    assert(got.head.getAs[Double]("max_cosine") > 0.99)
  }

  test("zero vectors score 0.0, never NaN") {
    val corpus = df(Seq((1L, 0, Array(0f, 0f, 0f, 0f))))
    val bench = df(Seq((100L, 9, v1)))
    val got = Similarity.embedDecontaminate(corpus, bench, threshold = 0.5).collect()
    assert(got.head.getAs[Long]("n_clean") == 1L)
    assert(got.head.getAs[Double]("max_cosine") == 0.0)
  }

  test("empty benchmark contaminates nothing") {
    val corpus = df(Seq((1L, 0, v1), (2L, 1, v2)))
    val bench = df(Seq.empty[(Long, Int, Array[Float])])
    val got = Similarity.embedDecontaminate(corpus, bench).collect()
    assert(got.length == 2)
    got.foreach { r =>
      assert(r.getAs[Long]("n_contaminated") == 0L)
      assert(r.getAs[Long]("n_clean") == 1L)
    }
  }

  test("q71 runs on the test corpus with conserved counts") {
    val rows = Similarity.q71EmbedDecontaminate(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vecs") ==
        r.getAs[Long]("n_contaminated") + r.getAs[Long]("n_clean"))
    }
  }
}
