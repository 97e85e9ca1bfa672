package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.DataFrame

/** Sign-bucket semantic dedup (q89). The driver hash-matches a full
  * SQL replay; these fixtures pin the semantics on planted geometry:
  * scaled copies are dropped toward their lowest-id original, distinct
  * directions survive, opposite-sign vectors never pair (blocking
  * contract), and the shadow chain picks the SMALLEST qualifying id.
  */
class SemDedupSpec extends SparkSpec {

  private def emb(rows: Seq[(Long, Seq[Float])]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def run(rows: Seq[(Long, Seq[Float])],
      threshold: Double = 0.99): Seq[(Long, Long)] =
    Similarity.semDedup(emb(rows), threshold = threshold)
      .collect()
      .map(r => r.getAs[Long]("dropped_id") -> r.getAs[Long]("kept_id"))
      .sortBy(_._1).toSeq

  test("scaled copies drop toward the lowest-id original") {
    val v = Seq(0.6f, 0.8f, 0.1f, 0.2f)
    val got = run(Seq(
      1L -> v,
      2L -> v.map(x => x * 2.0f),   // same direction: cosine 1
      3L -> v.map(x => x * 0.5f),   // same direction again
      4L -> Seq(0.8f, -0.6f, 0.1f, 0.2f))) // different direction AND bucket
    assert(got == Seq(2L -> 1L, 3L -> 1L))
  }

  test("opposite-sign vectors never pair: blocking is part of the contract") {
    val v = Seq(0.6f, 0.8f, 0.1f, 0.2f)
    // cosine(v, -v) = -1 anyway, but even a hypothetical high-cosine
    // cross-bucket pair is out of scope by construction
    assert(run(Seq(1L -> v, 2L -> v.map(-_))) == Seq.empty)
  }

  test("near-but-not-identical directions respect the threshold") {
    val v = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val w = Seq(1.0f, 0.2f, 0.0f, 0.0f) // cosine ~ 0.981
    assert(run(Seq(1L -> v, 2L -> w), threshold = 0.99) == Seq.empty)
    assert(run(Seq(1L -> v, 2L -> w), threshold = 0.97) == Seq(2L -> 1L))
  }

  test("q89 binding drops exactly the planted copies") {
    val got = Similarity.q89SemDedup(spark, "/root/testdata/sf0.01").collect()
    assert(got.length == 15)
    assert(got.forall { r =>
      r.getAs[Long]("dropped_id") == r.getAs[Long]("kept_id") + 10000 &&
        r.getAs[Double]("cosine") > 0.999
    })
  }
}
