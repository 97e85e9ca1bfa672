package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** k-NN majority-vote classification (q143). The driver hash-matches
  * the DuckDB mirror; these fixtures pin the vote semantics — majority,
  * vote-count tie toward the smaller label — and that prediction uses
  * NEIGHBOR labels only (a probe's own label never votes).
  */
class KnnClassifySpec extends SparkSpec {

  /** Clustered fixture around two poles; probe ids < 10 (the binding's
    * probe rule), corpus ids >= 10.
    */
  private def fixture: Seq[(Long, Long, Array[Float])] = {
    def around(x: Float, y: Float, eps: Float): Array[Float] = Array(x + eps, y, 0f, 0f)
    Seq[(Long, Long, Array[Float])](
      // probe 0 labeled 0, sitting in the label-0 cluster
      (0L, 0L, around(1f, 0f, 0f)),
      // probe 1 labeled 1 but sitting in the label-0 cluster (mislabel probe)
      (1L, 1L, around(1f, 0f, 0.001f)),
      // label-0 cluster (5 members)
      (10L, 0L, around(1f, 0f, 0.01f)), (11L, 0L, around(1f, 0f, 0.02f)),
      (12L, 0L, around(1f, 0f, 0.03f)), (13L, 0L, around(1f, 0f, 0.04f)),
      (14L, 0L, around(1f, 0f, 0.05f)),
      // label-1 cluster far away
      (20L, 1L, around(-1f, 0.5f, 0.01f)), (21L, 1L, around(-1f, 0.5f, 0.02f)),
      (22L, 1L, around(-1f, 0.5f, 0.03f)))
  }

  private def classify(rows: Seq[(Long, Long, Array[Float])]): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    graft.functions.FingerprintFunctions.register(spark)
    val emb = rows.toDF("vec_id", "label", "embedding")
    val labels = emb.select(col("vec_id"), col("label"))
    val probeLabels = labels.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("label").as("true_label"))
    val neigh = labels.join(
      broadcast(Similarity.knnBruteOf(emb, Similarity.KnnClassifyK)
        .join(broadcast(probeLabels), "probe_id")), "vec_id")
    neigh
      .groupBy(col("probe_id"), col("true_label"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .groupBy(col("probe_id"), col("true_label"))
      .agg(min(struct((-col("votes")).as("neg"), col("label"))).as("w"))
      .select(col("probe_id"), col("true_label"),
        col("w.label").as("pred_label"), (-col("w.neg")).as("n_votes"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
  }

  test("probes inherit the label of their surrounding cluster") {
    val got = classify(fixture)
    // probe 0: neighbors are the label-0 cluster (and probe 1, labeled 1)
    val (t0, p0, v0) = got(0L)
    assert(t0 == 0L && p0 == 0L && v0 == 4L) // 4 label-0 + probe1's 1 vote
    // probe 1 is labeled 1 but embedded in label-0 space: k-NN flags it
    val (t1, p1, v1) = got(1L)
    assert(t1 == 1L && p1 == 0L && v1 == 5L) // probe 0 also votes 0
  }

  test("vote tie breaks toward the smaller label") {
    // probe at the midpoint with 2 clean votes each side; 5th neighbor
    // removed by keeping corpus size at 4
    def v(x: Float, eps: Float): Array[Float] = Array(x, 1f + eps, 0f, 0f)
    val rows = Seq[(Long, Long, Array[Float])](
      (0L, 9L, Array(0f, 1f, 0f, 0f)),
      (10L, 2L, v(0.1f, 0.00f)), (11L, 2L, v(-0.1f, 0.01f)),
      (20L, 4L, v(0.1f, 0.01f)), (21L, 4L, v(-0.1f, 0.00f)))
    val (_, pred, votes) = classify(rows)(0L)
    assert(votes == 2L)
    assert(pred == 2L, "2-2 vote tie must resolve to the smaller label")
  }

  test("q143 runs on the test data with one row per probe") {
    val rows = Similarity.q143KnnClassify(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_votes") >= 1L &&
        r.getAs[Long]("n_votes") <= Similarity.KnnClassifyK)
    }
  }
}
