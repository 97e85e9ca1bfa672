package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.DataFrame

/** Cluster-atomic split (q79): near-dup and exact-dup documents must
  * land in the SAME split (the leakage invariant), assignment must be
  * content-stable under repartitioning, and every document gets exactly
  * one split.
  */
class ClusterSplitSpec extends SparkSpec {

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val base =
    "the committee reviewed the annual budget proposal and approved the " +
      "allocation of funds for the new research initiative in the spring"

  test("near-dup and exact-dup members land in the representative's split") {
    val docs = df(Seq(
      (1L, base),
      (2L, base), // exact dup of 1
      (3L, base.replace("spring", "autumn")), // near dup of 1
      (4L, "completely unrelated content about columnar execution engines " +
        "and distributed shuffle services with adaptive planning")))
    val got = Dedup.clusterSafeSplit(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[String]("split")))).toMap
    assert(got.size == 4)
    // 1, 2, 3 share a cluster and therefore a split
    assert(got(1L)._1 == got(2L)._1 && got(2L)._1 == got(3L)._1)
    assert(got(1L)._2 == got(2L)._2 && got(2L)._2 == got(3L)._2)
    assert(Set("train", "val", "test").contains(got(4L)._2))
  }

  test("assignment is stable under repartitioning") {
    val docs = df((1L to 40L).map(i => (i, s"document number $i with some " +
      s"padding tokens alpha beta gamma delta epsilon zeta $i")))
    val a = Dedup.clusterSafeSplit(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val b = Dedup.clusterSafeSplit(docs.repartition(7)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(a == b)
  }

  test("exact-edge variant: same atomicity, and it agrees with the LSH mode here") {
    val docs = df(Seq(
      (1L, base),
      (2L, base), // exact dup of 1
      (3L, base.replace("spring", "autumn")), // near dup of 1
      (4L, "completely unrelated content about columnar execution engines " +
        "and distributed shuffle services with adaptive planning")))
    val exact = Dedup.clusterSafeSplitExact(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"),
          r.getAs[String]("split")))).toMap
    assert(exact.size == 4)
    assert(exact(1L)._1 == exact(2L)._1 && exact(2L)._1 == exact(3L)._1)
    assert(exact(1L)._3 == exact(2L)._3 && exact(2L)._3 == exact(3L)._3)
    assert(exact(1L)._2 == 3L && exact(4L)._2 == 1L)
    // on a fixture where LSH recall is perfect the two modes coincide
    val lsh = Dedup.clusterSafeSplit(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[String]("split")))).toMap
    assert(exact.view.mapValues(v => (v._1, v._3)).toMap == lsh)
  }

  test("q79 covers every document exactly once across splits") {
    val d = "/root/testdata/sf0.001"
    val rows = Dedup.q79ClusterSplit(spark, d).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == graft.Tables.documents(spark, d).count())
    rows.foreach(r => assert(r.getAs[Long]("n_clusters") <= r.getAs[Long]("n_docs")))
  }
}
