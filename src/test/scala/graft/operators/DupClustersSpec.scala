package graft.operators

import graft.mr.SparkSpec

/** End-to-end near-dup dedup on documents that actually contain
  * duplicates (the driver's synthetic corpus has none — q20's
  * best_jaccard tops out ~0.3 there — so this spec constructs a corpus
  * with known duplicate structure and pins the full pipeline: shingle
  * -> minhash -> banded LSH -> exact-Jaccard verify -> connected
  * components -> keep-one-per-cluster).
  */
class DupClustersSpec extends SparkSpec {

  private val base1 =
    "the quick brown fox jumps over the lazy dog while the cat watches " +
      "from the warm windowsill and the rain falls gently on the quiet street"
  private val base2 =
    "distributed query engines shuffle partitioned data across executors " +
      "while the optimizer prunes columns and pushes filters into the scan"

  test("near-identical docs cluster together; unrelated docs stay singletons") {
    import spark.implicits._
    val docs = Seq(
      // cluster A: identical + one-word edits of base1
      (0L, base1),
      (1L, base1),
      (2L, base1.replace("lazy", "sleepy")),
      // cluster B: base2 + small edit
      (10L, base2),
      (11L, base2.replace("columns", "rows")),
      // unrelated singletons
      (20L, "completely different text about cooking pasta with garlic and olive oil in a large pan"),
      (21L, "an unrelated document describing mountain hiking trails and alpine weather conditions")
    ).toDF("doc_id", "text")

    val got = Dedup.dupClusters(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"), r.getAs[Boolean]("keep"))))
      .toMap

    assert(got(0L) == ((0L, 3L, true)), got)
    assert(got(1L) == ((0L, 3L, false)), got)
    assert(got(2L) == ((0L, 3L, false)), got)
    assert(got(10L) == ((10L, 2L, true)), got)
    assert(got(11L) == ((10L, 2L, false)), got)
    assert(got(20L) == ((20L, 1L, true)), got)
    assert(got(21L) == ((21L, 1L, true)), got)
    // "keep one per cluster" leaves exactly the distinct content
    assert(got.values.count(_._3) == 4)
  }

  test("an identical-content flood beyond the LSH bucket cap still dedups (exact collapse first)") {
    import spark.implicits._
    // 3x the hot-bucket cap of identical docs: pure LSH would drop
    // their (single, oversized) bucket and every one would survive
    // dedup; the exact-collapse stage must catch them all
    val flood = (0L until (LshJoin.MaxBucket * 3L)).map(i => (i, base1))
    val docs = (flood :+ (9999L, base2)).toDF("doc_id", "text")
    val got = Dedup.dupClusters(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"), r.getAs[Boolean]("keep"))))
      .toMap
    flood.foreach { case (id, _) =>
      assert(got(id) == ((0L, LshJoin.MaxBucket * 3L, id == 0L)), s"id=$id -> ${got(id)}")
    }
    assert(got(9999L) == ((9999L, 1L, true)))
    assert(got.values.count(_._3) == 2) // one survivor per distinct content
  }

  test("threshold controls NEAR-dup edges; exact dups collapse at any threshold") {
    import spark.implicits._
    val near = base1.replace("lazy", "sleepy")
    val docs = Seq((0L, base1), (1L, base1), (2L, near)).toDF("doc_id", "text")
    // impossible Jaccard: near-dup edges vanish, exact pair still collapses
    val strict = Dedup.dupClusters(docs, threshold = 1.01).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_size")).toMap
    assert(strict == Map(0L -> 2L, 1L -> 2L, 2L -> 1L), strict)
    // permissive: the one-word edit joins the cluster
    val loose = Dedup.dupClusters(docs, threshold = 0.7).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_size")).toMap
    assert(loose == Map(0L -> 3L, 1L -> 3L, 2L -> 3L), loose)
  }
}
