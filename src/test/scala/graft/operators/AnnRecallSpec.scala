package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** Search-QUALITY pinning for the ANN family. The driver corpus is
  * near-uniform random (top-neighbor cosine ~0.37 vs noise p99 ~0.29 —
  * essentially structureless, where any sublinear method's recall is
  * bounded by geometry, measured ~0.2 for both LSH and IVF there). So,
  * like DupClustersSpec, this spec PLANTS structure: clustered corpora
  * where the true neighbors sit at cosine ~0.98 and a correct ANN
  * implementation must find them — separating "the data has no
  * neighbors" from "the index is broken".
  */
class AnnRecallSpec extends SparkSpec {

  private val dim = 64
  private val rnd = new scala.util.Random(31)

  private def randVec(): Array[Float] =
    Array.fill(dim)((rnd.nextDouble() - 0.5).toFloat)

  private def jitter(v: Array[Float]): Array[Float] = {
    // small perturbation: cosine vs v stays ~0.98
    v.map(x => x + (rnd.nextDouble() - 0.5).toFloat * 0.1f)
  }

  // 10 probes, each with 3 planted near-neighbors, plus 200 noise vecs
  private lazy val planted: Seq[(Long, Array[Float])] = {
    val probes = (0L until 10L).map(p => p -> randVec())
    val neighbors = probes.flatMap { case (p, v) =>
      (0 until 3).map(j => (100L + p * 10 + j) -> jitter(v))
    }
    val noise = (1000L until 1200L).map(i => i -> randVec())
    probes ++ neighbors ++ noise
  }

  private def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().groupBy(_.getAs[Long]("probe_id"))
      .map { case (p, rs) => p -> rs.map(_.getAs[Long]("vec_id")).toSet }

  test("brute-force top-3 finds exactly the planted neighbors") {
    import spark.implicits._
    val emb = planted.toDF("vec_id", "embedding")
    val got = topSets(Similarity.knnBruteOf(emb, 3))
    (0L until 10L).foreach { p =>
      assert(got(p) == Set(100L + p * 10, 101L + p * 10, 102L + p * 10),
        s"probe $p -> ${got(p)}")
    }
  }

  test("multiprobe LSH recall@3 on clustered data is >= 0.9") {
    import spark.implicits._
    val emb = planted.toDF("vec_id", "embedding")
    val truth = topSets(Similarity.knnBruteOf(emb, 3))
    val approx = topSets(Similarity.knnLshOf(emb, 3))
    val recall = (0L until 10L).map { p =>
      approx.getOrElse(p, Set.empty[Long]).intersect(truth(p)).size.toDouble / 3.0
    }.sum / 10.0
    assert(recall >= 0.9, s"recall=$recall")
  }

  test("IVF recall@3 on clustered data is >= 0.9") {
    import spark.implicits._
    val emb = planted.toDF("vec_id", "embedding")
    val truth = topSets(Similarity.knnBruteOf(emb, 3))
    val approx = topSets(Similarity.knnIvfOf(emb, 3))
    val recall = (0L until 10L).map { p =>
      approx.getOrElse(p, Set.empty[Long]).intersect(truth(p)).size.toDouble / 3.0
    }.sum / 10.0
    assert(recall >= 0.9, s"recall=$recall")
  }

  test("replayable IVFPQ (q169) recall@3 >= 0.9 on clustered data") {
    import spark.implicits._
    val emb = planted.toDF("vec_id", "embedding")
    val truth = topSets(Similarity.knnBruteOf(emb, 3))
    val approx = topSets(Similarity.knnIvfPqReplayOf(emb, 3))
    val recall = (0L until 10L).map { p =>
      approx.getOrElse(p, Set.empty[Long]).intersect(truth(p)).size.toDouble / 3.0
    }.sum / 10.0
    assert(recall >= 0.9, s"recall=$recall")
    // structural compression: 8 integer codes per vector vs 64 floats
    assert(Similarity.EmbedDims * 4.0 / Similarity.PqReplaySubspaces >= 8.0)
  }

  test("IVFPQ recall@3 >= 0.9 on clustered data at >= 8x vector compression") {
    import spark.implicits._
    val emb = planted.toDF("vec_id", "embedding")
    val truth = topSets(Similarity.knnBruteOf(emb, 3))
    val parts = Similarity.ivfPqBuild(emb, 3)
    val approx = topSets(parts.ranked)
    val recall = (0L until 10L).map { p =>
      approx.getOrElse(p, Set.empty[Long]).intersect(truth(p)).size.toDouble / 3.0
    }.sum / 10.0
    assert(recall >= 0.9, s"recall=$recall")
    // compression: every encoded row carries M one-byte codes for a
    // dim-float vector — dim*4 / M >= 8x guaranteed structurally
    val codeLens = parts.encoded.select(length(col("codes"))).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(codeLens == Set(Similarity.PqSubspaces), s"code widths: $codeLens")
    val ratio = dim.toDouble * 4 / Similarity.PqSubspaces
    assert(ratio >= 8.0, s"compression ratio $ratio")
    assert(parts.encoded.count() == planted.size.toLong)
  }
}
