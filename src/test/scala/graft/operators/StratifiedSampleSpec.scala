package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** q207 stratified-sample invariants: quotas sum exactly to K
  * (Hamilton apportionment, no rounding drift), proportionality within
  * one document, membership = the k_s smallest hashes per source
  * (sequential reference), and repartition invariance.
  */
class StratifiedSampleSpec extends SparkSpec {

  private def docsOf(counts: Map[String, Int]) = {
    import spark.implicits._
    counts.toSeq.sortBy(_._1).flatMap { case (src, n) =>
      (0 until n).map(i => (src, (src.hashCode.abs % 97) * 100000L + i, 10L + i % 90))
    }.toDF("source", "doc_id", "n_chars")
  }

  test("quotas sum exactly to K and stay within one doc of proportional") {
    import spark.implicits._
    val counts = Map("a" -> 137, "b" -> 41, "c" -> 7, "d" -> 263, "e" -> 52)
    val n = counts.values.sum
    val got = Curation.stratifiedSampleOf(docsOf(counts))
      .as[(String, Long, Long, Long, Option[Long], Long)].collect()
    assert(got.map(_._3).sum == Curation.StratifiedK, "quotas must sum to K")
    for ((src, nDocs, quota, sampled, _, _) <- got) {
      assert(nDocs == counts(src))
      val exact = Curation.StratifiedK.toDouble * counts(src) / n
      assert(math.abs(quota - exact) < 1.0, s"$src quota $quota vs $exact")
      assert(sampled == quota, s"$src sampled $sampled != quota $quota")
    }
  }

  test("membership equals the k_s smallest doc-id hashes (sequential reference)") {
    import spark.implicits._
    val counts = Map("x" -> 80, "y" -> 120, "z" -> 30)
    val docs = docsOf(counts)
    val got = Curation.stratifiedSampleOf(docs)
      .as[(String, Long, Long, Long, Option[Long], Long)].collect()
      .map(r => r._1 -> r).toMap
    // reference hashes through the engine's own hllKey column (the
    // md5 arithmetic itself is pinned by the DuckDB oracle)
    val hashed = docs
      .select(col("source"), col("n_chars"),
        Corpus.hllKey(col("doc_id").cast("string")).as("h"), col("doc_id"))
      .as[(String, Long, Long, Long)].collect()
    for ((src, rows) <- hashed.groupBy(_._1)) {
      val quota = got(src)._3.toInt
      val take = rows.sortBy(r => (r._3, r._4)).take(quota)
      assert(got(src)._5.contains(take.last._3), s"$src threshold")
      assert(got(src)._6 == take.map(_._2).sum, s"$src sampled chars")
    }
  }

  test("repartition invariance") {
    import spark.implicits._
    val docs = docsOf(Map("p" -> 90, "q" -> 110, "r" -> 55))
    val a = Curation.stratifiedSampleOf(docs.repartition(1)).collect().toSeq
    val b = Curation.stratifiedSampleOf(docs.repartition(13)).collect().toSeq
    assert(a == b)
  }
}
