package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** One-corpus-pass pins: an accumulator increments once per input row
  * EVALUATION, so a query whose plan re-derives the corpus (a lazy
  * cache racing AQE broadcast stages — the r15 q202 defect — or an
  * uncached frame with several consumers — the r16 q205 draft) fails
  * with a multiple of the row count. This is the property that
  * separates "reads 100 TB once" from "reads it three times"; `.explain`
  * can't show it because the re-derivation hides inside broadcast
  * subqueries that race at runtime.
  */
class OnePassSpec extends SparkSpec {

  private def countedDocs(n: Int): (DataFrame, LongAccumulator) = {
    val acc = spark.sparkContext.longAccumulator("docRowScans")
    import spark.implicits._
    val df = spark.range(0L, n.toLong).as[Long].map { i =>
      acc.add(1)
      (s"s${i % 5}", i,
        s"tok${i % 7} tok${(i + 1) % 11} tok${(i + 2) % 7} tok${(i + 3) % 5} tok${i % 3}")
    }.toDF("source", "doc_id", "text")
    (df, acc)
  }

  test("q202 CMS rollup reads the corpus exactly once") {
    val (docs, acc) = countedDocs(400)
    Corpus.cmsRollupOf(spark, docs).count()
    assert(acc.value == 400, s"corpus evaluated ${acc.value / 400.0}x")
  }

  test("q205 mixture plan reads the corpus exactly once") {
    val (docs, acc) = countedDocs(400)
    Curation.mixturePlanOf(docs).count()
    assert(acc.value == 400, s"corpus evaluated ${acc.value / 400.0}x")
  }

  test("q206 boilerplate reads the corpus exactly once") {
    val (docs, acc) = countedDocs(400)
    Curation.boilerplateOf(docs).count()
    assert(acc.value == 400, s"corpus evaluated ${acc.value / 400.0}x")
  }

  test("q201 priority sample reads the corpus exactly once") {
    val (docs, acc) = countedDocs(400)
    Curation.prioritySampleOf(docs.withColumn("n_chars", length(col("text")).cast("long"))).count()
    assert(acc.value == 400, s"corpus evaluated ${acc.value / 400.0}x")
  }

  test("q207 stratified sample reads the corpus exactly once") {
    val (docs, acc) = countedDocs(400)
    Curation.stratifiedSampleOf(docs.withColumn("n_chars", length(col("text")).cast("long"))).count()
    assert(acc.value == 400, s"corpus evaluated ${acc.value / 400.0}x")
  }

  test("q208 exact-substring census reads the corpus exactly once") {
    val (docs, acc) = countedDocs(400)
    Curation.exactSubstrOf(docs).count()
    assert(acc.value == 400, s"corpus evaluated ${acc.value / 400.0}x")
  }

  test("q209 exact-substring dedup reads the corpus exactly three times (census build / apply / rewrite)") {
    // three scans is the DESIGN, not an accident: (1) occurrence
    // stream -> duplicated-window census, (2) occurrence stream again
    // joined against the census for cut positions, (3) document pass
    // for the rewrite. Collapsing any pair needs an O(L * corpus)
    // occurrence cache — worse than a scan at 100 TB. The pin fails in
    // BOTH directions: a 4th scan (lost cache on the dup frame) and a
    // 2nd-scan elision (someone caching the corpus) both break it.
    val (docs, acc) = countedDocs(400)
    Curation.exactSubstrDedupOf(docs).count()
    assert(acc.value == 3 * 400, s"corpus evaluated ${acc.value / 400.0}x, want 3.0x")
  }

  test("q213 incremental dedup reads EACH ingest batch exactly three times " +
    "(its state build / its cuts / its rewrite) — the one-shot 3x, batch-local") {
    val (a, accA) = countedDocs(300)
    val (b0, accB) = countedDocs(100)
    // disjoint doc_ids (the q209 identity precondition); the shift maps
    // rows AFTER the accumulator fires, so counts are unaffected
    val b = b0.withColumn("doc_id", col("doc_id") + 1000L)
    Curation.exactSubstrDedupIncrementalOf(Seq(a, b)).count()
    assert(accA.value == 3 * 300, s"batch A evaluated ${accA.value / 300.0}x, want 3.0x")
    assert(accB.value == 3 * 100, s"batch B evaluated ${accB.value / 100.0}x, want 3.0x")
  }

  test("q216 gate+rewrite+quota+budget pipeline reads the corpus exactly " +
    "three times — the transform's own scans, with quota and budget FUSED " +
    "into the rewrite consumption (no join-back re-derivation)") {
    // the hazard this pins against: a q68-style quota (select doc_ids,
    // join back for payload) consumes the rewrite output twice, and the
    // rewrite re-derives at 3 corpus scans a pop -> 6.0x. The fused
    // bounded aggregate must keep the whole composition at 3.0x.
    // Fixture texts carry 12 tokens so the 10..80 gate passes them
    // (countedDocs' 5-token texts would all gate out).
    val acc = spark.sparkContext.longAccumulator("docRowScans216")
    import spark.implicits._
    val docs = spark.range(0L, 400L).as[Long].map { i =>
      acc.add(1)
      (s"s${i % 5}", i,
        (0 until 12).map(j => s"tok${(i + j) % 9}").mkString(" "))
    }.toDF("source", "doc_id", "text")
    val out = Curation.curationRewritePipelineOf(docs)
    assert(out.count() > 0)
    assert(acc.value == 3 * 400, s"corpus evaluated ${acc.value / 400.0}x, want 3.0x")
  }

  test("q212 incremental census reads EACH ingest batch exactly once") {
    // two separate batch inputs (the deployment shape — an ingest
    // batch is its own table, not a filter over the full corpus): the
    // state build must pay one pass per batch, the merge none
    val (a, accA) = countedDocs(300)
    val (b, accB) = countedDocs(100)
    Curation.exactSubstrMerge(Seq(
      Curation.exactSubstrState(a),
      Curation.exactSubstrState(b))).count()
    assert(accA.value == 300, s"batch A evaluated ${accA.value / 300.0}x")
    assert(accB.value == 100, s"batch B evaluated ${accB.value / 100.0}x")
  }
}
