package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** q196 leakage-aware split: byte-identical texts always land in the
  * same split regardless of id/source (the anti-leakage law),
  * assignment is stable under corpus growth, fractions approach
  * 80/10/10, and the manifest is consistent with the per-doc
  * assignment it aggregates.
  */
class SplitManifestSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def docs(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  test("duplicate texts land in the same split whatever their id or source") {
    val texts = (1 to 50).map(i => s"document body number $i repeated tokens")
    val rows = texts.zipWithIndex.flatMap { case (t, i) =>
      Seq((i.toLong, "web", t), (1000L + i, "books", t), (2000L + i, "web", t))
    }
    val bySplit = Curation.splitAssign(docs(rows))
      .select(col("h"), col("split")).distinct()
      .groupBy(col("h")).agg(countDistinct(col("split")).as("n"))
      .agg(max(col("n"))).collect().head.getLong(0)
    assert(bySplit == 1L, "a content hash appeared in more than one split")
  }

  test("assignment is a pure function of content: growth never reassigns") {
    val base = (1 to 200).map(i => (i.toLong, "web", s"text $i ${i * 31}"))
    val grown = base ++ (201 to 400).map(i => (i.toLong, "web", s"new $i"))
    val a = Curation.splitAssign(docs(base))
      .select(col("h"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Curation.splitAssign(docs(grown))
      .select(col("h"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((h, s) <- a) assert(b(h) == s, s"hash $h reassigned")
  }

  test("fractions approach 80/10/10 and the manifest sums match") {
    val rows = (1 to 5000).map(i => (i.toLong, "web", s"body $i ${i * 17} x"))
    val m = Curation.splitManifestOf(docs(rows))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val n = m.values.sum
    assert(n == 5000L)
    // binomial 5 sigma at p=0.8/0.1: ~28/21 on 5000 draws
    assert(math.abs(m("train") - 4000L) < 150, m.toString)
    assert(math.abs(m("val") - 500L) < 110, m.toString)
    assert(math.abs(m("test") - 500L) < 110, m.toString)
  }
}
