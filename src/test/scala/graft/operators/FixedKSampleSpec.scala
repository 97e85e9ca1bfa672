package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** Fixed-k per-stratum sampling (q146). Driver hash-matches the DuckDB
  * mirror; these pin the invariants the hash can't explain: exact-k per
  * big stratum, keep-all for small strata, repartition stability, and
  * nestedness in k.
  */
class FixedKSampleSpec extends SparkSpec {

  private lazy val out = Curation.q146FixedKSample(spark, "/root/testdata/sf0.001")
    .collect()

  test("every stratum yields min(k, stratum size) rows, ranks dense from 1") {
    val full = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = out.groupBy(r => (r.getString(1), r.getString(2)))
    got.foreach { case (stratum, rows) =>
      val want = math.min(Curation.FixedKPerStratum.toLong, full(stratum))
      assert(rows.length.toLong == want, s"$stratum: ${rows.length} != $want")
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to want))
    }
    assert(got.keySet == full.keySet, "every stratum must appear")
  }

  test("membership is a pure function of content: stable under repartitioning") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    def sample(df: org.apache.spark.sql.DataFrame): Set[Long] = {
      val h = md5(col("text").cast("binary"))
      df.select(col("doc_id"), col("lang"), col("source"), h.as("h"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("lang"), col("source"))
            .orderBy(col("h"), col("doc_id"))).cast("long"))
        .filter(col("rk") <= Curation.FixedKPerStratum)
        .select(col("doc_id")).as[Long].collect().toSet
    }
    assert(sample(docs) == sample(docs.repartition(17)))
  }

  test("samples are nested in k: the top-5 set is a subset of the top-10 set") {
    val top10 = out.map(_.getLong(0)).toSet
    val top5 = out.filter(_.getAs[Long]("rk") <= 5L).map(_.getLong(0)).toSet
    assert(top5.subsetOf(top10))
    assert(top5.size < top10.size)
  }
}
