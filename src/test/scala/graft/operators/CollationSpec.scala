package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** Collation-aware grouping (q154). Driver hash-matches the lower()
  * oracle (coincident for ASCII); these pin the collation semantics
  * directly.
  */
class CollationSpec extends SparkSpec {

  test("UTF8_LCASE groups case variants; binary grouping keeps them apart") {
    import spark.implicits._
    val df = Seq("Click", "click", "CLICK", "view").toDF("v")
    val ci = df.groupBy(expr("collate(v, 'UTF8_LCASE')").as("k"))
      .agg(count(lit(1)).as("n"))
      .select(expr("collate(lower(k), 'UTF8_BINARY')").as("k"), col("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ci == Map("click" -> 3L, "view" -> 1L))
    val bin = df.groupBy(col("v")).count().count()
    assert(bin == 4L)
  }

  test("collated comparison: equality and ordering fold case") {
    val r = spark.sql(
      """SELECT
        |  collate('AbC', 'UTF8_LCASE') = collate('aBc', 'UTF8_LCASE') AS eq,
        |  collate('b', 'UTF8_LCASE') > collate('A', 'UTF8_LCASE') AS gt
        |""".stripMargin).head()
    assert(r.getBoolean(0) && r.getBoolean(1))
  }

  test("q154: planted upper-case spellings are counted, groups are case-clean") {
    val rows = Relational.q154CollationGroup(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(0).toLowerCase)
      // event_id % 3 == 0 plants exist for every type at this SF: both
      // spellings must be visible through the case-insensitive group
      assert(r.getAs[Long]("n_spellings") == 2L,
        s"${r.getString(0)}: expected both spellings")
    }
  }
}
