package graft.operators

import graft.mr.SparkSpec

/** VARIANT semi-structured surface (q152). Driver hash-matches DuckDB's
  * independent JSON decoder; these pin the edge semantics the aggregate
  * can't show: missing fields, type-safe extraction, nested paths.
  */
class VariantSpec extends SparkSpec {

  test("missing fields extract as null, present ones as typed values") {
    val r = spark.sql(
      """SELECT
        |  variant_get(parse_json('{"k": 7}'), '$.k', 'bigint') AS hit,
        |  variant_get(parse_json('{"k": 7}'), '$.missing', 'bigint') AS miss
        |""".stripMargin).head()
    assert(r.getAs[Long]("hit") == 7L)
    assert(r.isNullAt(r.fieldIndex("miss")))
  }

  test("try_variant_get is the null-on-mismatch form") {
    val r = spark.sql(
      """SELECT try_variant_get(parse_json('{"k": "notanumber"}'), '$.k', 'bigint') AS v
        |""".stripMargin).head()
    assert(r.isNullAt(0))
  }

  test("nested paths shred without re-parsing") {
    val r = spark.sql(
      """SELECT variant_get(parse_json('{"a": {"b": [10, 20, 30]}}'), '$.a.b[1]', 'bigint') AS v
        |""".stripMargin).head()
    assert(r.getAs[Long]("v") == 20L)
  }

  test("q152 on the test data: every event contributes exactly once") {
    val out = Relational.q152VariantShred(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val total = out.map(_.getAs[Long]("n")).sum
    assert(total == graft.Tables.events(spark, "/root/testdata/sf0.001").count())
    out.foreach { r =>
      assert(r.getAs[Long]("min_k") <= r.getAs[Long]("max_k"))
      assert(r.getAs[Long]("n_distinct_k") <= r.getAs[Long]("n"))
    }
  }
}
