package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SQL front door (q149). Pins that `spark.sql` text and the DataFrame
  * API are ONE engine (optimized-plan equality), and that the
  * GraftExtensions-injected native expressions resolve from plain SQL —
  * the shared-cluster deployment path where users only speak SQL.
  */
class SqlEntrySpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("the SQL text and the DataFrame twin optimize to the same plan") {
    val sqlPlan = Relational.q149SqlEntry(spark, d)
      .queryExecution.optimizedPlan.canonicalized
    val df = graft.Tables.lineitem(spark, d)
      .join(graft.Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.nation(spark, d), col("c_nationkey") === col("n_nationkey"))
      .join(graft.Tables.region(spark, d), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(
        sum(col("l_extendedprice").cast(DecimalType(18, 2))
          * (lit(1) - col("l_discount")).cast(DecimalType(8, 2)))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("region"), col("nation"))
    // canonicalized optimized plans: same joins, same aggregates, same
    // sort — SQL text is a front door, not a second engine
    assert(sqlPlan == df.queryExecution.optimizedPlan.canonicalized)
  }

  test("native extension expressions resolve from plain SQL text") {
    // the test session is built with spark.sql.extensions=graft.GraftExtensions
    val r = spark.sql(
      "SELECT rolling_fingerprint('abc') AS f, luhn_valid('4539578763621486') AS l, " +
        "fixed_dot(array(2L, 3L), array(5L, 7L)) AS dp").head()
    assert(r.getAs[Long]("f") == graft.functions.Fingerprints.full(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc")))
    assert(r.getAs[Boolean]("l"))
    assert(r.getAs[Long]("dp") == 31L)
  }

  test("parameterized SQL: named parameters bind without string splicing") {
    // the injection-safe front door for templated jobs
    graft.Tables.nation(spark, d).createOrReplaceTempView("v_nation")
    val r = spark.sql(
      "SELECT count(*) AS n FROM v_nation WHERE n_regionkey = :rk",
      Map("rk" -> 0)).head()
    val want = graft.Tables.nation(spark, d).filter(col("n_regionkey") === 0).count()
    assert(r.getAs[Long]("n") == want && want > 0)
  }

  test("_metadata file columns give row-level file lineage on any parquet scan") {
    // the "which file did this bad row come from" debugging surface —
    // free on every scan, no layout change
    val r = graft.Tables.eventsRaw(spark, d)
      .select(col("_metadata.file_name"), col("_metadata.row_index"))
      .limit(3).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getString(0) == "events.parquet"))
    assert(r.map(_.getLong(1)).distinct.length == r.length)
  }

  test("q149 values: revenue per (region, nation) is DECIMAL-exact") {
    val rows = Relational.q149SqlEntry(spark, d).collect()
    assert(rows.nonEmpty)
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == rows.length)
    assert(rows.forall(_.getAs[Long]("n_items") > 0L))
  }
}
