package graft.operators

import graft.Tables
import graft.mr.SparkSpec
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scale-technique specs: bucketed (exchange-free) joins and salted
  * skew aggregation. These pin the mechanisms the engine relies on when
  * the same plans run against 100 TB.
  */
class ScaleSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // the in-memory catalog forgets tables between JVMs but the files
    // survive — clear the physical locations too
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    for (t <- Seq("b_orders", "b_lineitem")) {
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        import scala.reflect.io.Directory
        new Directory(dir).deleteRecursively()
      }
    }
    Tables.orders(spark, d).write
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, d).write
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem").hint("MERGE")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

    // and it computes the right thing
    val n = joined.count()
    val expected = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(n == expected)
  }

  test("salted aggregation equals direct aggregation") {
    val li = Tables.lineitem(spark, d)
    val direct = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("s"))
      .collect().map(r => (r.getString(0), r.getDecimal(1))).toMap
    val salted = Skew.saltedSum(
        li, col("l_returnflag"), col("l_quantity").cast(DecimalType(18, 2)), "s")
      .collect().map(r => (r.getString(0), r.getDecimal(1))).toMap
    assert(salted.view.mapValues(_.doubleValue).toMap ==
      direct.view.mapValues(_.doubleValue).toMap)
  }

  test("salted plan aggregates in two keyed phases") {
    val p = Skew.saltedSum(
        Tables.lineitem(spark, d), col("l_returnflag"), col("l_quantity"), "s")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("SPARK_PARTITION_ID"), p)
    // two logical groupBys -> at least two HashAggregate pairs
    assert("HashAggregate".r.findAllIn(p).size >= 4, p)
  }
}
