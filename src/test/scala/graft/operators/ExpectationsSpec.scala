package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** Expectation audit (q134). The driver hash-matches the SQL oracle;
  * these fixtures pin the rule semantics: null predicate outcomes are
  * violations, null FKs are not orphans, uniqueness counts excess
  * rows, and all row rules for a table share one scan.
  */
class ExpectationsSpec extends SparkSpec {

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getBoolean(4))).toList

  test("observed rules ride the consumer's job and equal the dedicated pass") {
    // Dataset.observe: the audit counters attach to whatever action the
    // consumer runs — verdicts with ZERO extra scans. Must agree with
    // the dedicated rowRules aggregate on the same data + rules.
    val d = "/root/testdata/sf0.001"
    val events = graft.Tables.events(spark, d)
    val rules = Seq(
      "value_non_null" -> col("value").isNotNull,
      "user_positive" -> (col("user_id") > 0L),
      "type_known" -> col("event_type").isin("click", "view", "purchase", "signup", "error"))
    val (instrumented, obs) = Expectations.observedRowRules(events, rules)
    val consumed = instrumented.filter(col("value") >= 0.0).count() // the "real" job
    assert(consumed > 0)
    val observed = rowsOf(Expectations.observedVerdicts(
      spark, obs, "events", rules.map(_._1)))
    val dedicated = rowsOf(Expectations.rowRules(events, "events", rules))
    assert(observed.toSet == dedicated.toSet)
  }

  test("row rules: false and null predicate outcomes both count as violations") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, String)]((1.0, "a"), (-2.0, "b"), (null, "c"))
      .toDF("x", "s")
    val got = rowsOf(Expectations.rowRules(df, "t", Seq(
      "x_positive" -> (col("x") > 0),
      "s_in_domain" -> col("s").isin("a", "b", "c"))))
    assert(got == List(
      ("t", "x_positive", 3L, 2L, false),   // -2 fails, null fails
      ("t", "s_in_domain", 3L, 0L, true)))
  }

  test("unique rule counts rows in excess of one per key; null keys group") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (1L, "b"), (1L, "c"), (2L, "d"), (null, "e"), (null, "f"))
      .toDF("k", "v")
    val got = rowsOf(Expectations.uniqueRule(df, "t", "k_unique", Seq("k")))
    assert(got == List(("t", "k_unique", 6L, 3L, false))) // 2 extra 1s + 1 extra null
  }

  test("ref rule: missing FKs are orphans, null FKs are not") {
    import spark.implicits._
    val child = Seq[(java.lang.Long, String)](
      (1L, "ok"), (99L, "orphan"), (null, "null-fk")).toDF("fk", "v")
    val parent = Seq((1L, "p"), (2L, "p")).toDF("pk", "w")
    val got = rowsOf(Expectations.refRule(child, "t", "fk_valid", "fk", parent, "pk"))
    assert(got == List(("t", "fk_valid", 3L, 1L, false)))
  }

  test("empty table: rules pass vacuously with zero checked") {
    import spark.implicits._
    val df = Seq.empty[(Long, String)].toDF("x", "s")
    val got = rowsOf(Expectations.rowRules(df, "t", Seq("x_pos" -> (col("x") > 0))))
    assert(got == List(("t", "x_pos", 0L, 0L, true)))
  }

  test("all row rules of a table evaluate in one scan") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("x", "s")
    val audit = Expectations.rowRules(df, "t", Seq(
      "r1" -> (col("x") > 0), "r2" -> (col("s") =!= ""), "r3" -> col("x").isNotNull))
    val plan = audit.queryExecution.executedPlan.toString
    assert("LocalTableScan".r.findAllIn(plan).size == 1,
      s"rules must share one scan:\n$plan")
  }
}
