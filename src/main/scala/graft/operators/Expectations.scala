package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality expectation audit (q134): run a suite of declared
  * expectations — row predicates, key uniqueness, referential
  * integrity — and emit one verdict row per rule, the
  * contract-testing layer (dbt tests / Great Expectations / Deequ's
  * public shape) a pipeline gates a new data drop on before any
  * downstream job sees it. The reference would hand-roll each rule as
  * its own map/reduce counter pass (tinymr.py:39-114); here the audit
  * is three plan shapes, each chosen for its 100 TB cost:
  *
  *  - row predicates: ALL rules against one table evaluate in ONE
  *    scan — a single aggregate of `sum(violates)` counters, no
  *    shuffle of data rows (partials only), however many rules.
  *  - uniqueness: one groupBy on the key counting groups and rows —
  *    exact, one shuffle of the key column only (never a
  *    countDistinct alongside other aggregates, which would plan the
  *    q99 Expand).
  *  - referential integrity: one LEFT ANTI join child→parent on the
  *    key — broadcast when the parent's key side is small, shuffle
  *    otherwise; either way the child streams once.
  *
  * Verdict rows carry checked/violation counts (not booleans alone)
  * so thresholded gating ("fail if >0.1% orphans") composes on top.
  */
object Expectations {

  private def verdict(
      table: String, rule: String,
      checked: Column, violations: Column): Seq[Column] =
    Seq(lit(table).as("table_name"), lit(rule).as("rule"),
      checked.cast("long").as("n_checked"),
      violations.cast("long").as("n_violations"),
      (violations === 0L).as("pass"))

  /** All row-predicate rules over one table in ONE aggregate pass.
    * A row violates a rule when its predicate is false OR null — a
    * null check outcome is a failed check, the conservative gate.
    */
  def rowRules(
      df: DataFrame, table: String,
      rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "rowRules: empty rule list")
    val counters = count(lit(1)).as("_n") +:
      rules.zipWithIndex.map { case ((_, p), i) =>
        sum(when(!coalesce(p, lit(false)), 1L).otherwise(0L)).as(s"_v$i")
      }
    val agg = df.agg(counters.head, counters.tail: _*)
    // one aggregate row, then explode per-rule verdict structs — never
    // one aggregate pass per rule
    val verdicts = array(rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), coalesce(col(s"_v$i"), lit(0L)).as("v"))
    }: _*)
    agg.select(col("_n"), explode(verdicts).as("r"))
      .select(lit(table).as("table_name"), col("r.rule").as("rule"),
        col("_n").cast("long").as("n_checked"),
        col("r.v").cast("long").as("n_violations"),
        (col("r.v") === 0L).as("pass"))
  }

  /** [[rowRules]] as ZERO-COST inline observation: the same violation
    * counters attached to the frame via `Dataset.observe`, so they ride
    * whatever job the CONSUMER runs — no dedicated audit pass over the
    * data at all. At 100 TB this is the difference between "the nightly
    * ETL also emitted its quality verdicts" and "a second full scan".
    * Read the verdicts with [[observedVerdicts]] AFTER an action has
    * consumed the returned frame (`Observation.get` blocks until then).
    */
  def observedRowRules(
      df: DataFrame, rules: Seq[(String, Column)]): (DataFrame, Observation) = {
    require(rules.nonEmpty, "observedRowRules: empty rule list")
    val obs = new Observation()
    val counters = count(lit(1)).as("_n") +:
      rules.zipWithIndex.map { case ((_, p), i) =>
        sum(when(!coalesce(p, lit(false)), 1L).otherwise(0L)).as(s"_v$i")
      }
    (df.observe(obs, counters.head, counters.tail: _*), obs)
  }

  /** Convert an [[observedRowRules]] observation into the q134 verdict
    * rows (driver-side: the observed map is |rules|+1 numbers).
    */
  def observedVerdicts(
      s: SparkSession, obs: Observation, table: String,
      ruleNames: Seq[String]): DataFrame = {
    import s.implicits._
    val m = obs.get
    val n = m("_n").asInstanceOf[Long]
    ruleNames.zipWithIndex.map { case (name, i) =>
      val v = Option(m(s"_v$i")).fold(0L)(_.asInstanceOf[Long])
      (table, name, n, v, v == 0L)
    }.toDF("table_name", "rule", "n_checked", "n_violations", "pass")
  }

  /** Key-uniqueness rule: violations = rows in excess of one per key
    * (so a key seen k times contributes k-1). Null keys group like
    * any other value.
    */
  def uniqueRule(
      df: DataFrame, table: String, rule: String,
      keys: Seq[String]): DataFrame = {
    val g = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_c"))
      .agg(coalesce(sum(col("_c")), lit(0L)).as("_n"),
        count(lit(1)).as("_g"))
    g.select(verdict(table, rule, col("_n"), col("_n") - col("_g")): _*)
  }

  /** Referential-integrity rule: child rows with a non-null foreign
    * key missing from the parent key set. Null FKs are not orphans
    * (SQL FK semantics); count them with a separate row rule if
    * required.
    */
  def refRule(
      child: DataFrame, table: String, rule: String, fk: String,
      parent: DataFrame, pk: String): DataFrame = {
    val orphans = child.select(col(fk)).filter(col(fk).isNotNull)
      .join(parent.select(col(pk).as(fk)), Seq(fk), "left_anti")
      .agg(count(lit(1)).as("_v"))
    val n = child.agg(count(lit(1)).as("_n"))
    n.crossJoin(orphans)
      .select(verdict(table, rule, col("_n"), col("_v")): _*)
  }

  /** Driver binding (q134): a nine-rule suite over four tables —
    * passing and failing rules both exercised (discount and price
    * caps genuinely fail on this data). Oracle: each rule restated in
    * plain SQL, unioned.
    */
  def q134Expectations(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val lineitem = Tables.lineitem(s, d)
    val customer = Tables.customer(s, d)
    val events = Tables.events(s, d)
    rowRules(orders, "orders", Seq(
      "o_totalprice_positive" -> (col("o_totalprice") > 0),
      "o_totalprice_under_500k" -> (col("o_totalprice") <= 500000.0),
      "o_orderstatus_domain" -> col("o_orderstatus").isin("O", "F", "P")))
      .unionAll(rowRules(lineitem, "lineitem", Seq(
        "l_quantity_range" -> (col("l_quantity") >= 1 && col("l_quantity") <= 50),
        "l_discount_cap" -> (col("l_discount") <= 0.05))))
      .unionAll(rowRules(events, "events", Seq(
        "props_has_k" -> get_json_object(col("props"), "$.k").isNotNull)))
      .unionAll(uniqueRule(customer, "customer", "c_custkey_unique", Seq("c_custkey")))
      .unionAll(refRule(orders, "orders", "o_custkey_fk", "o_custkey",
        customer, "c_custkey"))
      .unionAll(refRule(lineitem, "lineitem", "l_orderkey_fk", "l_orderkey",
        orders, "o_orderkey"))
      .orderBy(col("table_name"), col("rule"))
  }

  /** Driver binding (q153): the observe-based audit end-to-end — the
    * q134 events rules attached via [[observedRowRules]], the consumer
    * job is a (driver-side, single-number) count over the instrumented
    * frame, and the returned frame is the rendered verdicts. Oracled by
    * the same per-rule SQL counts as q134, proving `Dataset.observe`'s
    * counters are exactly the dedicated aggregate's — the zero-extra-
    * scan audit is not an approximation.
    */
  def q153ObservedAudit(s: SparkSession, d: String): DataFrame = {
    val rules = Seq(
      "value_non_null" -> col("value").isNotNull,
      "user_positive" -> (col("user_id") > 0L),
      "props_has_k" -> get_json_object(col("props"), "$.k").isNotNull)
    val (instrumented, obs) = observedRowRules(Tables.events(s, d), rules)
    instrumented.count() // the consumer job the metrics ride on
    observedVerdicts(s, obs, "events", rules.map(_._1))
      .orderBy(col("rule"))
  }
}
