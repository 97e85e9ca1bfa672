package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew mitigation: two-phase salted aggregation.
  *
  * A single hot grouping key sends its entire weight through one reducer;
  * salting splits each key into `spark_partition_id()`-derived subkeys so
  * the first aggregation is embarrassingly parallel and the second only
  * merges one partial row per (key, input-partition). Results are
  * identical to a direct groupBy for any commutative-associative
  * aggregate. (For skewed JOINS, AQE's skew-join handling is enabled in
  * the session; this helper covers skewed AGGREGATION, which AQE does
  * not re-plan.)
  */
object Skew {

  /** `df.groupBy(key).agg(sum(value))` with a salted partial phase.
    * The salt is the physical input partition id — deterministic for a
    * given partitioning, and requiring no tuning constant.
    */
  def saltedSum(df: DataFrame, key: Column, value: Column, resultName: String): DataFrame =
    df.withColumn("_salt", spark_partition_id())
      .groupBy(key, col("_salt"))
      .agg(sum(value).as("_partial"))
      .groupBy(key)
      .agg(sum(col("_partial")).as(resultName))

  /** Driver binding: per-supplier revenue through the salted two-phase
    * aggregate, summed as DECIMAL so the salted merge order cannot
    * perturb the result — the oracle is the PLAIN one-phase GROUP BY,
    * which the salted plan must equal bit-for-bit (the whole point:
    * salting is a physical rewrite, never a semantic one).
    */
  def q90SaltedRevenue(s: SparkSession, d: String): DataFrame =
    saltedSum(
      Tables.lineitem(s, d),
      col("l_suppkey"),
      col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1) - col("l_discount")).cast(DecimalType(8, 2)),
      "revenue")
      .select(col("l_suppkey"), col("revenue").cast("double").as("revenue"))
      .orderBy(col("l_suppkey"))

  /** Replication factor for [[saltedJoin]]'s dimension side. */
  val JoinSalt = 8

  /** Salted equi-join for hot fact keys: the fact side gains a
    * partition-derived salt, the dimension side replicates once per
    * salt value, and the join runs on (key, salt) — a single hot key's
    * rows now spread across `salt` reducers instead of one. The result
    * SET is provably independent of the salt (every fact row meets
    * exactly the one dim replica carrying its salt), so salting is a
    * physical rewrite only — which the q111 oracle (the PLAIN join)
    * checks bit-for-bit.
    *
    * When to reach for it: AQE's skew-join handling re-plans skewed
    * SORT-MERGE joins at runtime, but cannot help a forced shuffle-hash
    * path, a streaming join's fixed state partitioning, or a first
    * stage whose skew only materializes downstream of AQE's stats —
    * the manual rewrite is the portable form. Cost: `salt` x the
    * dimension's shuffle volume; keep the dim side the small one.
    *
    * Caveats: inputs must not already carry a `_salt` column
    * (withColumn would silently replace the fact's and the join key
    * would collide with the dim's — rejected eagerly below); and
    * because the salt derives from `spark_partition_id`, a hot key
    * spreads across at most as many reducers as INPUT partitions
    * contain it — a hot key confined to few input partitions gets
    * less than `salt`-way spreading (use a repartitioned fact or a
    * random salt when that matters).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int = JoinSalt): DataFrame = {
    require(salt >= 1, s"salt must be positive, got $salt")
    require(!fact.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "saltedJoin reserves the _salt column; rename it on the input first")
    val f = fact.withColumn("_salt", pmod(spark_partition_id(), lit(salt)))
    val dRep = dim.withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
    f.join(dRep, Seq(key, "_salt")).drop("_salt")
  }

  /** Driver binding (q111): lineitem joined to orders through the
    * salted rewrite, rolled up per order status with DECIMAL-exact
    * revenue. Oracle: the plain join + GROUP BY — identical output is
    * the operator's entire contract.
    */
  def q111SaltedJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"),
      (col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1) - col("l_discount")).cast(DecimalType(8, 2))).as("rev"))
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    saltedJoin(li, ord, "l_orderkey")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("rev")).cast("double").as("revenue"))
      .orderBy(col("o_orderstatus"))
  }
}
