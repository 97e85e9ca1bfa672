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
}
