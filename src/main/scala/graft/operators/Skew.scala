package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
