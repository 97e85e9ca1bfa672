package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data-layout operators. At 100 TB the dominant cost of a
  * selective two-dimensional query is how many files its predicate
  * must OPEN: sorting by one key clusters that key only. Z-ordering
  * (Morton order — the bit-interleaved space-filling curve Delta
  * Lake's OPTIMIZE ZORDER and Iceberg's sort orders use) makes file
  * min/max ranges tight in BOTH dimensions at once, so parquet
  * row-group stats prune on either predicate.
  */
object Layout {

  /** Bits interleaved per dimension: 21 bits x 2 keys = 42-bit z,
    * headroom for ~2M distinct values per dimension (TPC-H sf100
    * partkeys); values are masked into range first.
    */
  val ZBits = 21

  /** The 2-D Morton z-value of two non-negative keys: bit i of `x`
    * lands at z-bit 2i, bit i of `y` at 2i+1 — a pure bitwise
    * expression chain (codegen'd, no UDF), identical arithmetic on
    * the SQL side, so z-derived outputs hash-match.
    */
  def zValue(x: Column, y: Column): Column = {
    val mask = (1L << ZBits) - 1
    val mx = x.bitwiseAND(lit(mask))
    val my = y.bitwiseAND(lit(mask))
    (0 until ZBits).map { i =>
      shiftleft(shiftright(mx, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(my, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Cluster a frame for two-dimensional locality: compute the
    * z-value and range-partition + sort by it — the write-side
    * OPTIMIZE ZORDER. Files written from the result carry tight
    * min/max bounds on BOTH `xCol` and `yCol` (ZOrderSpec measures
    * the bounding-box shrinkage vs key-sorted layout).
    */
  def zCluster(df: DataFrame, xCol: String, yCol: String, partitions: Int): DataFrame = {
    val z = df.withColumn("_z", zValue(col(xCol), col(yCol)))
    z.repartitionByRange(partitions, col("_z")).sortWithinPartitions(col("_z"))
  }

  /** Histogram resolution for [[q122ZOrderHistogram]]. */
  val ZBuckets = 64L

  /** Driver binding (q122): the [[ZBuckets]]-cell z-histogram of
    * lineitem's (l_partkey, l_suppkey) space — the statistic a layout
    * optimizer derives range boundaries from, and an exact end-to-end
    * check of the interleave arithmetic. Buckets normalize to the
    * MEASURED z-max (integer `bucket = z*64 div (zmax+1)`, scale-
    * independent — a fixed bit-shift would collapse every small-SF z
    * into bucket 0); hash-matched against the identical bitwise chain
    * + integer division in SQL.
    */
  def q122ZOrderHistogram(s: SparkSession, d: String): DataFrame = {
    val z = Tables.lineitem(s, d)
      .select(zValue(col("l_partkey"), col("l_suppkey")).as("z"))
    val zmax = z.agg(max(col("z")).as("zmax"))
    z.crossJoin(broadcast(zmax))
      .groupBy(expr(s"z * $ZBuckets div (zmax + 1)").as("bucket"))
      .agg(count(lit(1)).as("n"), min(col("z")).as("z_min"), max(col("z")).as("z_max"))
      .orderBy(col("bucket"))
  }
}
