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

  /** Tier count for [[q189RangeLookup]]. */
  val RangeTiers = 64

  /** Quadratic tier boundaries over the fixed-point event-value
    * domain [0, 500·10⁶): lo_i = i²·5·10⁸ div 4096 — non-uniform on
    * purpose (a uniform grid would reduce to integer division and
    * prove nothing about the lookup).
    */
  def tierBounds: Array[Long] =
    Array.tabulate(RangeTiers)(i => i.toLong * i * 500000000L / 4096L)

  /** Driver binding (q189): the broadcast-range-lookup join — every
    * event's value mapped to its tier by
    * [[graft.functions.LowerBoundBc]] (an O(log k) binary search over
    * a broadcast sorted boundary array INSIDE whole-stage codegen),
    * then a per-(tier, type) rollup. This is the shuffle-free form of
    * "join the fact stream to a small ranges dimension on
    * lo <= x < hi": a range join shuffles or nested-loops the fact
    * side against every range row and leaves an exchange + join in
    * the plan; here the plan has NO join node at all — the dimension
    * rides as one broadcast handle per executor (the q54 Bloom
    * discipline), which is the shape that survives 1000 executors.
    * The DuckDB oracle pays the honest inequality join against the
    * same boundary table and must agree exactly.
    */
  def q189RangeLookup(s: SparkSession, d: String): DataFrame = {
    val bc = s.sparkContext.broadcast(tierBounds)
    Tables.events(s, d)
      .select(col("event_type"),
        round(col("value") * lit(1e6)).cast("long").as("x"))
      .withColumn("tier",
        graft.functions.LowerBoundBc.column(col("x"), bc))
      .groupBy(col("tier"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("x")).as("sum_x"))
      .orderBy(col("tier"), col("event_type"))
  }
}
