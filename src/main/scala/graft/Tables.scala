package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the driver-generated TPC-H-ish test tables
  * (TESTDATA.md). All queries take the scale-factor directory as a
  * parameter so the same code runs at any SF — and, on a real cluster,
  * against any warehouse path.
  *
  * Event-time canonicalization: a real lake mixes file vintages — the
  * same logical column arrives as int64 nanos in one file set and
  * parquet TIMESTAMP / TIMESTAMP_NTZ in another (the reference's data
  * model is deliberately physical-layout-agnostic: tinymr.py:156-165
  * treats items as opaque, docs.rst:343-347 never assumes layout).
  * [[events]] therefore normalizes `ts` to ONE canonical type — int64
  * nanoseconds since the epoch — so every downstream operator
  * (`ts div 1000` = epoch micros) is schema-drift-proof. The session
  * runs in UTC (GraftSession), which makes the NTZ cast
  * instant-preserving and keeps Spark's `ts div 1000` bit-identical
  * to DuckDB's `epoch_us(ts)` on the same files.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Canonical event-time: `ts` → int64 nanos since epoch, whatever
    * the physical type. LongType is trusted as already-nanos;
    * TIMESTAMP (instant) and TIMESTAMP_NTZ (wall clock, interpreted
    * in the UTC session zone) go through `unix_micros * 1000`.
    * Unknown types fail loudly — silent misreads at 100 TB are far
    * worse than an analysis error. Works on batch AND streaming
    * frames (pure projection, no state).
    */
  def normalizeEventTime(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema(colName).dataType match {
      case LongType => df
      case TimestampType =>
        df.withColumn(colName, unix_micros(col(colName)) * 1000L)
      case TimestampNTZType =>
        df.withColumn(colName,
          unix_micros(col(colName).cast(TimestampType)) * 1000L)
      case other =>
        throw new IllegalStateException(
          s"events.$colName has unsupported physical type $other; " +
            "expected LongType (nanos), TimestampType, or TimestampNTZType")
    }

  /** Physical-schema events load — use ONLY where the raw file schema
    * itself is needed (e.g. the streaming source's `.schema(...)`,
    * which must match the files on disk). Everything else goes
    * through [[events]].
    */
  def eventsRaw(s: SparkSession, d: String): DataFrame = load(s, d, "events")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTime(eventsRaw(s, d))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
