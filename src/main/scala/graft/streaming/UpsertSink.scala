package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** `foreachBatch` upsert sink: maintains a keyed parquet state table
  * under last-writer-wins — the production pattern for landing a
  * changelog stream as a queryable table when no lakehouse format is
  * on the classpath. Every micro-batch MERGEs into the current state
  * (union → latest row per key) and commits the result as a new
  * immutable version directory; `_latest` is flipped by an atomic
  * file move, so readers never observe a half-written version
  * (the minimal version-and-pointer scheme lakehouse table formats
  * build on).
  *
  * Exactly-once across retries comes from idempotence, the documented
  * `foreachBatch` contract: re-merging an already-applied batch
  * changes nothing, because latest-per-key under (version, then value
  * equality) is a fixpoint — UpsertSinkSpec replays a batch to pin
  * this.
  *
  * Scale shape: the merge is one window over the key — state-sized,
  * not history-sized — and each commit rewrites only the compacted
  * state. For key spaces too large to rewrite per batch, the same
  * foreachBatch body would partition the state table and rewrite only
  * touched partitions; the commit protocol is unchanged.
  */
object UpsertSink {

  private def latestPath(dir: String) = Paths.get(dir, "_latest")

  /** Read the current state table (empty on a fresh directory). */
  def readState(s: SparkSession, dir: String): Option[DataFrame] = {
    val p = latestPath(dir)
    if (!Files.exists(p)) None
    else Some(s.read.parquet(Paths.get(dir, Files.readString(p).trim).toString))
  }

  /** Merge one batch of `(key, version, value...)` rows into the state
    * under last-writer-wins on (version desc, then remaining columns
    * desc as the deterministic tiebreak), committing a new version.
    */
  def merge(s: SparkSession, dir: String, batch: DataFrame,
      keyCol: String, versionCol: String): Unit = synchronized {
    val current = readState(s, dir)
    val unioned = current.map(_.unionByName(batch)).getOrElse(batch)
    // version strictly first — schema field order must never let a
    // stale-version row with a larger value win over newer state
    val ordered = col(versionCol).desc +: unioned.schema.fieldNames
      .filter(c => c != keyCol && c != versionCol).map(c => col(c).desc)
    val next = unioned
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(ordered.toIndexedSeq: _*)))
      .filter(col("__rn") === 1).drop("__rn")
    val vid = s"v${System.nanoTime()}"
    next.write.mode("overwrite").parquet(Paths.get(dir, vid).toString)
    // commit: write-then-atomic-move, so _latest always names a fully
    // written version
    val tmp = Paths.get(dir, "_latest.tmp")
    Files.writeString(tmp, vid)
    Files.move(tmp, latestPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Wire a stream of upsert rows to the sink. */
  def writer(events: DataFrame, dir: String,
      keyCol: String, versionCol: String): DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      merge(batch.sparkSession, dir, batch, keyCol, versionCol)
    }
}
