package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** `foreachBatch` upsert sink: maintains a keyed parquet state table
  * under last-writer-wins — the production pattern for landing a
  * changelog stream as a queryable table when no lakehouse format is
  * on the classpath.
  *
  * Storage layout is LOG-STRUCTURED (the lakehouse delta + merge-on-
  * read shape): every merge appends the batch as an immutable delta
  * directory — an O(batch) write, never a state rewrite — and commits
  * by atomically flipping `_latest` to a manifest listing the delta
  * chain plus the (key, version) column pair the compaction needs.
  * Readers compact on read: union of the chain, latest row per key
  * under (version desc, then remaining columns desc as the
  * deterministic tiebreak). Readers never observe a half-written
  * commit (the manifest flip is the same write-then-atomic-move
  * minimal version-and-pointer scheme as before; a delta directory is
  * fully written before any manifest names it). A pre-manifest
  * `_latest` holding a bare version id (a fully compacted state —
  * the sink's previous layout) still reads, as the chain's base.
  *
  * Exactly-once across retries comes from idempotence, the documented
  * `foreachBatch` contract: re-merging an already-applied batch
  * appends row-identical duplicates, and latest-per-key under
  * (version, then value equality) collapses them to the same winner —
  * a fixpoint of the READ, which is what callers observe.
  * UpsertSinkSpec replays a batch to pin this.
  *
  * Scale shape: each merge moves O(batch) bytes (the r20 layout
  * rewrote the whole compacted state per version — O(state) writes
  * per batch, the q219 profile's dominant phase); compaction is one
  * window over the chain, paid by the reader that wants the table, and
  * a long-lived production sink would bound the chain by folding it
  * back into a compacted base periodically (the lakehouse compaction
  * job) — the commit protocol is unchanged by that fold, because a
  * compacted state is itself a valid chain base.
  */
object UpsertSink {

  private def latestPath(dir: String) = Paths.get(dir, "_latest")

  private val ManifestHeader = "mor:"

  /** Parse `_latest` content: (key/version cols if a manifest, delta
    * version ids in commit order). A bare version id (the pre-manifest
    * layout: one fully compacted state) parses as a one-element chain
    * with no header.
    */
  private def parseLatest(txt: String): (Option[(String, String)], Seq[String]) = {
    val lines = txt.split("\n").map(_.trim).filter(_.nonEmpty).toSeq
    lines.headOption match {
      case Some(h) if h.startsWith(ManifestHeader) =>
        val parts = h.stripPrefix(ManifestHeader).split(" ", -1)
        require(parts.length == 2, s"malformed upsert manifest header: $h")
        (Some((parts(0), parts(1))), lines.tail)
      case Some(_) => (None, lines.take(1))
      case None => (None, Nil)
    }
  }

  /** Latest row per key: version strictly first — schema field order
    * must never let a stale-version row with a larger value win over
    * newer state.
    */
  private def compact(unioned: DataFrame,
      keyCol: String, versionCol: String): DataFrame = {
    val ordered = col(versionCol).desc +: unioned.schema.fieldNames
      .filter(c => c != keyCol && c != versionCol).map(c => col(c).desc)
    unioned
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(ordered.toIndexedSeq: _*)))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Read the current state table (empty on a fresh directory):
    * merge-on-read compaction of the committed delta chain.
    */
  def readState(s: SparkSession, dir: String): Option[DataFrame] = {
    val p = latestPath(dir)
    if (!Files.exists(p)) None
    else {
      val (cols, vids) = parseLatest(Files.readString(p))
      val paths = vids.map(v => Paths.get(dir, v).toString)
      val unioned = s.read.parquet(paths: _*)
      Some(cols.fold(unioned) { case (k, v) => compact(unioned, k, v) })
    }
  }

  /** Merge one batch of `(key, version, value...)` rows into the state
    * under last-writer-wins on (version desc, then remaining columns
    * desc as the deterministic tiebreak), committing a new delta.
    */
  def merge(s: SparkSession, dir: String, batch: DataFrame,
      keyCol: String, versionCol: String): Unit = synchronized {
    // the manifest header is whitespace-delimited; a column name that
    // can't round-trip through it must fail loudly at write time
    require(Seq(keyCol, versionCol).forall(c => !c.exists(_.isWhitespace)),
      s"upsert key/version column names must not contain whitespace: '$keyCol', '$versionCol'")
    val p = latestPath(dir)
    val prevVids =
      if (!Files.exists(p)) Nil
      else parseLatest(Files.readString(p))._2
    val vid = s"v${System.nanoTime()}"
    batch.write.mode("overwrite").parquet(Paths.get(dir, vid).toString)
    // commit: write-then-atomic-move, so _latest always names fully
    // written deltas
    val manifest = (ManifestHeader + keyCol + " " + versionCol) +:
      (prevVids :+ vid)
    val tmp = Paths.get(dir, "_latest.tmp")
    Files.writeString(tmp, manifest.mkString("\n"))
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
