package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media ride through the pipeline as opaque
  * `binary` columns with typed metadata extracted by a batched
  * per-partition decode stage (the Scala analogue of `mapInPandas`).
  *
  * The decode itself is a STUB — image/audio codecs are not available in
  * this environment — but everything Spark-side is real: the binary
  * column, the partition-parallel batch iteration, the typed output
  * schema, and the deterministic metadata contract the tests pin.
  */
object Multimodal {

  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long)

  /** STUB decoder: derives fake-but-deterministic dimensions from the blob
    * length. A real deployment replaces only this function with an actual
    * codec (e.g. libjpeg via JNI) — the Spark plumbing is unchanged.
    */
  private[operators] def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    MediaMeta(id, n, n % 640 + 1, n % 480 + 1)
  }

  /** Binary ingestion + batched decode: text is encoded to a binary
    * column standing in for real media bytes, then decoded per-partition.
    */
  def q29MultimodalMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // batch-shaped loop: a real codec would init once per partition
        // here (context-manager idiom, reference docs.rst:189-194).
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }
}
