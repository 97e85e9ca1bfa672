package graft.functions

import graft.mr.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** `png_dims` — the genuine PNG IHDR parse over BinaryType. Contract:
  * well-formed PNG prefix -> (width, height); ANYTHING else -> NULL,
  * never a throw (a 100 TB media scan meets truncated and mislabeled
  * blobs constantly).
  */
class PngDimsSpec extends SparkSpec {
  import spark.implicits._

  /** A REAL png: the canonical 1x1 transparent PNG (public fixture). */
  private val realPng: Array[Byte] = java.util.Base64.getDecoder.decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")

  private def header(w: Long, h: Long,
      ihdrLen: Int = 13, tag: String = "IHDR"): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val be32 = (v: Long) => Array(
      ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    sig ++ be32(ihdrLen.toLong) ++ tag.getBytes("US-ASCII") ++ be32(w) ++ be32(h)
  }

  private def dimsOf(bytes: Array[Byte]): Option[(Long, Long)] = {
    val r = Seq(Tuple1(bytes)).toDF("img")
      .select(call_function("png_dims", col("img")).as("d"))
      .collect().head
    if (r.isNullAt(0)) None
    else { val s = r.getStruct(0); Some((s.getLong(0), s.getLong(1))) }
  }

  test("a REAL 1x1 PNG file parses to (1, 1) — actual format bytes, not a stub") {
    assert(dimsOf(realPng) == Some((1L, 1L)))
  }

  test("planted headers parse their big-endian dimensions exactly") {
    assert(dimsOf(header(400, 200)) == Some((400L, 200L)))
    assert(dimsOf(header(1, 2147483647L)) == Some((1L, 2147483647L)))
    // payload after byte 24 is irrelevant to dimensions
    assert(dimsOf(header(640, 480) ++ Array.fill(100)(0x42.toByte))
      == Some((640L, 480L)))
  }

  test("malformed blobs parse to NULL, never throw: truncation, bad signature, " +
    "wrong first chunk, zero or sign-bit dimensions, empty, null") {
    assert(dimsOf(header(10, 10).take(23)) == None, "truncated mid-header")
    assert(dimsOf(Array[Byte](0x00) ++ header(10, 10).drop(1)) == None,
      "corrupted signature byte")
    assert(dimsOf(header(10, 10, ihdrLen = 12)) == None, "IHDR length != 13")
    assert(dimsOf(header(10, 10, tag = "IDAT")) == None, "first chunk not IHDR")
    assert(dimsOf(header(0, 10)) == None, "zero width")
    assert(dimsOf(header(10, 0x80000000L)) == None, "sign-bit height")
    assert(dimsOf(Array.empty[Byte]) == None, "empty blob")
    val nullRow = Seq(Tuple1(Option.empty[Array[Byte]])).toDF("img")
      .select(call_function("png_dims", col("img")).as("d")).collect().head
    assert(nullRow.isNullAt(0), "null blob")
  }

  test("the q215 fixture's Spark-side construction round-trips through the " +
    "parser (construction and parse are independent code paths)") {
    val out = graft.operators.Multimodal
      .q215PngHeader(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      if (id % 7 == 3 || id % 7 == 5)
        assert(r.isNullAt(2) && r.isNullAt(3), s"doc $id must be malformed-null")
      else {
        assert(r.getLong(2) == id % 640 + 1, s"width drifted for doc $id")
        assert(r.getLong(3) == id % 480 + 1, s"height drifted for doc $id")
      }
    }
  }
}
