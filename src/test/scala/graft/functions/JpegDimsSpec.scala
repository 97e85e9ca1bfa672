package graft.functions

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** `jpeg_dims` — the variable-position JPEG SOF walk. Unlike PNG's
  * fixed offsets, every acceptance decision here depends on correctly
  * hopping the segment chain, so the spec concentrates on walk
  * integrity: payloads are skipped by LENGTH (an FF D8 inside an APPn
  * payload must not derail anything), SOF variants all terminate the
  * walk, illegal/standalone markers and bad lengths null out, and the
  * hop cap rejects crafted infinite chains.
  */
class JpegDimsSpec extends SparkSpec {
  import spark.implicits._

  private def seg(marker: Int, payload: Array[Byte]): Array[Byte] = {
    val len = payload.length + 2
    Array(0xFF.toByte, marker.toByte,
      ((len >> 8) & 0xFF).toByte, (len & 0xFF).toByte) ++ payload
  }

  private def sof(marker: Int, w: Int, h: Int): Array[Byte] =
    seg(marker, Array[Byte](8,
      ((h >> 8) & 0xFF).toByte, (h & 0xFF).toByte,
      ((w >> 8) & 0xFF).toByte, (w & 0xFF).toByte,
      1, 0x11, 0x22, 0))

  private val soi = Array(0xFF.toByte, 0xD8.toByte)
  private val eoi = Array(0xFF.toByte, 0xD9.toByte)

  private def dimsOf(bytes: Array[Byte]): Option[(Long, Long)] = {
    val r = Seq(Tuple1(bytes)).toDF("img")
      .select(call_function("jpeg_dims", col("img")).as("d"))
      .collect().head
    if (r.isNullAt(0)) None
    else { val s = r.getStruct(0); Some((s.getLong(0), s.getLong(1))) }
  }

  test("baseline: SOI + APP0 + SOF0 parses (width, height) big-endian") {
    val img = soi ++ seg(0xE0, new Array[Byte](14)) ++ sof(0xC0, 640, 480) ++ eoi
    assert(dimsOf(img) == Some((640L, 480L)))
  }

  test("the walk skips payloads by LENGTH, never by scanning: an FF D8 (and " +
    "an FF C0) INSIDE an APPn payload must not derail or fake an SOF") {
    val evil = new Array[Byte](20)
    evil(3) = 0xFF.toByte; evil(4) = 0xD8.toByte // fake SOI mid-payload
    evil(7) = 0xFF.toByte; evil(8) = 0xC0.toByte // fake SOF mid-payload
    val img = soi ++ seg(0xE1, evil) ++ sof(0xC0, 123, 45) ++ eoi
    assert(dimsOf(img) == Some((123L, 45L)))
  }

  test("every SOF variant terminates the walk (progressive C2, lossless C3, " +
    "arithmetic C9); DHT C4 is a plain segment and is hopped over") {
    for (m <- Seq(0xC1, 0xC2, 0xC3, 0xC9, 0xCB, 0xCF)) {
      val img = soi ++ seg(0xE0, new Array[Byte](5)) ++ sof(m, 77, 88) ++ eoi
      assert(dimsOf(img) == Some((77L, 88L)), f"SOF marker 0x$m%02X")
    }
    // C4 (DHT) must NOT be taken for an SOF: dims come from the real
    // SOF0 behind it, not the table bytes
    val img = soi ++ seg(0xC4, new Array[Byte](7)) ++ sof(0xC0, 31, 32) ++ eoi
    assert(dimsOf(img) == Some((31L, 32L)))
  }

  test("variable APP0 lengths move the SOF: a fixed-offset read cannot pass") {
    for (n <- Seq(0, 1, 14, 60)) {
      val img = soi ++ seg(0xE0, new Array[Byte](n)) ++ sof(0xC0, n + 1, 2 * n + 1)
      assert(dimsOf(img) == Some((n + 1L, 2L * n + 1L)), s"APP0 payload $n")
    }
  }

  test("malformed chains null out, never throw: bad SOI, EOI before SOF, " +
    "standalone RST, length < 2, hop past the end, truncated SOF, zero dims") {
    val app = seg(0xE0, new Array[Byte](6))
    assert(dimsOf(Array[Byte](0, 0) ++ app ++ sof(0xC0, 9, 9)) == None, "bad SOI")
    assert(dimsOf(soi ++ app ++ eoi) == None, "EOI before any SOF")
    assert(dimsOf(soi ++ Array(0xFF.toByte, 0xD3.toByte) ++ sof(0xC0, 9, 9))
      == None, "standalone RST3 mid-chain")
    assert(dimsOf(soi ++ Array[Byte](0xFF.toByte, 0xE0.toByte, 0, 1) ++ sof(0xC0, 9, 9))
      == None, "segment length < 2")
    assert(dimsOf(soi ++ Array(0xFF.toByte, 0xE0.toByte, 0x7F.toByte, 0xFF.toByte))
      == None, "hop lands past the end")
    assert(dimsOf((soi ++ app ++ sof(0xC0, 9, 9)).dropRight(6)) == None,
      "SOF truncated before the dimension bytes")
    assert(dimsOf(soi ++ app ++ sof(0xC0, 0, 10)) == None, "zero width")
    assert(dimsOf(soi ++ app ++ sof(0xC0, 10, 0)) == None, "zero height")
    assert(dimsOf(soi) == None, "SOI alone")
    assert(dimsOf(Array.empty[Byte]) == None, "empty")
  }

  test("FF fill bytes before a marker (ISO 10918-1 B.1.1.2) are consumed, " +
    "not misread as a marker: padded APPn and padded SOF both parse") {
    val fill = Array(0xFF.toByte, 0xFF.toByte, 0xFF.toByte) // 3 pads: FF FF FF FF mm
    val img1 = soi ++ fill ++ seg(0xE1, new Array[Byte](8)) ++ sof(0xC0, 10, 20)
    assert(dimsOf(img1) == Some((10L, 20L)), "fill bytes before APP1")
    val img2 = soi ++ seg(0xE0, new Array[Byte](5)) ++ fill ++ sof(0xC2, 30, 40)
    assert(dimsOf(img2) == Some((30L, 40L)), "fill bytes before SOF2")
  }

  test("fill bytes spend hops: a pad flood terminates at the cap instead of " +
    "walking forever") {
    // N pad FFs before the marker code: the last pad doubles as the
    // marker prefix, so the walk spends N-1 fill hops
    val pads62 = Array.fill(62)(0xFF.toByte)
    assert(dimsOf(soi ++ pads62 ++ Array(0xC0.toByte) ++ sof(0xC0, 3, 4).drop(2))
      == Some((3L, 4L)), "61 fill hops then SOF must parse")
    val pads66 = Array.fill(66)(0xFF.toByte)
    assert(dimsOf(soi ++ pads66 ++ Array(0xC0.toByte) ++ sof(0xC0, 3, 4).drop(2))
      == None, "65 fill hops must hit the cap")
  }

  test("TEM (FF 01) is STANDALONE per ISO 10918-1 Table B.1: no length " +
    "field — the bytes after it are the NEXT marker, not a length") {
    val tem = Array(0xFF.toByte, 0x01.toByte)
    // TEM directly before SOF: were TEM misread as length-prefixed, the
    // SOF's own FF C0 bytes would be eaten as a bogus length
    val img1 = soi ++ seg(0xE0, new Array[Byte](6)) ++ tem ++ sof(0xC0, 50, 60)
    assert(dimsOf(img1) == Some((50L, 60L)), "TEM before SOF")
    // TEM between two plain segments
    val img2 = soi ++ tem ++ seg(0xE1, new Array[Byte](3)) ++ sof(0xC2, 7, 8)
    assert(dimsOf(img2) == Some((7L, 8L)), "TEM right after SOI")
    // TEM spends a hop: 62 TEMs + APP0 + SOF = 64 hops -> cap
    val tems62 = (1 to 62).flatMap(_ => tem).toArray
    assert(dimsOf(soi ++ tems62 ++ sof(0xC0, 3, 4)) == Some((3L, 4L)),
      "62 TEM hops then SOF must parse")
    val tems64 = (1 to 64).flatMap(_ => tem).toArray
    assert(dimsOf(soi ++ tems64 ++ sof(0xC0, 3, 4)) == None,
      "64 TEM hops must hit the cap")
  }

  test("an SOF whose declared length is < 8 cannot cover precision+dims: " +
    "the dims bytes would belong to the NEXT segment — must null out") {
    val app = seg(0xE0, new Array[Byte](6))
    // hand-build an SOF0 with len = 5 (too short) followed by plausible
    // dimension-looking bytes that a lax parser would happily read
    val shortSof = Array(0xFF.toByte, 0xC0.toByte, 0x00, 0x05,
      8, 0x01, 0x2C, 0x01, 0x90).map(_.toByte)
    assert(dimsOf(soi ++ app ++ shortSof ++ eoi) == None, "SOF len 5")
    val lenTwoSof = Array(0xFF.toByte, 0xC0.toByte, 0x00, 0x02,
      8, 0x01, 0x2C, 0x01, 0x90).map(_.toByte)
    assert(dimsOf(soi ++ app ++ lenTwoSof ++ eoi) == None, "SOF len 2")
    // len = 8 exactly (degenerate Nf=0 frame) still yields the dims —
    // the guard is about not reading past the declared payload
    val len8Sof = Array(0xFF.toByte, 0xC0.toByte, 0x00, 0x08,
      8, 0x01, 0x2C, 0x01, 0x90).map(_.toByte)
    assert(dimsOf(soi ++ app ++ len8Sof ++ eoi) == Some((400L, 300L)),
      "SOF len 8 parses")
  }

  test("the 64-hop cap rejects a crafted endless segment chain; 63 hops of " +
    "real segments still reach the SOF") {
    val tiny = seg(0xE2, Array.empty[Byte]) // 4-byte segment, len = 2
    val chain63 = soi ++ (1 to 63).flatMap(_ => tiny).toArray ++ sof(0xC0, 5, 6)
    assert(dimsOf(chain63) == Some((5L, 6L)), "63 hops must still parse")
    val chain64 = soi ++ (1 to 64).flatMap(_ => tiny).toArray ++ sof(0xC0, 5, 6)
    assert(dimsOf(chain64) == None, "the 65th segment must hit the hop cap")
  }

  test("the q217 fixture round-trips: planted dims recovered, malformed " +
    "classes null, across the whole sf0.001 table") {
    val out = graft.operators.Multimodal
      .q217JpegHeader(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      if (id % 7 == 3 || id % 7 == 5)
        assert(r.isNullAt(2) && r.isNullAt(3), s"doc $id must be malformed-null")
      else {
        assert(r.getLong(2) == id % 4000 + 1, s"width drifted for doc $id")
        assert(r.getLong(3) == id % 3000 + 1, s"height drifted for doc $id")
      }
    }
  }
}
