package graft.functions

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** `pgm_stats` — the pixel-level raster decode (netpbm P5). The parse
  * surface is a whitespace-token header with comment lines, then a
  * length-checked binary payload; the spec pins the token walk (multi-
  * whitespace, comments, 1-vs-2-digit fields), the EXACTLY-one-
  * whitespace rule before the raster (a pixel whose value happens to
  * be 0x0A must be DATA, not separator), the statistics arithmetic,
  * and every malformed class the 100 TB null-safety contract names.
  */
class PgmStatsSpec extends SparkSpec {
  import spark.implicits._

  private def pgm(header: String, pixels: Array[Int]): Array[Byte] =
    header.getBytes("UTF-8") ++ pixels.map(_.toByte)

  private def statsOf(bytes: Array[Byte]): Option[Seq[Long]] = {
    val r = Seq(Tuple1(bytes)).toDF("img")
      .select(call_function("pgm_stats", col("img")).as("s"))
      .collect().head
    if (r.isNullAt(0)) None
    else {
      val s = r.getStruct(0)
      Some((0 until 10).map(s.getLong))
    }
  }

  test("baseline: 3x2 raster decodes dims, sum/min/max, and the 4-bin " +
    "histogram (pixel >> 6)") {
    val px = Array(0, 63, 64, 128, 192, 255)
    val got = statsOf(pgm("P5\n3 2\n255\n", px))
    // width, height, maxval, sum, min, max, b0, b1, b2, b3
    assert(got == Some(Seq(3L, 2L, 255L, 702L, 0L, 255L, 2L, 1L, 1L, 2L)))
  }

  test("header tokens accept runs of mixed whitespace and '#' comments " +
    "anywhere between tokens (netpbm allows both)") {
    val px = Array(10, 20, 30, 40)
    val base = statsOf(pgm("P5\n2 2\n255\n", px))
    assert(base.nonEmpty)
    assert(statsOf(pgm("P5  \t\r\n 2 \n\n 2 \t 255\n", px)) == base,
      "mixed whitespace runs")
    assert(statsOf(pgm("P5\n# a comment\n2 2\n# another\n255\n", px)) == base,
      "comment lines between tokens")
    assert(statsOf(pgm("P5\n2 # trailing comment\n2\n255\n", px)) == base,
      "comment after a token on the same line")
  }

  test("EXACTLY one whitespace byte separates maxval from the raster: a " +
    "first pixel of 0x0A is DATA, not a second separator") {
    // pixels (10, 200, 200, 200): were the 0x0A eaten as whitespace,
    // the payload would be one short and the parse would null out
    val got = statsOf(pgm("P5\n2 2\n255\n", Array(10, 200, 200, 200)))
    assert(got == Some(Seq(2L, 2L, 255L, 610L, 10L, 200L, 1L, 0L, 0L, 3L)))
  }

  test("two-digit dimensions parse (the fixture's variable-width header)") {
    val px = Array.tabulate(12 * 2)(i => i * 10 % 256)
    val got = statsOf(pgm("P5\n12 2\n255\n", px))
    assert(got.exists(s => s(0) == 12L && s(1) == 2L && s(3) == px.map(_.toLong).sum))
  }

  test("malformed rasters null out, never throw: bad magic, ASCII P2 form, " +
    "missing tokens, zero dims, maxval out of [1,255], truncated payload, " +
    "missing separator, empty") {
    val px = Array(1, 2, 3, 4)
    assert(statsOf(pgm("P6\n2 2\n255\n", px)) == None, "PPM magic")
    assert(statsOf(pgm("P2\n2 2\n255\n", px)) == None, "ASCII PGM form")
    assert(statsOf(pgm("P5\n2 2\n", px)) == None, "maxval missing")
    assert(statsOf(pgm("P5\n0 2\n255\n", px)) == None, "zero width")
    assert(statsOf(pgm("P5\n2 0\n255\n", px)) == None, "zero height")
    assert(statsOf(pgm("P5\n2 2\n0\n", px)) == None, "maxval 0")
    assert(statsOf(pgm("P5\n2 2\n256\n", px)) == None, "maxval 256 (16-bit form)")
    assert(statsOf(pgm("P5\n2 2\n255\n", px.take(3))) == None, "payload short")
    assert(statsOf(pgm("P5\n2 2\n255", Array.empty[Int])) == None,
      "EOF where the separator byte must be")
    assert(statsOf("P5\n2 2\nxx\n".getBytes("UTF-8")) == None, "garbled token")
    assert(statsOf(Array.empty[Byte]) == None, "empty")
  }

  test("the pixel-count cap rejects a crafted header before touching the " +
    "payload (one scan row must stay O(MB))") {
    // 5000 x 5000 = 25M > 2^24: declared malformed even though the
    // payload is (deliberately) absent — the cap fires first
    assert(statsOf(pgm("P5\n5000 5000\n255\n", Array(1, 2, 3))) == None)
    assert(PgmStats.MaxPixels == (1L << 24))
  }

  test("the q218 fixture round-trips: planted stats recovered, malformed " +
    "classes null, across the whole sf0.001 table") {
    val out = graft.operators.Multimodal
      .q218PgmPixelStats(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      if (id % 9 == 4 || id % 9 == 7)
        assert(r.isNullAt(2), s"doc $id must be malformed-null")
      else {
        val w = id % 15 + 2; val h = id % 5 + 2; val n = w * h
        assert(r.getLong(2) == w && r.getLong(3) == h, s"dims drifted for doc $id")
        val px = (0L until n).map(i => (id * 31 + i * 7) % 256)
        assert(r.getLong(4) == px.sum, s"px_sum drifted for doc $id")
        assert(r.getLong(5) == px.min && r.getLong(6) == px.max,
          s"px_min/max drifted for doc $id")
        assert((7 to 10).map(r.getLong).sum == n, s"bins must cover doc $id")
      }
    }
  }
}
