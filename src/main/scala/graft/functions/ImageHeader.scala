package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StructField, StructType}

/** `png_dims(blob)`: genuine PNG header parse as a native codegen
  * expression over `BinaryType` — `struct<width,height>` from the IHDR
  * chunk, or NULL for anything that is not a well-formed PNG prefix.
  * This is the first multimodal operator whose payload step actually
  * READS the byte format (the q29/q46 codec stubs derive fake metadata
  * from the blob length; this validates and decodes real header bytes),
  * making the opaque media column more than a payload: schema-on-read
  * for binary data, inside whole-stage codegen, no UDF boxing.
  *
  * Parse rules (PNG spec, public: ISO/IEC 15948 §5.2/§11.2.2 — also
  * RFC 2083): the 8-byte signature `89 50 4E 47 0D 0A 1A 0A`, then the
  * IHDR chunk, which MUST be first: 4-byte big-endian length (= 13),
  * the ASCII tag `IHDR`, then 4-byte big-endian width and height, each
  * required to be in [1, 2³¹−1]. Everything after byte 24 (palette,
  * data, CRC) is irrelevant to dimensions and ignored. Any violation —
  * short blob, wrong signature, first chunk not a 13-byte IHDR, zero
  * or sign-bit dimensions, NULL input — yields NULL, never a throw: at
  * 100 TB a scan meets truncated and mislabeled media constantly, and
  * a malformed blob must cost one null row, not the job.
  */
object PngDims {

  val OutType: StructType = StructType(Seq(
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false)))

  private final val Signature: Array[Int] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
      ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)

  /** Null for any non-PNG prefix; `(width, height)` row otherwise. */
  def parse(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 24) return null
    var i = 0
    while (i < 8) {
      if ((bytes(i) & 0xFF) != Signature(i)) return null
      i += 1
    }
    if (be32(bytes, 8) != 13L) return null // first chunk must be 13-byte IHDR
    if (bytes(12) != 'I' || bytes(13) != 'H' ||
        bytes(14) != 'D' || bytes(15) != 'R') return null
    val w = be32(bytes, 16)
    val h = be32(bytes, 20)
    if (w < 1L || w > 0x7FFFFFFFL || h < 1L || h > 0x7FFFFFFFL) return null
    new GenericInternalRow(Array[Any](w, h))
  }
}

/** `jpeg_dims(blob)`: genuine JPEG (JFIF/ISO 10918-1) header parse —
  * unlike PNG's fixed offsets, JPEG dimensions live in a Start-Of-Frame
  * segment at a VARIABLE position, so the parser must walk the marker
  * segment chain: SOI (`FF D8`), then repeated `FF mm | len(2, BE,
  * includes itself) | payload(len-2)` hops until an SOF marker
  * (C0–C3, C5–C7, C9–CB, CD–CF — baseline, progressive, lossless,
  * arithmetic variants; NOT C4/C8/CC which are DHT/JPG/DAC), whose
  * payload is `precision(1) | height(2 BE) | width(2 BE) | ...`.
  * Payload bytes are SKIPPED BY LENGTH, never scanned — an `FF D8`
  * inside an APPn payload must not derail the walk (spec-pinned) —
  * and FF FILL bytes before a marker (ISO 10918-1 B.1.1.2 allows any
  * number) are consumed one per hop, so EXIF writers that pad with
  * `FF FF FF E1 …` parse correctly. TEM (`FF 01`) is STANDALONE per
  * ISO 10918-1 Table B.1 — no length field, exactly like RSTn — so it
  * advances two bytes and spends a hop rather than misreading the next
  * bytes as a length. The SOF segment's own declared length must be
  * >= 8 (covering precision + height + width + Nf) or the blob is
  * malformed. Any violation — short blob, bad
  * SOI, a non-FF where a marker must be, a standalone/illegal marker
  * before SOF (D0–D9 incl. EOI), segment length < 2, a hop past the
  * end, zero dimensions, or more than [[JpegDims.MaxHops]] hops
  * (segments AND fill bytes both spend hops, so a pad flood
  * terminates) — yields NULL, never a throw.
  */
object JpegDims {

  /** Segment-hop cap: real files carry a handful of APPn/DQT/DHT
    * segments before SOF; 64 hops of headroom, and past it the blob is
    * declared malformed rather than letting a crafted length chain walk
    * a 100 TB scan row forever. The DuckDB oracle's recursive walk caps
    * at the same depth so both engines reject the same inputs.
    */
  final val MaxHops = 64

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)

  private def isSof(m: Int): Boolean =
    m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC

  /** Null for any non-JPEG prefix; `(width, height)` row otherwise. */
  def parse(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 4) return null
    if ((bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return null
    var o = 2
    var hops = 0
    while (hops < MaxHops) {
      if (o + 4 > bytes.length) return null // marker + length must fit
      if ((bytes(o) & 0xFF) != 0xFF) return null
      val m = bytes(o + 1) & 0xFF
      if (m == 0xFF) {
        // FF fill byte (ISO 10918-1 B.1.1.2): markers may be preceded
        // by any number of FF pad bytes — advance ONE byte so the next
        // iteration re-reads this FF as the marker prefix. Each fill
        // byte spends a hop (mirrored exactly by the oracle walk), so
        // a pad flood still terminates at the cap.
        o += 1
        hops += 1
      } else if (isSof(m)) {
        if (o + 9 > bytes.length) return null // len(2)+prec(1)+h(2)+w(2)
        // spec-strict: the SOF segment's own declared length must cover
        // precision+height+width (2 len + 1 prec + 2 h + 2 w = 7, so
        // len >= 8 once the mandatory Nf byte is counted) — otherwise
        // the dims read here would be bytes belonging to the NEXT
        // segment of a crafted blob, not frame dimensions
        if (be16(bytes, o + 2) < 8) return null
        val h = be16(bytes, o + 5).toLong
        val w = be16(bytes, o + 7).toLong
        if (w < 1L || h < 1L) return null
        return new GenericInternalRow(Array[Any](w, h))
      } else if (m == 0x01) {
        // TEM (FF 01): STANDALONE per ISO 10918-1 Table B.1 — no length
        // field follows, exactly like RSTn. Before this branch existed
        // the byte after TEM was misread as a length high byte (the
        // same fixture-domain blind spot class as the FF-fill gap:
        // both engines agreed on the fixture, neither on the spec).
        // Advance past the 2-byte marker and spend a hop.
        o += 2
        hops += 1
      } else if (m >= 0xD0 && m <= 0xD9) {
        // standalone AND structurally illegal before SOF: RST0-7, EOI, SOI
        return null
      } else {
        val len = be16(bytes, o + 2)
        if (len < 2) return null
        o += 2 + len
        hops += 1
      }
    }
    null
  }
}

case class JpegDims(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override def dataType: DataType = PngDims.OutType

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    JpegDims.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.JpegDims.parse($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): JpegDims =
    copy(child = newChild)
}

/** `pgm_stats(blob)`: the PIXEL-LEVEL rung of the multimodal ladder —
  * q215/q217 stop at header bytes; this decodes an uncompressed raster
  * PAYLOAD. Binary PGM ("P5", netpbm spec, public:
  * https://netpbm.sourceforge.net/doc/pgm.html): the magic `P5`, then
  * whitespace-separated ASCII decimals width, height, maxval — with
  * `#`-to-end-of-line comments allowed between tokens — then EXACTLY
  * one whitespace byte, then `width*height` raw bytes of row-major
  * pixels (one byte per pixel for maxval < 256; the 2-byte-per-pixel
  * maxval >= 256 form is out of scope and nulls). Output: the parsed
  * dimensions plus REAL pixel statistics — sum, min, max, and a 4-bin
  * luminance histogram (pixel >> 6) — all integers, so the DuckDB
  * oracle's independent blob arithmetic is exactly comparable with no
  * float drift. NULL, never a throw, for: bad magic, missing/garbled
  * header tokens, maxval outside [1, 255], zero/negative dimensions,
  * more than [[PgmStats.MaxPixels]] pixels (a crafted header must not
  * make one scan row allocate/walk gigabytes), or a payload shorter
  * than width*height.
  */
object PgmStats {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  val OutType: StructType = StructType(Seq(
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("maxval", LongType, nullable = false),
    StructField("px_sum", LongType, nullable = false),
    StructField("px_min", LongType, nullable = false),
    StructField("px_max", LongType, nullable = false),
    StructField("b0", LongType, nullable = false),
    StructField("b1", LongType, nullable = false),
    StructField("b2", LongType, nullable = false),
    StructField("b3", LongType, nullable = false)))

  /** Pixel-count cap: one row's decode must stay O(MB), not O(GB) —
    * past it the blob is declared malformed (the JpegDims.MaxHops
    * discipline applied to payload size).
    */
  final val MaxPixels: Long = 1L << 24

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == 0x0B || b == 0x0C

  /** Null for anything that is not a well-formed 8-bit binary PGM. */
  def parse(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 7) return null // P5 + 3 tokens + ws
    if (bytes(0) != 'P' || bytes(1) != '5') return null
    var o = 2
    // one whitespace-separated ASCII decimal, skipping '#' comments;
    // -1 on malformed (no digits, EOF, or a value overflowing the cap)
    def nextInt(): Long = {
      var inComment = false
      while (o < bytes.length &&
        (inComment || isWs(bytes(o)) || bytes(o) == '#')) {
        if (inComment) { if (bytes(o) == '\n') inComment = false }
        else if (bytes(o) == '#') inComment = true
        o += 1
      }
      if (o >= bytes.length || bytes(o) < '0' || bytes(o) > '9') return -1L
      var v = 0L
      while (o < bytes.length && bytes(o) >= '0' && bytes(o) <= '9') {
        v = v * 10 + (bytes(o) - '0')
        if (v > MaxPixels) return -1L // no header field needs more
        o += 1
      }
      v
    }
    val w = nextInt()
    val h = nextInt()
    val maxval = nextInt()
    if (w < 1 || h < 1 || maxval < 1 || maxval > 255) return null
    if (w * h > MaxPixels) return null
    // exactly ONE whitespace byte separates maxval from the raster
    if (o >= bytes.length || !isWs(bytes(o))) return null
    o += 1
    val n = (w * h).toInt
    if (o + n > bytes.length) return null // truncated payload
    var sum = 0L
    var min = 255L
    var max = 0L
    val bins = new Array[Long](4)
    var i = 0
    while (i < n) {
      val px = (bytes(o + i) & 0xFF).toLong
      sum += px
      if (px < min) min = px
      if (px > max) max = px
      bins((px >> 6).toInt) += 1L
      i += 1
    }
    new GenericInternalRow(Array[Any](
      w, h, maxval, sum, min, max, bins(0), bins(1), bins(2), bins(3)))
  }
}

case class PgmStats(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override def dataType: DataType = PgmStats.OutType

  // nullable even over a non-null child: malformed bytes parse to null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    PgmStats.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.PgmStats.parse($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PgmStats =
    copy(child = newChild)
}

case class PngDims(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override def dataType: DataType = PngDims.OutType

  // nullable even over a non-null child: malformed bytes parse to null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    PngDims.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.PngDims.parse($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PngDims =
    copy(child = newChild)
}
