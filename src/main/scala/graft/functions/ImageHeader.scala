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
  * `FF FF FF E1 …` parse correctly. Any violation — short blob, bad
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
        val h = be16(bytes, o + 5).toLong
        val w = be16(bytes, o + 7).toLong
        if (w < 1L || h < 1L) return null
        return new GenericInternalRow(Array[Any](w, h))
      } else if (m >= 0xD0 && m <= 0xD9) {
        // standalone or structurally illegal before SOF: RST0-7, EOI, SOI
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
