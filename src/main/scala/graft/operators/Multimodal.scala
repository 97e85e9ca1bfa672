package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media ride through the pipeline as opaque
  * `binary` columns with typed metadata extracted by batched
  * per-partition stages (the Scala analogue of `mapInPandas`).
  *
  * The codecs themselves are STUBS — image/audio libraries are not
  * available in this environment — but everything Spark-side is real:
  * the binary column, the partition-parallel batch iteration with
  * once-per-partition init (context-manager idiom, reference
  * docs.rst:189-194), the typed output schemas, the flatMap shape of
  * frame sampling, and the deterministic metadata contracts the oracle
  * pins. A real deployment swaps only the stub bodies for actual codecs.
  */
object Multimodal {

  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long)
  final case class Frame(doc_id: Long, frame_idx: Long, frame_off: Long, frame_len: Long)
  final case class MediaFeatures(doc_id: Long, f0: Double, f7: Double, norm_q: Long)

  val FrameStride: Long = 4096L

  /** Cap on sampled frames per blob — real frame samplers bound the
    * per-video fan-out the same way; part of the operator contract.
    */
  val MaxFrames: Long = 16L

  /** STUB decoder: derives fake-but-deterministic dimensions from the
    * blob length.
    */
  private[operators] def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    MediaMeta(id, n, n % 640 + 1, n % 480 + 1)
  }

  /** STUB frame sampler: one frame per [[FrameStride]] bytes, at most
    * [[MaxFrames]] and at least one — the flatMap (1 row in, n rows out)
    * batch shape of video decode.
    */
  private[operators] def frameSampleStub(id: Long, bytes: Array[Byte]): Iterator[Frame] = {
    val n = bytes.length.toLong
    val frames = math.min((n + FrameStride - 1) / FrameStride, MaxFrames)
    (0L until math.max(frames, 1L)).iterator.map { i =>
      val off = i * FrameStride
      Frame(id, i, off, math.max(math.min(FrameStride, n - off), 0L))
    }
  }

  /** STUB feature extractor: deterministic pseudo-embedding from the blob
    * length (stands in for a vision encoder); norm kept fixed-point for
    * bit-stable comparison.
    */
  private[operators] def featureStub(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val n = bytes.length.toLong
    def f(i: Int): Double = ((n * (i + 7919)) % 1000).toDouble / 1000.0
    val normQ = (0 until 8).map(i => { val q = (n * (i + 7919)) % 1000; q * q }).sum
    MediaFeatures(id, f(0), f(7), normQ)
  }

  /** Binary ingestion + batched decode. */
  def q29MultimodalMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // a real codec would init once per partition here
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Frame sampling: one input blob fans out to n frame rows (flatMap
    * batch shape) — partitioning carries over, no shuffle.
    */
  def q45MultimodalFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => frameSampleStub(id, bytes) })
      .toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  final case class Resized(
      doc_id: Long, src_w: Long, src_h: Long,
      dst_w: Long, dst_h: Long, out_bytes: Long)

  /** Target square for the resize stub (the standard vision-encoder
    * input side).
    */
  val ResizeTarget: Long = 224L

  /** STUB resizer: aspect-preserving fit into [[ResizeTarget]]² with
    * INTEGER-ONLY math (`dim * target / max(w, h)`, floor division) so
    * the output geometry is bit-exact reproducible by any engine, and a
    * deterministic fake RGB payload of `dst_w * dst_h * 3` bytes (the
    * real byte-budget contract a downstream batcher sizes against). A
    * real deployment swaps the payload fill for an actual scaler; the
    * geometry, the binary-out column and the batch shape stay.
    */
  /** Geometry half of the resize: pure integer math, no payload. */
  private[operators] def resizeGeom(id: Long, bytes: Array[Byte]): Resized = {
    val m = decodeStub(id, bytes)
    val longSide = math.max(m.width, m.height)
    val dw = math.max(m.width * ResizeTarget / longSide, 1L)
    val dh = math.max(m.height * ResizeTarget / longSide, 1L)
    Resized(id, m.width, m.height, dw, dh, dw * dh * 3L)
  }

  private[operators] def resizeStub(id: Long, bytes: Array[Byte]): (Resized, Array[Byte]) = {
    val meta = resizeGeom(id, bytes)
    val out = new Array[Byte](meta.out_bytes.toInt)
    if (bytes.nonEmpty) {
      var i = 0
      while (i < out.length) { out(i) = bytes(i % bytes.length); i += 1 }
    } // empty source: zero-filled payload (a real codec rejects upstream)
    (meta, out)
  }

  /** Batched resize planning: binary in, typed geometry out. The
    * payload ([[resizeStub]]) is deliberately NOT materialized here —
    * a resize stage only pays the payload bytes when a sink consumes
    * them (at 100 TB, producing-then-discarding ~150 KB per row is the
    * difference between a metadata pass and a full media rewrite); a
    * training pipeline maps [[resizeStub]] in the writer stage instead.
    */
  def q56MultimodalResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // a real scaler would init once per partition here
        it.map { case (id, bytes) => resizeGeom(id, bytes) }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** The 16 bytes of a PNG prefix that precede the dimensions: the
    * 8-byte signature, the IHDR length (13, big-endian) and the IHDR
    * tag — public layout, ISO/IEC 15948 §5.2/§11.2.2.
    */
  private val PngPrefix16: Array[Byte] = Array(
    0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, // signature
    0x00, 0x00, 0x00, 0x0D,                                 // IHDR length = 13
    0x49, 0x48, 0x44, 0x52)                                 // "IHDR"

  /** q215: GENUINE multimodal byte-format read — PNG header parse over
    * a binary column via the native [[graft.functions.PngDims]] codegen
    * expression (the first media op here whose payload step actually
    * reads the format rather than stubbing it). The fixture plants a
    * REAL PNG prefix per document — signature, IHDR length/tag, and
    * big-endian dimensions derived from doc_id, followed by the
    * document text as opaque payload bytes — built declaratively with
    * `hex/lpad/unhex/concat` so the DuckDB oracle constructs the
    * IDENTICAL blob from the parquet table and then parses it with its
    * own independent machinery (hex-string slicing + 0x-cast blob
    * arithmetic): construction is shared, PARSING is cross-engine
    * differential. Two deterministic malformed classes ride the same
    * column — doc_id % 7 == 3 truncates mid-header, % 7 == 5 corrupts
    * the signature byte — and must parse to NULL on both engines, so
    * the driver hash-match certifies the null-safety contract too,
    * every round. At 100 TB this is one codegen projection per scan
    * row: no shuffle, no UDF, no driver involvement.
    */
  def q215PngHeader(s: SparkSession, d: String): DataFrame = {
    val be32 = (v: org.apache.spark.sql.Column) =>
      unhex(lpad(hex(v), 8, "0"))
    val wellFormed = concat(
      lit(PngPrefix16),
      be32(col("doc_id") % 640 + 1),
      be32(col("doc_id") % 480 + 1),
      encode(coalesce(col("text"), lit("")), "UTF-8"))
    val img = when(col("doc_id") % 7 === 3,
        substring(wellFormed, 1, 10)) // truncated mid-header
      .when(col("doc_id") % 7 === 5,
        concat(lit(Array[Byte](0x00.toByte)),
          substring(wellFormed, 2, 1 << 30))) // corrupted signature
      .otherwise(wellFormed)
    Tables.documents(s, d)
      .select(col("doc_id"), img.as("img"))
      .select(
        col("doc_id"),
        octet_length(col("img")).cast("long").as("n_bytes"),
        call_function("png_dims", col("img")).as("dims"))
      .select(col("doc_id"), col("n_bytes"),
        col("dims.width").as("width"), col("dims.height").as("height"))
      .orderBy(col("doc_id"))
  }

  /** q217: GENUINE JPEG header parse — the variable-position sibling of
    * [[q215PngHeader]]: JPEG dimensions live in a Start-Of-Frame
    * segment at a position that depends on every preceding segment's
    * length field, so [[graft.functions.JpegDims]] WALKS the marker
    * chain (SOI, then FF-marker/BE16-length hops, payloads skipped by
    * length never scanned) instead of reading fixed offsets. The
    * fixture plants, per document, a structurally real JPEG prefix
    * with a VARIABLE-length APP0 segment (payload size derives from
    * doc_id, so the SOF offset differs row to row — a fixed-offset
    * "parser" cannot pass this oracle), an SOF0 with doc_id-derived
    * dimensions, and an EOI. Construction happens in HEX-STRING space
    * with the same hex/lpad/repeat arithmetic on both engines, then
    * one unhex; the DuckDB oracle re-walks the chain independently
    * with a RECURSIVE CTE over segment offsets (capped at the same 64
    * hops as the parser). Malformed classes: %7=3 truncates inside the
    * APP0 payload (the walk's next hop lands past the end), %7=5
    * corrupts the SOI — NULL on both engines, certified by the driver
    * hash every round. Spec-rule classes planted per the FF-fill
    * playbook: %7=6 pads SOF with FF fill bytes (B.1.1.2), %7=1
    * precedes SOF with a standalone TEM marker (Table B.1).
    */
  def q217JpegHeader(s: SparkSession, d: String): DataFrame = {
    val hx0 = concat(
      lit("FFD8"), // SOI
      lit("FFE0"), lpad(hex(col("doc_id") % 32 + 16), 4, "0"), // APP0, variable len
      expr("repeat('00', int(doc_id % 32 + 14))"),             // APP0 payload
      // every 7th doc pads the SOF marker with two FF FILL bytes
      // (ISO 10918-1 B.1.1.2) so the oracle's fill-hop arm is
      // hash-exercised every round, not just spec-covered
      when(col("doc_id") % 7 === 6, lit("FFFF")).otherwise(lit("")),
      // %7=1 plants a standalone TEM marker (FF 01, ISO 10918-1
      // Table B.1: no length field) before SOF so the parser's and
      // oracle's standalone-hop arms are hash-exercised every round
      // — the fixture-plant playbook from the FF-fill finding
      when(col("doc_id") % 7 === 1, lit("FF01")).otherwise(lit("")),
      lit("FFC0000B08"), // SOF0, len 0x0B, precision 8
      lpad(hex(col("doc_id") % 3000 + 1), 4, "0"),             // height
      lpad(hex(col("doc_id") % 4000 + 1), 4, "0"),             // width
      lit("01112200"),   // 1 component (id, sampling, quant table)
      lit("FFD9"))       // EOI
    val hx = when(col("doc_id") % 7 === 3, substring(hx0, 1, 20))
      .when(col("doc_id") % 7 === 5,
        concat(lit("00"), substring(hx0, 3, 1 << 30)))
      .otherwise(hx0)
    Tables.documents(s, d)
      .select(col("doc_id"), unhex(hx).as("img"))
      .select(
        col("doc_id"),
        octet_length(col("img")).cast("long").as("n_bytes"),
        call_function("jpeg_dims", col("img")).as("dims"))
      .select(col("doc_id"), col("n_bytes"),
        col("dims.width").as("width"), col("dims.height").as("height"))
      .orderBy(col("doc_id"))
  }

  /** q218: PIXEL-LEVEL multimodal decode — the rung q215/q217 stop
    * short of (they read header bytes; this reads the PAYLOAD). The
    * fixture plants a binary PGM (`P5`, netpbm spec) per document:
    * an ASCII header with doc_id-derived dimensions — every 9th doc
    * additionally carries a `#` comment line, so the parser's
    * comment-skip arm is hash-exercised, and width spans 1–2 digits so
    * the raster offset is variable — followed by `width*height` raw
    * pixel bytes from the shared formula `(doc_id*31 + 7i) mod 256`.
    * Construction happens in hex-string space identically on both
    * engines; PARSING is cross-engine independent — Spark decodes with
    * the native [[graft.functions.PgmStats]] codegen expression (magic
    * walk, token scan, one pass over the raster), DuckDB re-checks the
    * magic bytes and payload length from the BLOB and re-aggregates
    * sum/min/max and the 4-bin histogram from the blob's own pixel
    * bytes by hex-slice arithmetic. All statistics are integers, so
    * the hash compare is exact. Malformed classes: %9=4 truncates
    * 3 bytes out of the raster (payload shorter than width*height),
    * %9=7 corrupts the magic — NULL on both engines every round. At
    * 100 TB this stays one codegen projection per scan row: no
    * shuffle, no UDF boxing, no driver involvement, decode cost
    * bounded by [[graft.functions.PgmStats.MaxPixels]].
    */
  def q218PgmPixelStats(s: SparkSession, d: String): DataFrame = {
    val w = col("doc_id") % 15 + 2 // 2..16: width crosses the 1->2 digit line
    val h = col("doc_id") % 5 + 2  // 2..6
    val n = w * h                  // 4..96 pixels
    val headerHex = hex(encode(concat(
      lit("P5\n"),
      when(col("doc_id") % 9 === 2, lit("# synthetic luminance tile\n"))
        .otherwise(lit("")),
      w.cast("string"), lit(" "), h.cast("string"), lit("\n255\n")), "UTF-8"))
    val pixelsHex = array_join(transform(sequence(lit(0L), n - 1),
      i => lpad(hex((col("doc_id") * 31 + i * 7) % 256), 2, "0")), "")
    val hx0 = concat(headerHex, pixelsHex)
    val hx = when(col("doc_id") % 9 === 4,
        hx0.substr(lit(1), length(hx0) - 6)) // 3 raster bytes cut off the end
      .when(col("doc_id") % 9 === 7,
        concat(lit("00"), substring(hx0, 3, 1 << 30))) // corrupted magic
      .otherwise(hx0)
    Tables.documents(s, d)
      .select(col("doc_id"), unhex(hx).as("img"))
      .select(col("doc_id"),
        octet_length(col("img")).cast("long").as("n_bytes"),
        call_function("pgm_stats", col("img")).as("st"))
      .select(col("doc_id"), col("n_bytes"),
        col("st.width").as("width"), col("st.height").as("height"),
        col("st.px_sum").as("px_sum"), col("st.px_min").as("px_min"),
        col("st.px_max").as("px_max"),
        col("st.b0").as("b0"), col("st.b1").as("b1"),
        col("st.b2").as("b2"), col("st.b3").as("b3"))
      .orderBy(col("doc_id"))
  }

  /** Feature extraction into typed scalar/fixed-point columns. */
  def q46MultimodalFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => featureStub(id, bytes) })
      .toDF()
      .orderBy(col("doc_id"))
  }
}
