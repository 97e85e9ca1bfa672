package graft.operators

import graft.mr.SparkSpec

/** Multimodal batch stages: the oracle pins the deterministic metadata
  * contracts end-to-end; this spec pins the geometric invariants of the
  * resize stage that no single fixture row proves — fit inside the
  * target square, aspect preserved under integer floor division, and
  * the payload byte budget.
  */
class MultimodalSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("q56 resize fits the target square, preserves aspect, sizes the payload") {
    val rows = Multimodal.q56MultimodalResize(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sw, sh) = (r.getAs[Long]("src_w"), r.getAs[Long]("src_h"))
      val (dw, dh) = (r.getAs[Long]("dst_w"), r.getAs[Long]("dst_h"))
      assert(dw <= Multimodal.ResizeTarget && dh <= Multimodal.ResizeTarget, r)
      assert(dw >= 1 && dh >= 1, r)
      // the long side maps exactly to the target
      assert(math.max(dw, dh) == Multimodal.ResizeTarget, r)
      // aspect preserved up to floor division
      val longSide = math.max(sw, sh)
      assert(dw == math.max(sw * Multimodal.ResizeTarget / longSide, 1L), r)
      assert(dh == math.max(sh * Multimodal.ResizeTarget / longSide, 1L), r)
      assert(r.getAs[Long]("out_bytes") == dw * dh * 3L, r)
    }
  }

  test("resizeStub round-trips the payload byte budget on edge shapes") {
    // tiny blob (1 byte) and the empty blob must not divide by zero
    val (m1, out1) = Multimodal.resizeStub(1L, Array[Byte](7))
    assert(out1.length.toLong == m1.out_bytes && m1.out_bytes > 0)
    val (m0, out0) = Multimodal.resizeStub(0L, Array.emptyByteArray)
    assert(out0.length.toLong == m0.out_bytes)
  }
}
