package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** Fixed-point power-iteration PCA projection (q157). The driver
  * hash-matches the unrolled-CTE DuckDB replay; these fixtures pin the
  * SEMANTICS — the recovered direction is the true top principal
  * direction, the sign convention is deterministic, and the result is a
  * pure function of the data (partitioning-invariant), which is what
  * licenses the Gram-collapse distributed shape.
  */
class PcaSpec extends SparkSpec {

  private def project(rows: Seq[(Long, Int, Array[Float])], parts: Int = 4) = {
    import spark.implicits._
    graft.functions.FingerprintFunctions.register(spark)
    val emb = rows.toDF("vec_id", "label", "embedding").repartition(parts)
    Similarity.pcaProjectOf(emb)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
  }

  /** Corpus stretched along a planted direction u with small noise off
    * it: variance along u is ~100x the off-axis variance.
    */
  private def planted: Seq[(Long, Int, Array[Float])] = {
    // u = (3, 4)/5 embedded in 8 dims; t ranges widely, noise is tiny
    (0 until 40).map { k =>
      val t = (k - 20) * 0.04f
      val eps = ((k * 7 % 5) - 2) * 0.001f
      val v = Array.fill(8)(0f)
      v(0) = 0.6f * t - 0.8f * eps
      v(1) = 0.8f * t + 0.6f * eps
      (k.toLong, k % 3, v)
    }
  }

  test("projection recovers the planted dominant direction") {
    val got = project(planted).toMap
    // along the planted axis, proj must be monotone in t = (k - 20)
    val sorted = planted.map(_._1).sortBy(id => (id - 20) * 0.04)
    val projs = sorted.map(got)
    val inc = projs.zip(projs.tail).forall { case (a, b) => a <= b }
    val dec = projs.zip(projs.tail).forall { case (a, b) => a >= b }
    assert(inc || dec, s"projection not monotone along planted axis: $projs")
    // and it must actually separate: the extremes sit far apart
    assert(math.abs(projs.last - projs.head) > 0L)
  }

  test("sign convention makes the output deterministic, not just ±consistent") {
    // flipping every input vector flips the raw eigenvector, but the
    // first-nonzero-positive pin must produce the SAME direction — so
    // projections of negated data are exactly the negated projections
    val neg = planted.map { case (id, l, v) => (id, l, v.map(x => -x)) }
    val a = project(planted).toMap
    val b = project(neg).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, p) => assert(b(id) == -p, s"vec $id: $p vs ${b(id)}") }
  }

  test("result is a pure function of the data: stable under repartitioning") {
    val a = project(planted, parts = 1).toSeq.sorted
    val b = project(planted, parts = 7).toSeq.sorted
    assert(a == b)
  }

  private val S = Similarity.PcaScale

  test("power iteration finds the dominant eigenvector of a diagonal matrix") {
    // diag(9, 4, 1): top eigenvector is e0 exactly; the iterate must
    // converge to (S, ~0, ~0)
    val mat = Array(
      Array(BigInt(9), BigInt(0), BigInt(0)),
      Array(BigInt(0), BigInt(4), BigInt(0)),
      Array(BigInt(0), BigInt(0), BigInt(1)))
    val v = Similarity.powerIterate(mat)
    assert(v(0) == BigInt(S))
    // components decay by (4/9)^iters and (1/9)^iters from S
    assert(v(1) < BigInt(S) / 1000, s"v1 = ${v(1)}")
    assert(v(2) < BigInt(S) / 100000, s"v2 = ${v(2)}")
  }

  test("power iteration finds a non-axis eigenvector exactly") {
    // [[2,1],[1,2]]: eigenvalues 3 (direction (1,1)) and 1; starting
    // from (S,S) — already the top eigenvector — every iterate is
    // (3S,3S) renormalized back to (S,S)
    val mat = Array(
      Array(BigInt(2), BigInt(1)),
      Array(BigInt(1), BigInt(2)))
    val v = Similarity.powerIterate(mat)
    assert(v.toSeq == Seq(BigInt(S), BigInt(S)))
  }

  test("sign pin: a dominant direction with negative lead flips whole") {
    // A = 10·uuᵀ/|u|² with u = (1,-3) ⟹ [[1,-3],[-3,9]], eigenvalues
    // {10, 0}. The all-ones start has NEGATIVE overlap with u
    // (u·(1,1) = -2), so raw iterates converge toward (-1,3)·S/3-ish —
    // the pin must flip the whole vector so the first component is
    // positive: v ≈ (S/3, -S), with the -S exact (it is the max-abs
    // component the renormalization pins)
    val mat = Array(
      Array(BigInt(1), BigInt(-3)),
      Array(BigInt(-3), BigInt(9)))
    val v = Similarity.powerIterate(mat)
    assert(v(1) == BigInt(-S), s"got ${v.toSeq}")
    assert(v(0) > 0, s"sign pin failed: ${v.toSeq}")
    assert((v(0) - BigInt(S) / 3).abs < BigInt(S / 1000), s"got ${v.toSeq}")
  }
}
