package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout (q122). The driver hash-matches the interleave
  * arithmetic; these pin the PROPERTIES that make z-ordering worth
  * doing: bit-exact interleave, quadrant monotonicity, and the actual
  * layout claim — per-file bounding boxes tighten in BOTH dimensions
  * vs a single-key sort.
  */
class ZOrderSpec extends SparkSpec {

  private def refZ(x: Long, y: Long): Long = {
    val mask = (1L << Layout.ZBits) - 1
    var z = 0L
    var i = 0
    while (i < Layout.ZBits) {
      z |= ((x & mask) >> i & 1L) << (2 * i)
      z |= ((y & mask) >> i & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("column interleave is bit-exact vs the reference implementation") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map(_ =>
      (rnd.nextLong().abs % (1L << Layout.ZBits), rnd.nextLong().abs % (1L << Layout.ZBits)))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) => assert(z == refZ(x, y), s"($x,$y)") }
  }

  test("quadrant monotonicity: halving both keys halves the z prefix") {
    // top bit of x lands at z-bit 2*(ZBits-1); top bit of y one higher —
    // so the two top bits of z ARE the quadrant of the (x, y) plane
    val top = Layout.ZBits - 1
    assert(refZ(1L << top, 0) == 1L << (2 * top))
    assert(refZ(0, 1L << top) == 1L << (2 * top + 1))
    assert(refZ(1L << top, 1L << top) == (3L << (2 * top)))
  }

  test("z-clustered files bound BOTH dimensions tighter than a single-key sort") {
    import spark.implicits._
    // uniform 2-D grid: under an x-sort each chunk spans ALL of y;
    // under z-order each chunk is a near-square patch of the plane
    val rows = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val df = rows.toDF("x", "y")
    val parts = 16
    def meanYSpan(sorted: org.apache.spark.sql.DataFrame): Double = {
      val spans = sorted.rdd.mapPartitions { it =>
        val ys = it.map(_.getAs[Long]("y")).toSeq
        if (ys.isEmpty) Iterator.empty
        else Iterator.single((ys.max - ys.min).toDouble)
      }.collect()
      spans.sum / spans.length
    }
    val bySingleKey = df.repartitionByRange(parts, col("x")).sortWithinPartitions(col("x"))
    val byZ = Layout.zCluster(df, "x", "y", parts)
    val single = meanYSpan(bySingleKey)
    val z = meanYSpan(byZ)
    // x-sorted chunks span essentially all of y (~63); z-ordered
    // chunks are spatial patches — at least 3x tighter here
    assert(single > 50.0, s"x-sort y-span $single")
    assert(z * 3 < single, s"z-order y-span $z vs x-sort $single")
  }
}
