package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** q205 mixture-plan invariants: exact integer square roots at the
  * float-boundary cases, the epoch cap respected by every allocation,
  * at least one binding source pinned at the cap, and agreement with
  * a sequential BigInt reference on a randomized corpus.
  */
class MixturePlanSpec extends SparkSpec {

  test("weights are exact integer square roots, including perfect squares") {
    import spark.implicits._
    // k^2-1, k^2, k^2+1 straddle the float-sqrt boundary for several k
    val ns = Seq(1L, 2L, 3L, 4L, 8L, 9L, 10L, 99L, 100L, 101L,
      1048575L, 1048576L, 1048577L, 999999999999L, 1000000000000L)
    val docs = ns.zipWithIndex.map { case (n, i) =>
      (s"s$i", ("x " * n.min(5L).toInt).trim) // text only keys the frame
    }.toDF("source", "text")
    // bypass tokenization: feed the counts directly through the same
    // weight expression the operator uses, by planting n as n_tokens
    val perSrc = ns.zipWithIndex.map { case (n, i) => (s"s$i", n) }
      .toDF("source", "n_tokens")
    val s0 = floor(sqrt(col("n_tokens").cast("double"))).cast("long")
    val got = perSrc.withColumn("w",
        when((s0 + 1) * (s0 + 1) <= col("n_tokens"), s0 + 1)
          .when(s0 * s0 > col("n_tokens"), s0 - 1)
          .otherwise(s0))
      .as[(String, Long, Long)].collect().map { case (_, n, w) => (n, w) }
    for ((n, w) <- got) {
      assert(w * w <= n && (w + 1) * (w + 1) > n, s"isqrt($n) = $w")
    }
  }

  test("plan agrees with a sequential BigInt reference; invariants hold") {
    import spark.implicits._
    val rnd = new scala.util.Random(97)
    val docs = (1 to 400).map { i =>
      val src = s"s${i % 7}"
      (src, Seq.fill(1 + rnd.nextInt(40))("tok").mkString(" "))
    }.toDF("source", "text")
    val got = Curation.mixturePlanOf(docs)
      .as[(String, Long, Long, Long, Long, Long, Boolean)].collect()

    // sequential reference
    val counts = (got.map(r => r._1 -> r._2)).toMap
    def isqrt(n: Long): Long = {
      var x = math.sqrt(n.toDouble).toLong
      while (x * x > n) x -= 1
      while ((x + 1) * (x + 1) <= n) x += 1
      x
    }
    val w = counts.map { case (s, n) => s -> isqrt(n) }
    val wSum = BigInt(w.values.sum)
    val e = Curation.MixtureEpochCap
    val tBudget = counts.map { case (s, n) =>
      (BigInt(n) * e * wSum / w(s)).toLong
    }.min
    for ((src, n, wt, tb, alloc, ep, binding) <- got) {
      assert(wt == w(src), s"$src weight")
      assert(tb == tBudget, s"$src budget")
      assert(alloc == (BigInt(wt) * tBudget / wSum).toLong, s"$src alloc")
      assert(ep == (BigInt(alloc) * 1000000 / n).toLong, s"$src epochs")
      assert(ep <= e * 1000000, s"$src exceeds the epoch cap")
      assert(binding == (BigInt(n) * e * wSum / wt == tBudget), s"$src binding")
    }
    assert(got.exists(_._7), "no binding source")
    // the binding source sits AT the cap modulo the two floors
    val bind = got.filter(_._7).head
    assert(bind._6 >= e * 1000000 - 2, s"binding source epochs ${bind._6}")
  }
}
