package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential law for the q142 fixed-point pipeline: on random small
  * corpora, the distributed centroid/assignment arithmetic must equal a
  * plain-Scala reference implementing the same integer recurrence
  * (round-to-even quantize, truncating div, squared-L2 argmin with the
  * (dist, label) tie-break). Raw scalacheck generators with fixed seeds
  * (the scalatest bridge artifact isn't in the offline cache).
  */
class LabelCentroidPropertySpec extends SparkSpec {

  private val Dims = 4

  private val rowGen = for {
    label <- Gen.choose(0L, 3L)
    vec <- Gen.listOfN(Dims, Gen.choose(-2000, 2000).map(_ / 1000.0f))
  } yield (label, vec.toArray)

  private val corpusGen = Gen.listOfN(25, rowGen)

  /** Reference: same arithmetic, plain Scala. Quantization is HALF AWAY
    * FROM ZERO (the `round(x*1e6)` contract) written independently of
    * the engine kernel: round the magnitude half-up, restore the sign.
    */
  private def ref(rows: Seq[(Long, Long, Array[Float])]): Map[(Long, Long), Long] = {
    def quant(v: Array[Float]): Array[Long] =
      v.map { x =>
        val m = Math.round(Math.abs(x.toDouble) * 1e6)
        if (x < 0) -m else m
      }
    val q = rows.map { case (id, l, v) => (id, l, quant(v)) }
    val cents = q.groupBy(_._2).map { case (l, members) =>
      val n = members.size.toLong
      val sums = (0 until Dims).map(i => members.map(_._3(i)).sum)
      l -> sums.map(s => s / n).toArray // Long / Long truncates, = Spark div
    }
    val assigned = q.map { case (_, l, v) =>
      val best = cents.toSeq.map { case (cl, c) =>
        val d = (0 until Dims).map(i => (v(i) - c(i)) * (v(i) - c(i))).sum
        (d, cl)
      }.min // (dist, label) lexicographic = the engine's struct-min
      (l, best._2)
    }
    assigned.groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  private def engine(rows: Seq[(Long, Long, Array[Float])]): Map[(Long, Long), Long] = {
    import spark.implicits._
    graft.functions.FingerprintFunctions.register(spark)
    val emb = rows.toDF("vec_id", "label", "embedding")
    val q = emb.select(col("vec_id"), col("label"),
      call_function("fixed_quantize", col("embedding")).as("q"))
    val cent = q.groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        array((0 until Dims).map(i => sum(col("q")(i))): _*).as("sums"))
      .select(col("label").as("clabel"), expr("transform(sums, s -> s div n)").as("c"))
      .withColumn("cn", call_function("fixed_dot", col("c"), col("c")))
    q.withColumn("qn", call_function("fixed_dot", col("q"), col("q")))
      .crossJoin(broadcast(cent))
      .select(col("vec_id"), col("label"),
        struct((col("qn") - lit(2L) * call_function("fixed_dot", col("q"), col("c")) + col("cn")).as("dist"),
          col("clabel")).as("dc"))
      .groupBy(col("vec_id"), col("label"))
      .agg(min(col("dc")).as("best"))
      .groupBy(col("label"), col("best.clabel").as("pred"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("confusion matrix equals the integer reference on 12 random corpora") {
    (1 to 12).foreach { i =>
      val rows = corpusGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
        .zipWithIndex.map { case ((l, v), id) => (id.toLong, l, v) }
      val got = engine(rows)
      val want = ref(rows)
      assert(got == want, s"seed $i: engine $got != reference $want")
    }
  }

  test("negative-heavy vectors: truncation direction agrees everywhere") {
    val negGen = Gen.listOfN(20, for {
      label <- Gen.choose(0L, 2L)
      vec <- Gen.listOfN(Dims, Gen.choose(-3000, -1).map(_ / 1000.0f))
    } yield (label, vec.toArray))
    (1 to 4).foreach { i =>
      val rows = negGen.pureApply(Gen.Parameters.default, Seed(100L + i))
        .zipWithIndex.map { case ((l, v), id) => (id.toLong, l, v) }
      assert(engine(rows) == ref(rows), s"negative corpus seed $i diverged")
    }
  }
}
