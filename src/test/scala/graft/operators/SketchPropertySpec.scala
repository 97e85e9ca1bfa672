package graft.operators

import graft.mr.SparkSpec

/** Differential and statistical laws for the replayable sketch family
  * (q158 CMS / q159 HLL) over RANDOMIZED corpora — the property-spec
  * complement to the fixture specs: CmsReplaySpec/HllReplaySpec pin
  * hand-built cases; these drive many generated corpora through the
  * distributed build and check the laws that define each sketch,
  * including a from-scratch register reference written independently
  * of the engine's column expressions.
  */
class SketchPropertySpec extends SparkSpec {

  private val vocab = (0 until 400).map(i => s"w$i")

  private def corpus(seed: Int, docs: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    // zipfian-ish skew: low ids drawn much more often
    (0 until docs).map { _ =>
      Seq.fill(8)(vocab(
        math.min(vocab.length - 1,
          (math.pow(rnd.nextDouble(), 3) * vocab.length).toInt))).mkString(" ")
    }
  }

  test("CMS one-sided law holds on every token of randomized skewed corpora") {
    import spark.implicits._
    for (seed <- Seq(11, 23, 47)) {
      val df = corpus(seed, 120).map(t => Tuple1(t)).toDF("text")
      val all = Corpus.cmsFreqOf(spark, df, Int.MaxValue).collect()
      assert(all.nonEmpty)
      all.foreach { r =>
        assert(r.getLong(2) >= r.getLong(1),
          s"seed $seed tok ${r.getString(0)}: est ${r.getLong(2)} < exact ${r.getLong(1)}")
      }
    }
  }

  test("CMS rollup law: the total grain equals the one-group corpus grid") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(83)
    val docs = corpus(31, 150).map(t => (s"s${rnd.nextInt(4)}", t))
      .toDF("source", "text")
    val rollup = Corpus.cmsRollupOf(spark, docs)
    val total = rollup.filter(col("lvl") === 1L)
      .select(col("tok"), col("exact_cnt"), col("est_cnt"), col("over_err"))
      .collect().map(_.toString).sorted.toSeq
    val direct = Corpus.cmsRollupOf(spark, docs.withColumn("source", lit("one")))
      .filter(col("lvl") === 1L)
      .select(col("tok"), col("exact_cnt"), col("est_cnt"), col("over_err"))
      .collect().map(_.toString).sorted.toSeq
    assert(total.nonEmpty && total == direct)
    // the one-sided law holds at every grain
    Corpus.cmsRollupOf(spark, docs).collect().foreach { r =>
      assert(r.getLong(4) >= r.getLong(3), r.toString)
    }
  }

  /** Independent register reference: md5 via MessageDigest directly,
    * 60-bit key from the hex string, bucket/rho in plain Scala — no
    * shared code with the engine's Column expressions.
    */
  private def referenceRegisters(grams: Seq[(String, String)]): Map[(String, Long), Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val acc = collection.mutable.Map.empty[(String, Long), Long]
    grams.foreach { case (src, g) =>
      md.reset()
      val hex = md.digest(g.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      val x = java.lang.Long.parseLong(hex, 16)
      val bkt = x >>> 51
      val suffix = x & ((1L << 51) - 1)
      val rho =
        if (suffix == 0) 52L
        else 52L - (64 - java.lang.Long.numberOfLeadingZeros(suffix))
      val k = (src, bkt)
      acc.update(k, math.max(acc.getOrElse(k, 0L), rho))
    }
    acc.toMap
  }

  test("HLL registers match an independently-written reference on random corpora") {
    import spark.implicits._
    for (seed <- Seq(5, 19)) {
      val docs = corpus(seed, 100).zipWithIndex
        .map { case (t, i) => (s"s${i % 3}", t) }
      val got = Corpus.hllRegisters(docs.toDF("source", "text"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = referenceRegisters(docs.flatMap { case (src, t) =>
        val toks = t.split(" ").filter(_.nonEmpty)
        toks.sliding(3).filter(_.length == 3).map(g => (src, g.mkString(" ")))
      })
      assert(got == want, s"seed $seed: ${got.size} vs ${want.size} registers")
    }
  }
}
