package graft.operators

import graft.mr.SparkSpec

/** q206 boilerplate-detection invariants: the planted per-source
  * template is recovered exactly (interior grams at full df, boundary
  * grams unflagged), and the whole output agrees with a sequential
  * reference on a randomized corpus.
  */
class BoilerplateSpec extends SparkSpec {

  private def plantTokens(source: String): Seq[String] =
    Seq("copyright", source, "legal", "footer", "all", "rights",
      "reserved", "worldwide")

  test("unique-content docs: exactly the template's interior grams flag") {
    import spark.implicits._
    // every doc's own tokens are globally unique -> no natural gram
    // can repeat across docs; only the planted footer recurs
    val docs = (0 until 10).map { i =>
      ("s0", i.toLong, (0 until 20).map(j => s"u${i}_$j").mkString(" "))
    }.toDF("source", "doc_id", "text")
    val got = Curation.boilerplateOf(docs)
      .as[(String, Long, Long, Long, Long, String)].collect()
    assert(got.length == 1)
    val (_, nDocs, _, nBp, maxDf, topGram) = got.head
    assert(nDocs == 10 && maxDf == 10)
    // 8 plant tokens -> 6 interior 3-grams, each in all 10 docs
    assert(nBp == 6, s"expected the 6 interior plant grams, got $nBp")
    val interior = plantTokens("s0").sliding(3).map(_.mkString(" ")).toSeq
    assert(topGram == interior.max, s"top gram $topGram") // max-df ties -> max gram
  }

  test("agrees with a sequential reference on a randomized corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val vocab = (0 until 8).map(i => s"w$i") // tiny vocab -> natural repeats
    val rows = (0 until 120).map { i =>
      (s"s${i % 4}", i.toLong,
        (0 until 15 + rnd.nextInt(20)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = Curation.boilerplateOf(rows.toDF("source", "doc_id", "text"))
      .as[(String, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap

    // reference: per-source doc frequency over per-doc distinct grams
    val byDoc = rows.map { case (src, _, text) =>
      val toks = text.split(" ").filter(_.nonEmpty) ++ plantTokens(src)
      (src, toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet)
    }
    for ((src, perDoc) <- byDoc.groupBy(_._1)) {
      val n = perDoc.size
      val df = perDoc.flatMap(_._2).groupBy(identity).map { case (g, xs) => g -> xs.size }
      val bp = df.filter { case (_, c) => c * 10 >= n * Curation.BoilerplateDfTenths }
      val (gNDocs, gGrams, gBp, gMaxDf, gTop) =
        (got(src)._2, got(src)._3, got(src)._4, got(src)._5, got(src)._6)
      assert(gNDocs == n, s"$src n_docs")
      assert(gGrams == df.size, s"$src n_distinct_grams")
      assert(gBp == bp.size, s"$src n_boilerplate")
      assert(gMaxDf == df.values.max, s"$src max_df")
      val wantTop = bp.toSeq.map { case (g, c) => (c, g) }.max
      assert(gTop == wantTop._2, s"$src top_gram")
    }
  }
}
