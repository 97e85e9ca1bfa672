package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** [[Scoring]]: the exact half-bit logarithm primitive and the two
  * model-based quality operators built on it (bigram-LM perplexity,
  * Naive-Bayes classification). Classifier QUALITY is provable only on
  * a separable corpus, so these specs plant one (the synthetic driver
  * tables share one uniform vocabulary across classes by design — the
  * driver hash there checks determinism, not accuracy).
  */
class ScoringSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** doc_ids landing on the train / eval side of Scoring's md5 split. */
  private def idsFor(train: Boolean, n: Int, from: Long = 0L): Seq[Long] =
    Iterator.iterate(from)(_ + 1)
      .filter(id => (md5hex(id.toString).head < '8') == train)
      .take(n).toSeq

  test("halfBitsLog2 is exactly floor(2*log2(a/b)) across the long domain") {
    val rnd = new scala.util.Random(13)
    val pairs = Seq((1L, 1L), (2L, 1L), (3L, 2L), (3L, 1L),
      ((1L << 42) - 1, 1L), (1L << 42, 1L), ((1L << 41) + 1, 1L << 41),
      (1L << 59, 3L), ((1L << 59) - 1, (1L << 29) + 7)) ++
      Seq.fill(500) {
        val b = rnd.nextLong((1L << 41) - 1) + 1
        val a = b + rnd.nextLong((1L << 42) - b)
        (a, b)
      }
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        Scoring.halfBitsLog2(col("a"), col("b")).as("s2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (a, b) =>
      // ground truth in BigInt: floor(2*log2(a/b)) = max k with b^2*2^k <= a^2...
      // derived as e = bitlen(a/b floor) - 1 adjusted, then the half-bit
      val e = {
        val e0 = (BigInt(a) / BigInt(b)).bitLength - 1
        e0 // a/b >= 2^e0 by construction of bitLength on the floor quotient
      }
      assert((BigInt(b) << e) <= a && a < (BigInt(b) << (e + 1)))
      val expect = 2L * e + (if (BigInt(a) * a >= (BigInt(b) << e) * (BigInt(b) << e) * 2) 1 else 0)
      assert(got((a, b)) === expect, s"a=$a b=$b")
    }
  }

  test("NB classifies a separable planted corpus perfectly") {
    val trainIds = idsFor(train = true, 40)
    val evalIds = idsFor(train = false, 10)
    val mk = (ids: Seq[Long], off: Int) => ids.zipWithIndex.map { case (id, i) =>
      val cls = if ((i + off) % 2 == 0) "aa" else "bb"
      val text = if (cls == "aa") "apple ant axe apple ant" else "bird bat bog bird bat"
      (id, text, cls, "s0")
    }
    val docs = (mk(trainIds, 0) ++ mk(evalIds, 0))
      .toDF("doc_id", "text", "lang", "source")
    val pred = Scoring.nbPredict(docs, "lang").collect()
    assert(pred.length === evalIds.length)
    pred.foreach(r => assert(r.getString(1) === r.getString(2),
      s"doc ${r.getLong(0)} truth ${r.getString(1)} predicted ${r.getString(2)}"))
  }

  test("NB ties break to the lexicographically smaller class; token-less docs predict") {
    // two classes with IDENTICAL training evidence (same doc count, same
    // token profile) -> every class score ties -> predicted must be the
    // smaller class name, for scored and token-less docs alike
    val trainIds = idsFor(train = true, 4)
    val evalIds = idsFor(train = false, 2)
    val docs = (
      trainIds.zipWithIndex.map { case (id, i) =>
        (id, "same same text", if (i % 2 == 0) "zz" else "mm", "s0")
      } ++
        Seq((evalIds.head, "same text", "mm", "s0"),
          (evalIds(1), "", "zz", "s0")) // token-less eval doc
      ).toDF("doc_id", "text", "lang", "source")
    val pred = Scoring.nbPredict(docs, "lang")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(pred(evalIds.head) === "mm")
    assert(pred(evalIds(1)) === "mm") // prior-only doc still predicted
  }

  test("LM surprisal separates in-domain from out-of-domain held-out docs") {
    val trainIds = idsFor(train = true, 30)
    val evalIds = idsFor(train = false, 2)
    val trainDocs = trainIds.map(id => (id, "the cat sat on the mat", "en", "s0"))
    val evalDocs = Seq(
      (evalIds.head, "the cat sat on the mat", "en", "s0"), // in-domain
      (evalIds(1), "zebra quark vexing jumbled oryx", "en", "s0")) // all-OOV
    val scored = Scoring.lmScore((trainDocs ++ evalDocs)
      .toDF("doc_id", "text", "lang", "source"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("ppx_q")).toMap
    assert(scored(evalIds.head) < scored(evalIds(1)),
      s"in-domain ${scored(evalIds.head)} should beat OOV ${scored(evalIds(1))}")
  }

  test("LM drops sub-bigram docs and scores every bigram once per occurrence") {
    val trainIds = idsFor(train = true, 2)
    val evalIds = idsFor(train = false, 3)
    val docs = (
      trainIds.map(id => (id, "a b a b", "en", "s0")) ++
        Seq((evalIds.head, "a b a b a", "en", "s0"), // 4 bigrams
          (evalIds(1), "a", "en", "s0"), // 1 token -> no bigrams
          (evalIds(2), "", "en", "s0")) // empty -> no bigrams
      ).toDF("doc_id", "text", "lang", "source")
    val out = Scoring.lmScore(docs).collect()
    assert(out.map(_.getLong(0)).toSet === Set(evalIds.head))
    val r = out.head
    assert(r.getAs[Long]("n_bigrams") === 4L)
    // V=2 (tokens a,b); two identical train docs -> cx(a)=cx(b)=4,
    // cxy(a,b)=4, cxy(b,a)=2. eval bigrams: (a,b) x2 at
    // floor(2*log2((4+2)/(4+1))) = floor(2*log2 1.2) = 0 each;
    // (b,a) x2 at floor(2*log2((4+2)/(2+1))) = floor(2*log2 2) = 2 each
    assert(r.getAs[Long]("surprisal2") === 2L * 0 + 2L * 2)
  }
}
