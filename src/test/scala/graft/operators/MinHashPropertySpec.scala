package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The statistical law MinHash exists for (Broder '97): the fraction of
  * agreeing signature slots is an unbiased estimator of the exact
  * shingle Jaccard, stderr sqrt(J(1-J)/k). Pure JVM — no Spark session
  * — because the law is about the signature function itself; the
  * distributed plumbing is pinned by ScaleSpec/CORRECTNESS. Documents
  * are generated at controlled mutation rates so the law is exercised
  * across the similarity range, with a fixed seed for determinism.
  */
class MinHashPropertySpec extends AnyFunSuite {

  private val vocab = ('a' to 'z').map(c => s"$c$c$c")

  private def doc(rnd: scala.util.Random, n: Int): Array[String] =
    Array.fill(n)(vocab(rnd.nextInt(vocab.length)))

  private def mutate(rnd: scala.util.Random, d: Array[String], rate: Double): Array[String] =
    d.map(w => if (rnd.nextDouble() < rate) vocab(rnd.nextInt(vocab.length)) else w)

  private def exactJaccard(a: String, b: String): Double = {
    val (sa, sb) = (Dedup.shingles(a).toSet, Dedup.shingles(b).toSet)
    sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
  }

  private def signatureAgreement(a: String, b: String): Double = {
    val (za, zb) = (Dedup.minhashSignature(Dedup.shingles(a)),
      Dedup.minhashSignature(Dedup.shingles(b)))
    za.zip(zb).count { case (x, y) => x == y }.toDouble / za.length
  }

  test("signature agreement estimates exact shingle Jaccard across the similarity range") {
    val rnd = new scala.util.Random(7)
    // k = 64 -> stderr <= 1/(2*sqrt(64)) = 0.0625; 4 sigma bound = 0.25,
    // and the averaged error over all pairs must be far tighter
    val errors = for {
      rate <- Seq(0.0, 0.05, 0.2, 0.5, 1.0)
      _ <- 1 to 4
    } yield {
      val a = doc(rnd, 60).mkString(" ")
      val b = mutate(rnd, a.split(" "), rate).mkString(" ")
      val (j, est) = (exactJaccard(a, b), signatureAgreement(a, b))
      assert(math.abs(est - j) <= 0.25, s"rate=$rate j=$j est=$est")
      math.abs(est - j)
    }
    assert(errors.sum / errors.size <= 0.08,
      s"mean |est - J| = ${errors.sum / errors.size}")
  }

  test("identical docs agree on every slot; disjoint docs on (almost) none") {
    val a = vocab.take(13).mkString(" ")
    val b = vocab.drop(13).mkString(" ")
    assert(signatureAgreement(a, a) == 1.0)
    assert(signatureAgreement(a, b) <= 0.1, signatureAgreement(a, b))
  }
}
