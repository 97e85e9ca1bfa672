package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The SimHash law (Charikar STOC '02): hamming distance between
  * 64-bit fingerprints tracks profile similarity — near-identical
  * token multisets land within a small radius, unrelated ones near the
  * 32-bit random baseline. Pure JVM, like MinHashPropertySpec: the law
  * is about the fingerprint function; distributed plumbing is pinned
  * elsewhere.
  */
class SimHashPropertySpec extends AnyFunSuite {

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private val vocab = ('a' to 'z').map(c => s"$c$c$c")

  test("one-word edits stay within a small hamming radius; unrelated texts near 32") {
    val rnd = new scala.util.Random(11)
    val dists = (1 to 10).map { _ =>
      val words = Array.fill(80)(vocab(rnd.nextInt(vocab.length)))
      val a = words.mkString(" ")
      val edited = words.clone()
      edited(rnd.nextInt(words.length)) = vocab(rnd.nextInt(vocab.length))
      val b = edited.mkString(" ")
      hamming(Dedup.simhash64(a), Dedup.simhash64(b))
    }
    // a 1-of-80 token change flips few weighted bit-votes
    assert(dists.forall(_ <= 16), dists)
    assert(dists.sum.toDouble / dists.size <= 8.0, dists)

    val unrelated = (1 to 10).map { _ =>
      val a = Array.fill(80)(vocab(rnd.nextInt(13))).mkString(" ")
      val b = Array.fill(80)(vocab(13 + rnd.nextInt(13))).mkString(" ")
      hamming(Dedup.simhash64(a), Dedup.simhash64(b))
    }
    // disjoint vocabularies: fingerprints are independent 64-bit draws,
    // expected hamming 32, stddev 4 — allow 4 sigma
    assert(unrelated.forall(d => d >= 16 && d <= 48), unrelated)
  }

  test("fingerprint is deterministic and word-order-insensitive at the profile level") {
    val a = "alpha beta gamma delta epsilon"
    assert(Dedup.simhash64(a) == Dedup.simhash64(a))
    // simhash is a bag-of-tokens profile: permuting tokens preserves it
    assert(Dedup.simhash64(a) == Dedup.simhash64("epsilon delta gamma beta alpha"))
  }
}
