package graft.operators

import graft.mr.SparkSpec
import graft.functions.BottomKDistinct

/** Laws of the KMV bottom-k sketch (q172/q173): the set-algebra merge
  * law, insert-time dedup, estimate accuracy on planted cardinalities,
  * and the sketch-space Jaccard estimator against exact overlap —
  * checked both on the bare aggregator and through the distributed
  * operators.
  */
class KmvSpec extends SparkSpec {

  private def agg = new BottomKDistinct[Long](8, identity)(
    org.apache.spark.sql.Encoders.product[Tuple1[Seq[Long]]]
      .asInstanceOf[org.apache.spark.sql.Encoder[Seq[Long]]])

  // plain-Scala reference: sorted distinct take k
  private def ref(xs: Seq[Long], k: Int = 8): Seq[Long] =
    xs.distinct.sorted.take(k)

  test("aggregator equals sorted-distinct-take-k on randomized inputs") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val xs = Seq.fill(rnd.nextInt(60))(rnd.nextLong(40).abs)
      val got = xs.foldLeft(agg.zero)(agg.reduce)
      assert(got == ref(xs), s"input $xs")
    }
  }

  test("merge law: merge(sketch(A), sketch(B)) == sketch(A ++ B)") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 50) {
      val a = Seq.fill(rnd.nextInt(50))(rnd.nextLong(60).abs)
      val b = Seq.fill(rnd.nextInt(50))(rnd.nextLong(60).abs)
      val skA = a.foldLeft(agg.zero)(agg.reduce)
      val skB = b.foldLeft(agg.zero)(agg.reduce)
      assert(agg.merge(skA, skB) == ref(a ++ b))
      // commutative
      assert(agg.merge(skB, skA) == agg.merge(skA, skB))
    }
  }

  test("duplicates never change the sketch") {
    val xs = Seq(5L, 3L, 9L, 3L, 5L, 5L, 1L)
    val once = xs.distinct.foldLeft(agg.zero)(agg.reduce)
    val many = (xs ++ xs ++ xs).foldLeft(agg.zero)(agg.reduce)
    assert(once == many)
  }

  test("distinct estimate lands within 4 stderr on a planted cardinality") {
    import spark.implicits._
    // 20k docs, each one distinct "trigram" (3 words) -> n_distinct 20000
    val n = 20000
    val docs = (0 until n).map(i => ("s0", s"a$i b$i c$i")).toDF("source", "text")
    val row = Corpus.kmvDistinctOf(docs).collect().head
    val exact = row.getLong(1)
    val est = row.getLong(4)
    assert(exact == n.toLong)
    // stderr ~ 1/sqrt(k-2) = 12.7% at k=64; 4 sigma = 51%
    val rel = math.abs(est.toDouble - exact.toDouble) / exact.toDouble
    assert(rel < 0.51, s"est $est vs exact $exact (rel $rel)")
  }

  test("below k distinct keys the estimate is exact by construction") {
    import spark.implicits._
    val docs = (0 until 40).map(i => ("s0", s"a$i b$i c$i")).toDF("source", "text")
    val row = Corpus.kmvDistinctOf(docs).collect().head
    assert(row.getLong(2) == 40L) // n_kmv
    assert(row.getLong(4) == 40L) // est == exact
    assert(row.getLong(1) == 40L)
  }

  test("sketch-space Jaccard tracks exact overlap on planted half-overlap") {
    import spark.implicits._
    // sources share 1000 of their 2000 grams -> J = 1000/3000 = 1/3
    val shared = (0 until 1000).map(i => s"sh$i sh$i sh$i")
    val onlyA = (0 until 1000).map(i => s"a$i a$i a$i")
    val onlyB = (0 until 1000).map(i => s"b$i b$i b$i")
    val docs = (shared ++ onlyA).map(("sA", _)) ++ (shared ++ onlyB).map(("sB", _))
    val row = Corpus.kmvOverlapOf(docs.toDF("source", "text"), exactRider = true)
      .collect().head
    val jExact = row.getDouble(3)
    val jEst = row.getDouble(6)
    assert(math.abs(jExact - 1.0 / 3.0) < 1e-9)
    // k=64 member-counting stderr ~ sqrt(J(1-J)/k) ~ 0.06; 4 sigma
    assert(math.abs(jEst - jExact) < 0.24, s"est $jEst vs exact $jExact")
  }

  test("A-not-B estimate tracks the planted difference; exact below k") {
    import spark.implicits._
    // sources share 1000 grams; A has 1000 extra, B has 500 extra
    // -> |A\B| = 1000, |B\A| = 500, |A∪B| = 2500
    val shared = (0 until 1000).map(i => s"sh$i sh$i sh$i")
    val onlyA = (0 until 1000).map(i => s"a$i a$i a$i")
    val onlyB = (0 until 500).map(i => s"b$i b$i b$i")
    val docs = (shared ++ onlyA).map(("sA", _)) ++ (shared ++ onlyB).map(("sB", _))
    val row = Corpus.kmvDifferenceOf(docs.toDF("source", "text")).collect().head
    val estAB = row.getLong(5).toDouble
    val estBA = row.getLong(6).toDouble
    // union stderr ~13% at k=64 and the fraction adds binomial noise;
    // 4 sigma of the combined ~ 60% relative
    assert(math.abs(estAB - 1000.0) / 1000.0 < 0.6, s"A\\B est $estAB")
    assert(math.abs(estBA - 500.0) / 500.0 < 0.6, s"B\\A est $estBA")

    // below k union keys everything is exact by construction
    val tiny = ((0 until 20).map(i => s"x$i x$i x$i") ++ Seq("c0 c0 c0")).map(("tA", _)) ++
      ((0 until 10).map(i => s"y$i y$i y$i") ++ Seq("c0 c0 c0")).map(("tB", _))
    val t = Corpus.kmvDifferenceOf(tiny.toDF("source", "text")).collect().head
    assert(t.getLong(2) == 31L) // merged = 20 + 10 + 1 shared
    assert(t.getLong(5) == 20L && t.getLong(6) == 10L)
  }

  test("estimate-only output drops the rider columns but not the estimates") {
    import spark.implicits._
    val docs = (0 until 50).map(i => ("s" + i % 2, s"x$i y$i z$i")).toDF("source", "text")
    val lean = Corpus.kmvOverlapOf(docs, exactRider = false)
    assert(lean.columns.toSeq ==
      Seq("src_a", "src_b", "n_merged", "n_both", "est_jaccard"))
    val full = Corpus.kmvOverlapOf(docs, exactRider = true)
    val l = lean.select("src_a", "src_b", "n_merged", "n_both", "est_jaccard")
      .collect().map(_.toString).sorted.toSeq
    val f = full.select("src_a", "src_b", "n_merged", "n_both", "est_jaccard")
      .collect().map(_.toString).sorted.toSeq
    assert(l == f)
  }
}
