package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.DataFrame

/** Truncation (prefix) duplicates (q109). The driver hash-matches the
  * binding; these fixtures pin the detection semantics — token-boundary
  * strictness, the sorted-adjacency completeness argument, and the
  * MinPrefixTokens floor.
  */
class PrefixDupSpec extends SparkSpec {

  private val base = (1 to 16).map("tok" + _).mkString(" ") // exactly the floor

  private def run(rows: Seq[(Long, String)]): Set[Long] = {
    import spark.implicits._
    val df: DataFrame = rows.map { case (id, t) => (id, "s", t) }
      .toDF("doc_id", "source", "text")
    Dedup.truncationDups(df).collect().map(_.getAs[Long]("doc_id")).toSet
  }

  test("a strict token-prefix flags; char-glued and equal texts do not") {
    val got = run(Seq(
      (1L, base),                      // prefix of 2 -> flagged
      (2L, base + " more tokens here"),
      (3L, base + "glued suffix"),     // 3 starts with base's chars GLUED:
                                       // not a token boundary, 3 is no
                                       // prefix of anything -> clean
      (4L, base + " more tokens here"))) // exact dup of 2: equal, not strict
    assert(got == Set(1L))
  }

  test("adjacency survives a char-glued text sorting between prefix and extension") {
    // sort order: base < base+" y..." < base+"x..." because space sorts
    // below letters — the successor of a prefixed doc is always a
    // token-boundary extension when one exists
    val got = run(Seq(
      (1L, base),
      (2L, base + "x glued"),
      (3L, base + " y boundary")))
    assert(got == Set(1L))
  }

  test("transitive chain: every non-maximal doc flags") {
    val got = run(Seq(
      (1L, base),
      (2L, base + " mid extension"),
      (3L, base + " mid extension and more")))
    assert(got == Set(1L, 2L))
  }

  test("docs under the MinPrefixTokens floor are never flagged") {
    val shortBase = (1 to 15).map("tok" + _).mkString(" ") // one under floor
    val got = run(Seq(
      (1L, shortBase),
      (2L, shortBase + " extension")))
    assert(got.isEmpty)
  }

  test("all copies of a duplicated prefix text flag, by content") {
    val got = run(Seq(
      (1L, base),
      (2L, base), // identical content — both rows inherit the flag
      (3L, base + " longer")))
    assert(got == Set(1L, 2L))
  }

  test("randomized differential vs a brute-force O(n^2) prefix check") {
    val rng = new scala.util.Random(47)
    val vocab = Vector("a", "b", "c") // tiny vocab forces shared prefixes
    for (trial <- 1 to 3) {
      val bases = (1 to 25).map { i =>
        val len = 16 + rng.nextInt(10)
        (i.toLong, (1 to len).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" "))
      }
      // plant explicit truncations of a few docs
      val planted = bases.filter(_._1 % 5 == 0).map { case (id, t) =>
        val toks = t.split(" ")
        (id + 100L, toks.take(16 + rng.nextInt(toks.length - 15)).mkString(" "))
      }
      val all = bases ++ planted
      val texts = all.map(_._2).distinct
      val prefixes = texts.filter(a =>
        texts.exists(b => b.length > a.length && b.startsWith(a + " "))).toSet
      val expect = all.filter(r => prefixes(r._2)).map(_._1).toSet
      assert(run(all) == expect, s"trial $trial diverged")
    }
  }

  test("q109 binding flags every planted half-length truncation of long docs") {
    val d = "/root/testdata/sf0.001"
    val flagged = Dedup.q109TruncationDups(spark, d)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // planted ids whose halves are >= the floor must all be caught
    // (their full doc extends them at a token boundary by construction);
    // the binding's id shift is max(doc_id)+1, measured from the fixture
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, d)
    val shift = docs.agg(max(col("doc_id"))).head().getAs[Long](0) + 1L
    val expectPlanted = docs
      .filter(col("doc_id") % 13 === 0)
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), x => x =!= "")).as("n"))
      .collect()
      .filter(r => r.getAs[Int]("n") / 2 >= Dedup.MinPrefixTokens)
      .map(r => r.getAs[Long]("doc_id") + shift).toSet
    assert(expectPlanted.nonEmpty)
    assert(expectPlanted.subsetOf(flagged))
  }
}
