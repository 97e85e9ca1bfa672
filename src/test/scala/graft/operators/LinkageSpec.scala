package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pigeonhole-blocked edit-distance join (q84). The driver hash-matches
  * a brute-force cross-join oracle at sf0.01; these fixtures pin the
  * blocking scheme's EXACTNESS — the whole point of PassJoin-style
  * segment blocking is that it prunes candidates without losing a
  * single true match — including the short-string fallback bucket and
  * a randomized differential test against the unblocked join.
  */
class LinkageSpec extends SparkSpec {

  private def frame(rows: Seq[(Long, String)], id: String, nm: String): DataFrame = {
    import spark.implicits._
    rows.toDF(id, nm)
  }

  private def bruteForce(probes: Seq[(Long, String)], master: Seq[(Long, String)],
      tau: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for {
      (pid, p) <- probes.toSet[(Long, String)]
      (mid, m) <- master
      dist = lev(p, m)
      if dist <= tau
    } yield (pid, mid, dist)
  }

  private def run(probes: Seq[(Long, String)], master: Seq[(Long, String)],
      tau: Int): Set[(Long, Long, Int)] =
    Linkage.editDistanceJoin(
      frame(probes, "pid", "pname"), frame(master, "mid", "mname"), tau)
      .collect()
      .map(r => (r.getAs[Long]("pid"), r.getAs[Long]("mid"), r.getAs[Int]("dist")))
      .toSet

  test("deletions, substitutions, and transpositions within tau are found") {
    val master = Seq(
      1L -> "johnathan smith", 2L -> "maria garcia", 3L -> "wei chen")
    val probes = Seq(
      10L -> "jonathan smith",  // 1 deletion
      11L -> "maria garcai",    // transposition = 2 edits
      12L -> "wei chen",        // exact
      13L -> "zzzzzzzz")        // no match
    val got = run(probes, master, tau = 2)
    assert(got == Set((10L, 1L, 1), (11L, 2L, 2), (12L, 3L, 0)))
  }

  test("short strings (below tau+1 chars) use the fallback bucket exactly") {
    val master = Seq(1L -> "ab", 2L -> "a", 3L -> "", 4L -> "abcd")
    val probes = Seq(10L -> "b", 11L -> "", 12L -> "ab")
    val got = run(probes, master, tau = 2)
    assert(got == bruteForce(probes, master, tau = 2))
  }

  test("differential vs brute force on a randomized corpus (fixed seed)") {
    val rng = new scala.util.Random(42)
    val alphabet = "abc" // tiny alphabet: collisions and near-misses abound
    def word(n: Int): String = Seq.fill(n)(alphabet(rng.nextInt(alphabet.length))).mkString
    val master = (1L to 60L).map(i => i -> word(4 + rng.nextInt(6)))
    val probes = (101L to 130L).map(i => i -> word(4 + rng.nextInt(6)))
    for (tau <- Seq(1, 2)) {
      assert(run(probes, master, tau) == bruteForce(probes, master, tau),
        s"blocked join diverged from brute force at tau=$tau")
    }
  }

  test("q84 binding returns planted matches with exact distances") {
    val dir = "/root/testdata/sf0.001"
    val got = Linkage.q84FuzzyJoin(spark, dir)
    val rows = got.collect()
    assert(rows.nonEmpty)
    // every verbatim probe (custkey % 3 == 2) self-matches at dist 0
    val self = rows.filter(r => r.getAs[Long]("probe_id") == r.getAs[Long]("match_custkey"))
    assert(self.forall { r =>
      val k = r.getAs[Long]("probe_id")
      val d = r.getAs[Long]("dist")
      if (k % 3 == 2) d == 0L else d == 1L // one deletion or substitution
    })
    assert(self.length == 25) // all probes recover their source row
  }

  test("probe-side broadcast keeps the master un-shuffled") {
    val plan = Linkage.q84FuzzyJoin(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected candidate generation as a broadcast hash join, got:\n$plan")
  }
}
