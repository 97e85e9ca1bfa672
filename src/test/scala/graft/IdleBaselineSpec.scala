package graft

import org.scalatest.funsuite.AnyFunSuite

/** The BASELINE_IDLE.json fold-integrity rules (r19 advice #4 +
  * verdict #6), pinned on the extracted pure helpers: context mismatch
  * rejects the whole table, per-entry git_head provenance (with
  * file-level fallback for pre-stamp entries) gates the min-fold for
  * regenerated queries, and --fold-stale is the explicit override.
  * No SparkSession needed — these are string/decision functions.
  */
class IdleBaselineSpec extends AnyFunSuite {

  private def table(fileHead: String, entries: (String, String)*): String = {
    val body = entries.map { case (n, e) => s"""    "$n": $e""" }.mkString(",\n")
    s"""{
       |  "sf_dir": "/root/testdata/sf0.1",
       |  "cpus": 32,
       |  "git_head": "$fileHead",
       |  "queries": {
       |$body
       |  }
       |}
       |""".stripMargin
  }

  private val stamped =
    """{"best_sec": 1.500, "passes_sec": [1.6, 1.5], "git_head": "aaa1111"}"""
  private val unstamped =
    """{"best_sec": 2.250, "passes_sec": [2.3, 2.25]}"""

  test("context check: a different sf_dir or cpu count rejects the table " +
    "wholesale (an sf0.1 best must never cap an sf10 table)") {
    val txt = table("aaa1111", "q01" -> stamped)
    assert(IdleBaseline.parsePrior(txt, "/root/testdata/sf0.1", 32).nonEmpty)
    assert(IdleBaseline.parsePrior(txt, "/tmp/sf10", 32).isEmpty, "sf_dir")
    assert(IdleBaseline.parsePrior(txt, "/root/testdata/sf0.1", 8).isEmpty, "cpus")
  }

  test("per-entry git_head provenance: stamped entries carry their own head, " +
    "pre-stamp entries fall back to the file-level head") {
    val txt = table("bbb2222", "q01" -> stamped, "q02" -> unstamped)
    val p = IdleBaseline.parsePrior(txt, "/root/testdata/sf0.1", 32).get
    assert(p.heads("q01") == "aaa1111", "stamped entry must keep its own head")
    assert(p.heads("q02") == "bbb2222", "unstamped entry must inherit the file head")
    assert(p.bests == Map("q01" -> 1.5, "q02" -> 2.25))
  }

  test("the stale-fold guard: a regenerated query's prior min folds only at " +
    "the SAME head; --fold-stale overrides; missing entries never fold") {
    val txt = table("bbb2222", "q01" -> stamped, "q02" -> unstamped)
    val p = IdleBaseline.parsePrior(txt, "/root/testdata/sf0.1", 32).get
    // same head as the entry stamp -> folds
    assert(IdleBaseline.foldablePrior(p, "q01", "aaa1111", foldStale = false)
      .contains(1.5))
    // head moved -> NOT folded (the advice #4 failure mode: a heavy that
    // legitimately got slower must not keep its old min alive)
    assert(IdleBaseline.foldablePrior(p, "q01", "ccc3333", foldStale = false).isEmpty)
    // explicit override restores the old behavior
    assert(IdleBaseline.foldablePrior(p, "q01", "ccc3333", foldStale = true)
      .contains(1.5))
    // fallback head gates the unstamped entry the same way
    assert(IdleBaseline.foldablePrior(p, "q02", "bbb2222", foldStale = false)
      .contains(2.25))
    assert(IdleBaseline.foldablePrior(p, "q02", "ddd4444", foldStale = false).isEmpty)
    // a query with no prior entry has nothing to fold
    assert(IdleBaseline.foldablePrior(p, "q99", "aaa1111", foldStale = false).isEmpty)
  }

  test("the outer queries key cannot leak in as a bogus entry (the 4-space " +
    "indent anchor)") {
    val txt = table("eee5555", "q01" -> stamped)
    val p = IdleBaseline.parsePrior(txt, "/root/testdata/sf0.1", 32).get
    assert(p.entries.keySet == Set("q01"))
  }
}
