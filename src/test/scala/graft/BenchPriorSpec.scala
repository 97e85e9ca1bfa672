package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Pins for the reconciliation baseline parser: a silent parse bug
  * here would disable Bench's load-reconciliation pass without any
  * visible failure (it degrades to an empty prior), so both driver
  * artifact layouts and the failure modes are pinned. Pure JVM.
  */
class BenchPriorSpec extends AnyFunSuite {

  private def tmpDir(): java.io.File = {
    val d = Files.createTempDirectory("graft_prior").toFile
    d.deleteOnExit()
    d
  }
  private def write(dir: java.io.File, name: String, body: String): String = {
    val f = new java.io.File(dir, name)
    Files.write(f.toPath, body.getBytes("UTF-8"))
    f.getPath
  }

  test("raw contract line: top-level queries map") {
    val d = tmpDir()
    val p = write(d, "line.json",
      """{"metric":"total","value":10.0,"queries":{"q01":0.5,"q137":5.69},"sf":"x"}""")
    assert(Bench.priorQueries(Some(p), d) == Map("q01" -> 0.5, "q137" -> 5.69))
  }

  test("driver wrapper: queries under parsed") {
    val d = tmpDir()
    val p = write(d, "BENCH_r09.json",
      """{"n":9,"rc":0,"tail":"...","parsed":{"metric":"total","queries":{"q73":3.94}}}""")
    assert(Bench.priorQueries(None, d) == Map("q73" -> 3.94))
  }

  test("newest BENCH_r file wins (zero-padded round names sort correctly)") {
    val d = tmpDir()
    write(d, "BENCH_r09.json", """{"queries":{"q01":9.0}}""")
    write(d, "BENCH_r16.json", """{"queries":{"q01":16.0}}""")
    write(d, "OTHER.json", """{"queries":{"q01":99.0}}""")
    assert(Bench.priorQueries(None, d) == Map("q01" -> 16.0))
  }

  test("failure modes degrade to empty, never throw") {
    val d = tmpDir()
    assert(Bench.priorQueries(None, d).isEmpty) // no artifacts at all
    assert(Bench.priorQueries(Some("/nonexistent/x.json"), d).isEmpty)
    val bad = write(d, "BENCH_r01.json", "{not json")
    assert(Bench.priorQueries(Some(bad), d).isEmpty)
    val noQ = write(d, "BENCH_r02.json", """{"parsed":null,"queries":"nope"}""")
    assert(Bench.priorQueries(Some(noQ), d).isEmpty)
    // non-numeric entries are skipped, numeric kept
    val mixed = write(d, "BENCH_r03.json", """{"queries":{"q01":1.5,"q02":"-"}}""")
    assert(Bench.priorQueries(Some(mixed), d) == Map("q01" -> 1.5))
  }
}
