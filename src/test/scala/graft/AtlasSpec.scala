package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** ATLAS.md freshness pin (the r17 advice: a generated-but-unpinned
  * doc goes stale silently). The committed atlas must equal a fresh
  * regeneration from the live registries — a registry change without
  * `sbt "runMain graft.Atlas"` fails here, with the fix in the
  * message. Pure JVM; sbt test runs with cwd = repo root, where the
  * source tree and ATLAS.md live.
  */
class AtlasSpec extends AnyFunSuite {
  test("committed ATLAS.md matches a fresh regeneration") {
    val committed = Paths.get("ATLAS.md")
    assume(Files.isRegularFile(committed) &&
      Files.isDirectory(Paths.get("src/main/scala")))
    val want = Atlas.generate()
    val got = new String(Files.readAllBytes(committed), "UTF-8")
    assert(got == want,
      "ATLAS.md is stale — regenerate with: sbt \"runMain graft.Atlas\"")
  }

  test("the atlas covers every registered query exactly once") {
    val rows = Atlas.generate().linesIterator
      .filter(_.matches("""\| q\d.*""")) // data rows, not the "| query |" header
      .map(_.split('|')(1).trim).toSeq
    assert(rows == SparkEntry.queries.keys.toSeq.sorted)
  }
}
