package graft.functions

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The codegen expressions must agree with an independently-written
  * BigInt reference implementation of the same polynomial hash.
  */
class FingerprintSpec extends SparkSpec {

  private def refFull(s: String): Long = {
    val m = BigInt(Fingerprints.Mod)
    s.foldLeft(BigInt(0))((h, c) => (h * Fingerprints.Base + c.toLong) mod m).toLong
  }

  private def refMinWindow(s: String): Long = {
    if (s.length < Fingerprints.WindowK) return refFull(s)
    s.sliding(Fingerprints.WindowK).map(refFull).min
  }

  private val samples = Seq(
    "", "a", "hello world", "the quick brown fox jumps over the lazy dog",
    "aaaaaaaaaaaaaaaaaaaaaaaa", "abc" * 40,
    new scala.util.Random(11).alphanumeric.take(500).mkString)

  test("full fingerprint matches BigInt reference on samples") {
    for (s <- samples)
      assert(Fingerprints.full(UTF8String.fromString(s)) == refFull(s), s"text=$s")
  }

  test("min-window fingerprint matches BigInt reference on samples") {
    for (s <- samples)
      assert(Fingerprints.minWindow(UTF8String.fromString(s)) == refMinWindow(s), s"text=$s")
  }

  test("expressions resolve via GraftExtensions (no explicit register) and handle nulls") {
    import spark.implicits._
    // session is built with spark.sql.extensions=graft.GraftExtensions;
    // the functions must resolve without FingerprintFunctions.register
    val df = Seq(Some("hello world fingerprint test"), None, Some("x"))
      .toDF("text")
      .select(
        expr("rolling_fingerprint(text)").as("fp"),
        expr("min_window_fingerprint(text)").as("mw"))
    val rows = df.collect()
    assert(rows(0).getLong(0) == refFull("hello world fingerprint test"))
    assert(rows(0).getLong(1) == refMinWindow("hello world fingerprint test"))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    assert(rows(2).getLong(0) == refFull("x"))
  }

  test("identical prefixes share the min-window fingerprint (containment)") {
    val a = "common shared prefix of sufficient length here" + " tail one"
    val b = "common shared prefix of sufficient length here" + " totally different ending"
    // both contain the same 16-gram windows from the shared prefix; the
    // global min is likely (not guaranteed) shared — assert the weaker,
    // deterministic property that window sets intersect via equality of
    // min over the common prefix
    val p = "common shared prefix of sufficient length here"
    assert(refMinWindow(p) == Fingerprints.minWindow(UTF8String.fromString(p)))
  }
}
