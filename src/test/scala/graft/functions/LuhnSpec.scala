package graft.functions

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The native Luhn expression must agree with an independently-written
  * reference (digits reversed, alternate doubling via map) on known
  * card numbers, and resolve through GraftExtensions in SQL.
  */
class LuhnSpec extends SparkSpec {

  private def refValid(s: String): Boolean =
    s.length >= 13 && s.length <= 19 && s.forall(_.isDigit) && {
      val sum = s.reverse.zipWithIndex.map { case (c, idx) =>
        val d = c - '0'
        if (idx % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum
      sum % 10 == 0
    }

  // classic test PANs (public Luhn-valid test numbers) and mutations
  private val valid = Seq(
    "4539148803436467", "4111111111111111", "5500005555555559",
    "340000000000009" /* 15-digit amex shape */)
  private val invalid = Seq(
    "4539148803436468", // last digit off by one
    "4111111111111112",
    "123456789012", // 12 digits: under the PAN floor
    "12345678901234567890", // 20 digits: over the ceiling
    "4539a48803436467", // non-digit
    "")

  test("Luhn.isValid agrees with the reference on valid and mutated PANs") {
    for (s <- valid) {
      assert(refValid(s), s"reference disagrees on known-valid $s")
      assert(Luhn.isValid(UTF8String.fromString(s)), s)
    }
    for (s <- invalid) {
      assert(!refValid(s), s"reference disagrees on known-invalid $s")
      assert(!Luhn.isValid(UTF8String.fromString(s)), s)
    }
  }

  test("every check digit variant: exactly one of the ten is valid") {
    val payload = "453914880343646"
    val verdicts = (0 to 9).map(d => Luhn.isValid(UTF8String.fromString(payload + d)))
    assert(verdicts.count(identity) == 1)
    assert(verdicts(7)) // ...6467 is the classic valid PAN
  }

  test("property: Luhn detects EVERY single-digit error (the checksum's theorem)") {
    // for any valid PAN, changing any one digit to any other value
    // must invalidate it — the design guarantee of the mod-10 scheme
    val gen = org.scalacheck.Gen.choose(13, 19).flatMap { len =>
      org.scalacheck.Gen.listOfN(len - 1, org.scalacheck.Gen.choose(0, 9))
    }
    val payloads = (1L to 50L).map(i =>
      gen.pureApply(org.scalacheck.Gen.Parameters.default, org.scalacheck.rng.Seed(i)))
    payloads.foreach { ds =>
      val payload = ds.mkString
      // complete to a valid PAN: exactly one of the ten check digits works
      val full = (0 to 9).map(c => payload + c)
        .find(s => Luhn.isValid(UTF8String.fromString(s))).get
      for (pos <- full.indices; alt <- '0' to '9' if alt != full(pos)) {
        val mutated = full.updated(pos, alt)
        assert(!Luhn.isValid(UTF8String.fromString(mutated)),
          s"single-digit error undetected: $full -> $mutated")
      }
    }
  }

  test("luhn_valid resolves via GraftExtensions in SQL and handles nulls") {
    import spark.implicits._
    val rows = Seq(Some("4539148803436467"), Some("4539148803436468"), None)
      .toDF("pan")
      .select(expr("luhn_valid(pan)").as("ok"))
      .collect()
    assert(rows(0).getBoolean(0))
    assert(!rows(1).getBoolean(0))
    assert(rows(2).isNullAt(0))
  }
}
