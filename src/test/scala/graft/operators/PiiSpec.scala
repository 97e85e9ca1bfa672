package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** PII redaction surface. The driver corpus contains no PII-shaped
  * strings (a driver oracle would be vacuous), so the contract is
  * pinned here on planted fixtures: each class redacts, the
  * email -> IPv4 -> phone order prevents double-redaction, and counts
  * agree with what redaction actually replaced.
  */
class PiiSpec extends SparkSpec {

  private def redactOne(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(Pii.redact(col("t"))).head().getString(0)
  }

  test("redacts emails, IPv4s, and phone shapes to typed tokens") {
    assert(redactOne("contact bob.smith+x@example.co.uk today")
      == "contact <EMAIL> today")
    assert(redactOne("host 192.168.001.1 down") == "host <IP> down")
    assert(redactOne("call +1-555-867-5309 now") == "call <PHONE> now")
    assert(redactOne("call (044) 123 45 67 now") == "call <PHONE> now")
    assert(redactOne("call 5551234567 now") == "call <PHONE> now")
  }

  test("ordering: an address inside an email is redacted once, as email") {
    // the host part looks IPv4-ish; email rule must consume it first
    assert(redactOne("x user@10.0.0.12.example.com y") == "x <EMAIL> y")
    // a bare IPv4 must become <IP>, not a half-eaten <PHONE>
    assert(redactOne("ping 10.0.0.12 ok") == "ping <IP> ok")
  }

  test("boundaries: digit runs inside longer tokens are not phones/IPs") {
    assert(redactOne("version 1.2.3.4.5 unchanged") == "version 1.2.3.4.5 unchanged")
    assert(redactOne("id 123456789012345678 unchanged")
      == "id 123456789012345678 unchanged")
  }

  test("clean text is unchanged and counts are zero") {
    val s = "the quick brown fox jumps over the lazy dog"
    assert(redactOne(s) == s)
    import spark.implicits._
    val (e, i, p) = Pii.counts(col("t"))
    val r = Seq(s).toDF("t").select(e.as("e"), i.as("i"), p.as("p")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((0L, 0L, 0L)))
  }

  test("counts match planted occurrences per class") {
    import spark.implicits._
    val text = "a@b.com and c@d.org from 10.0.0.1 call 555-123-4567"
    val (e, i, p) = Pii.counts(col("t"))
    val r = Seq(text).toDF("t").select(e.as("e"), i.as("i"), p.as("p")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 1L, 1L)))
    assert(redactOne(text) == "<EMAIL> and <EMAIL> from <IP> call <PHONE>")
  }
}
