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

  test("dates, ranges, and version strings survive the phone rule") {
    // ISO date, neither whole nor as a "08-12" suffix match
    assert(redactOne("shipped on 2026-08-12 intact") == "shipped on 2026-08-12 intact")
    // EU dotted and dashed day-first dates
    assert(redactOne("due 12.03.2026 sharp") == "due 12.03.2026 sharp")
    assert(redactOne("due 3-12-2026 sharp") == "due 3-12-2026 sharp")
    // US slash date (slash was never a phone separator)
    assert(redactOne("on 08/12/2026 ok") == "on 08/12/2026 ok")
    // short numeric ranges are not 7-digit subscriber numbers
    assert(redactOne("see pages 10-12 and 110-245") == "see pages 10-12 and 110-245")
    // version string
    assert(redactOne("bump to 1.2.3 now") == "bump to 1.2.3 now")
    // real phones adjacent to a date still redact
    assert(redactOne("on 2026-08-12 call 555-867-5309")
      == "on 2026-08-12 call <PHONE>")
  }

  test("clean text is unchanged and counts are zero") {
    val s = "the quick brown fox jumps over the lazy dog"
    assert(redactOne(s) == s)
    import spark.implicits._
    val (e, i, p) = Pii.counts(col("t"))
    val r = Seq(s).toDF("t").select(e.as("e"), i.as("i"), p.as("p")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((0L, 0L, 0L)))
  }

  test("q63 plants exactly one of each PII class per document") {
    // the corpus itself is PII-free, so per-source sums must equal the
    // doc count exactly — this is what makes the rows-only driver check
    // non-vacuous (and it fails if the corpus ever gains PII-shaped
    // text or the planted date starts matching the phone rule)
    val rows = Pii.q63PiiRedact(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(r.getAs[Long]("n_emails") == n, r.getAs[String]("source"))
      assert(r.getAs[Long]("n_ips") == n, r.getAs[String]("source"))
      assert(r.getAs[Long]("n_phones") == n, r.getAs[String]("source"))
      assert(r.getAs[Long]("chars_removed") > 0L)
    }
  }

  test("counts match planted occurrences per class") {
    import spark.implicits._
    val text = "a@b.com and c@d.org from 10.0.0.1 call 555-123-4567"
    val (e, i, p) = Pii.counts(col("t"))
    val r = Seq(text).toDF("t").select(e.as("e"), i.as("i"), p.as("p")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 1L, 1L)))
    assert(redactOne(text) == "<EMAIL> and <EMAIL> from <IP> call <PHONE>")
  }

  test("card audit: shaped runs are candidates, only Luhn-valid ones count as valid") {
    import spark.implicits._
    graft.functions.FingerprintFunctions.register(spark)
    val (nc, nv) = Pii.cardCounts(col("t"))
    def run(text: String): (Long, Long) = {
      val r = Seq(text).toDF("t").select(nc.as("c"), nv.as("v")).head()
      (r.getLong(0), r.getLong(1))
    }
    // valid PAN, space-grouped
    assert(run("pay 4539 1488 0343 6467 now") == ((1L, 1L)))
    // same digits, bad check digit: candidate but not valid
    assert(run("pay 4539 1488 0343 6468 now") == ((1L, 0L)))
    // dash-grouped valid PAN
    assert(run("4539-1488-0343-6467") == ((1L, 1L)))
    // phones and dates are too short to be card candidates
    assert(run("call 555-123-4567 on 2026-08-12") == ((0L, 0L)))
    // 12-digit run: under the PAN floor
    assert(run("order 123456789012") == ((0L, 0L)))
    // card-shaped runs are redacted regardless of checksum
    val red = Seq("pay 4539 1488 0343 6468 now").toDF("t")
      .select(Pii.redactCards(col("t"))).head().getString(0)
    assert(red == "pay <CARD> now")
  }

  test("q72 plants one card per doc with a data-dependent Luhn split") {
    val rows = Pii.q72CardAudit(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    var valid = 0L; var docs = 0L
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(r.getAs[Long]("n_candidates") == n, r.getAs[String]("source"))
      assert(r.getAs[Long]("n_valid") + r.getAs[Long]("n_invalid") == n)
      // every planted card is 19 chars -> "<CARD>" (6): 13 removed each
      assert(r.getAs[Long]("chars_removed") == 13L * n)
      valid += r.getAs[Long]("n_valid"); docs += n
    }
    // check digit = doc_id % 10: ~1 in 10 documents carries a valid PAN
    assert(valid > 0L && valid < docs)
  }
}
