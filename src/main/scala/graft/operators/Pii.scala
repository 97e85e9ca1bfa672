package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-corpus scrubbing: emails,
  * IPv4 addresses, and phone-shaped number runs replaced by typed
  * placeholder tokens, plus match-count columns for audit metrics.
  *
  * Built entirely from codegen'd `regexp_replace`/`regexp_extract_all`
  * (Java regex — no UDFs, no interpreted lambdas), so redaction runs
  * inside whole-stage codegen and composes with any scan. The driver
  * corpus contains no PII-shaped strings, so this surface is pinned by
  * PiiSpec fixtures rather than a (vacuous) driver oracle.
  *
  * Redaction order is load-bearing: emails first (an address contains
  * dot-separated digit-ish runs a later rule could half-eat), then IPv4
  * (dot-separated octets would otherwise match the phone rule's digit
  * runs), then phones.
  */
object Pii {

  /** user@host.tld — conservative: requires a dotted TLD of 2+ alphas. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Four dot-separated 1-3 digit octets, not embedded in longer runs. */
  val Ipv4Re = "(?<![0-9.])(?:[0-9]{1,3}\\.){3}[0-9]{1,3}(?![0-9.])"

  /** Phone-shaped, two alternatives: separated digit blocks (optional
    * +country and an area-code paren group, then 2-4-digit blocks with
    * REQUIRED single space/dash/dot separators — requiring the
    * separator is what keeps long contiguous ID/serial runs out), or a
    * bare contiguous 7-11 digit run (the lookarounds reject runs longer
    * than 11, rather than redacting an 11-digit prefix of them).
    */
  val PhoneRe =
    "(?<![0-9])(?:\\+?[0-9]{1,3}[-. ]?)?(?:\\([0-9]{2,4}\\)[-. ]?)?[0-9]{2,4}(?:[-. ][0-9]{2,4}){1,3}(?![0-9])" +
      "|(?<![0-9])\\+?[0-9]{7,11}(?![0-9])"

  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"
  val PhoneToken = "<PHONE>"

  /** Redact all three PII classes from a string column (see object
    * scaladoc for why the order is email -> IPv4 -> phone).
    */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, EmailToken),
        Ipv4Re, IpToken),
      PhoneRe, PhoneToken)

  /** Per-row match counts (emails, IPv4s, phones) for audit metrics —
    * counted on the raw text with the same order-independence caveat
    * the redaction chain resolves by ordering: an IPv4 inside an email
    * host counts once as email, not twice.
    */
  def counts(c: Column): (Column, Column, Column) = {
    val afterEmail = regexp_replace(c, EmailRe, EmailToken)
    val afterIp = regexp_replace(afterEmail, Ipv4Re, IpToken)
    (
      size(regexp_extract_all(c, lit(EmailRe), lit(0))).cast("long"),
      size(regexp_extract_all(afterEmail, lit(Ipv4Re), lit(0))).cast("long"),
      size(regexp_extract_all(afterIp, lit(PhoneRe), lit(0))).cast("long"))
  }
}
