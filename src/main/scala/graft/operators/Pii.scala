package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** A match may not start mid-way through a separated digit run: if the
    * immediately preceding text is `digit-` / `digit.` we are inside a
    * larger dash/dot-joined sequence (e.g. the "08-12" tail of an ISO
    * date) and must not redact its suffix.
    */
  private val NotMidRun = "(?<![0-9])(?<![0-9][-.])"

  /** Full-date shapes are not phones even though they fit the block
    * structure: yyyy-mm-dd / yyyy.mm.dd and dd-mm-yyyy / mm.dd.yyyy.
    * (Slash-separated dates never matched — `/` is not a phone
    * separator.) Two deliberate collisions are left alone: a 4-2-2
    * digit phone written with dashes, and a phone whose blocks spell a
    * d-m-yyyy shape (e.g. "12-34-5678" under some national formats) —
    * both are indistinguishable from dates without semantic context,
    * and a date guard that validated month/day plausibility would
    * still pass most of them (12/34 are in or near plausible ranges).
    * The redactor errs toward under-redaction here by design.
    */
  private val DateGuard =
    "(?!(?:[0-9]{4}[-.][0-9]{1,2}[-.][0-9]{1,2}|[0-9]{1,2}[-.][0-9]{1,2}[-.][0-9]{4})(?![0-9]))"

  /** At least 7 digits reachable through phone punctuation from the
    * match start — the minimum length of a real subscriber number.
    * Keeps short ranges ("pages 10-12") and id fragments out.
    */
  private val MinSevenDigits = "(?=\\+?(?:[-. ()]{0,2}[0-9]){7})"

  /** Phone-shaped, two alternatives: separated digit blocks (optional
    * +country and an area-code paren group, then 2-4-digit blocks with
    * REQUIRED single space/dash/dot separators — requiring the
    * separator is what keeps long contiguous ID/serial runs out), or a
    * bare contiguous 7-11 digit run (the lookarounds reject runs longer
    * than 11, rather than redacting an 11-digit prefix of them). Both
    * are guarded by [[NotMidRun]]; the separated form additionally by
    * [[DateGuard]] and [[MinSevenDigits]].
    */
  val PhoneRe =
    NotMidRun + DateGuard + MinSevenDigits +
      "(?:\\+?[0-9]{1,3}[-. ]?)?(?:\\([0-9]{2,4}\\)[-. ]?)?[0-9]{2,4}(?:[-. ][0-9]{2,4}){1,3}(?![0-9])" +
      "|" + NotMidRun + "\\+?[0-9]{7,11}(?![0-9])"

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

  /** Per-source PII audit over `documents`: doc counts, per-class match
    * sums, and total characters removed by redaction. The driver corpus
    * deliberately contains no PII, so each document gets one email, one
    * IPv4, and one phone planted DETERMINISTICALLY from its doc_id
    * (plus an ISO date that must NOT be counted as a phone) — the
    * counts are non-vacuous and every column is reproducible run to
    * run. The oracle is a REGEX REPLAY in DuckDB (analytic through
    * r15): email verbatim, IPv4 with the lookarounds re-expressed as
    * RE2 prefix/suffix captures restored by group reference, and the
    * date guard realized as a length-preserving digit mask of the
    * 4-2-2 date shape before the phone rule — sound because the corpus
    * text carries zero digits, so the only 4-2-2 run is the planted
    * date. The full lookaround semantics on arbitrary inputs are
    * pinned by PiiSpec fixtures.
    *
    * Scale shape: one codegen'd pass over the corpus (regexp chain in
    * whole-stage codegen, no UDFs) into a ~20-row per-source aggregate.
    */
  def q63PiiRedact(s: SparkSession, d: String): DataFrame = {
    val planted = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"))
      .withColumn("t", concat(
        col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com"),
        lit(" or +1-555-"),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" via 10."), (col("doc_id") % 250).cast("string"),
        lit(".0."), (col("doc_id") % 199 + 1).cast("string"),
        lit(" on 2026-08-12")))
    val (e, i, p) = counts(col("t"))
    // The date-guard replay's soundness premise — the RAW corpus text
    // carries zero digits, so the only 4-2-2 digit run in `t` is the
    // planted date — is asserted here, not assumed: any digit in raw
    // `text` raises loudly instead of silently vacating the oracle.
    // The term is 0 on every compliant row, so `delta` (and the hash)
    // is unchanged, and the check rides the same corpus pass.
    val digitFreePremise = when(col("text").rlike("[0-9]"),
      raise_error(concat(
        lit("q63 oracle premise violated: raw corpus text contains a "
          + "digit (date-guard replay unsound) at doc_id="),
        col("doc_id").cast("string")))).otherwise(lit(0L))
    planted
      .select(col("source"), e.as("ne"), i.as("ni"), p.as("np"),
        (length(col("t")) - length(redact(col("t"))) + digitFreePremise)
          .cast("long").as("delta"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ne")).as("n_emails"),
        sum(col("ni")).as("n_ips"),
        sum(col("np")).as("n_phones"),
        sum(col("delta")).as("chars_removed"))
      .orderBy(col("source"))
  }

  // ---- payment-card audit (Luhn) ------------------------------------

  /** Card-shaped candidate: 13-19 digits, optionally single space/dash
    * separated, not embedded in a longer digit run and not starting
    * mid-way through a separated one (same guard family as [[PhoneRe]]).
    * Dates and phones are too short to collide (max 11 digits).
    */
  val CardRe = "(?<![0-9])(?<![0-9][- ])(?:[0-9][- ]?){12,18}[0-9](?![0-9])"

  /** Per-row (candidate count, Luhn-valid count) for a text column. The
    * scrub itself redacts every card-SHAPED run ([[CardRe]] — a
    * conservative scrubber does not leave invalid-checksum numbers in
    * place); the Luhn-valid count is the audit signal separating true
    * PANs from random digit runs. The validity check runs through the
    * native `luhn_valid` expression; the array lambda here is
    * interpreted, but it iterates the per-document CANDIDATE list
    * (almost always 0-2 elements), not the text — the per-char work
    * (regex scan, digit fold) is all codegen.
    */
  def cardCounts(c: Column): (Column, Column) = {
    val cands = regexp_extract_all(c, lit(CardRe), lit(0))
    val valid = filter(cands, x =>
      call_function("luhn_valid", translate(x, "- ", "")))
    (size(cands).cast("long"), size(valid).cast("long"))
  }

  val CardToken = "<CARD>"

  /** Redact card-shaped runs (after emails/IPs/phones a caller may have
    * already replaced; CardRe's 13-digit floor keeps it off phones).
    */
  def redactCards(c: Column): Column = regexp_replace(c, CardRe, CardToken)

  /** Per-source payment-card audit (q72): each document gets ONE card
    * candidate planted deterministically from its doc_id — a 16-digit
    * PAN whose check digit is `doc_id % 10`, i.e. correct for ~1 in 10
    * documents — so the Luhn verdict is DATA-DEPENDENT and the DuckDB
    * oracle must reimplement the checksum independently to agree
    * (unlike a plant-then-count check that is right by construction).
    * Cards are planted space-grouped (4-4-4-4) to exercise separator
    * stripping. Scale shape: one codegen pass, ~20-row aggregate.
    */
  def q72CardAudit(s: SparkSession, d: String): DataFrame = {
    graft.functions.FingerprintFunctions.register(s)
    val full16 = concat(
      lit("4"), lpad((col("doc_id") % 100000000L).cast("string"), 14, "0"),
      (col("doc_id") % 10).cast("string"))
    val planted = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"))
      .withColumn("card", concat(
        substring(full16, 1, 4), lit(" "), substring(full16, 5, 4), lit(" "),
        substring(full16, 9, 4), lit(" "), substring(full16, 13, 4)))
      .withColumn("t", concat(col("text"), lit(" pay to "), col("card")))
    val (nc, nv) = cardCounts(col("t"))
    planted
      .select(col("source"), nc.as("nc"), nv.as("nv"),
        (length(col("t")) - length(redactCards(col("t")))).cast("long").as("delta"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nc")).as("n_candidates"),
        sum(col("nv")).as("n_valid"),
        sum(col("nc") - col("nv")).as("n_invalid"),
        sum(col("delta")).as("chars_removed"))
      .orderBy(col("source"))
  }

  /** Cohort-size floor for the q164 re-identification audit. */
  val KAnonymity = 10L

  /** k-anonymity audit (q164): the re-identification risk check that
    * precedes releasing or training on user-adjacent tabular data
    * (Sweeney '02). Every quasi-identifier cohort — here (nation,
    * market segment) over the customer table — is measured, flagged
    * when its population is below k (any record in it is identifiable
    * to within <k candidates), and re-measured under the standard
    * remedy: GENERALIZING the quasi-identifier by dropping its finest
    * column. Output per cohort: size, at-risk flag, the generalized
    * cohort's size, and whether generalization alone clears the floor
    * — the actionable triage (suppress vs generalize) in one frame.
    *
    * Shape at scale: two map-side-combinable counts (cohort,
    * generalized cohort) and a broadcast-sized join between them —
    * cohort cardinality is bounded by the quasi-identifier domain, not
    * the table, so the audit costs two scans of one column pair at any
    * data size.
    */
  def q164KAnonymity(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .select(col("c_nationkey"), col("c_mktsegment"))
    val cohorts = cust.groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
    val coarse = cust.groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_coarse"))
    cohorts.join(broadcast(coarse), "c_nationkey")
      .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
        (col("n") < lit(KAnonymity)).as("at_risk"),
        col("n_coarse"),
        (col("n_coarse") >= lit(KAnonymity)).as("generalization_clears"))
      .orderBy(col("c_nationkey"), col("c_mktsegment"))
  }
}
