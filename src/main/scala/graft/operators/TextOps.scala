package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * quality scoring, token counting, language ID, fingerprinting. All hot
  * paths are built-in (codegen'd) expressions — `split`/`filter`/
  * `regexp_extract_all`/higher-order lambdas — no Scala UDFs.
  */
object TextOps {

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and")

  private def tokens(c: Column): Column =
    filter(split(c, " "), x => x =!= "")

  /** Per-language corpus quality profile: token/stopword/punctuation
    * statistics, exact integer sums then double ratios.
    */
  def q25TextQuality(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("lang"),
        size(tokens(col("text"))).cast("long").as("n_tok"),
        size(filter(split(col("text"), " "), x => x.isInCollection(Stopwords)))
          .cast("long").as("n_stop"),
        (length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", "")))
          .cast("long").as("n_punct"),
        col("n_chars"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tokens"),
        sum(col("n_stop")).as("sum_stopwords"),
        sum(col("n_punct")).as("sum_punct"),
        sum(col("n_chars")).as("sum_chars"),
        (sum(col("n_tok")).cast("double") / count(lit(1))).as("avg_tokens"),
        (sum(col("n_stop")).cast("double") / sum(col("n_tok")).cast("double"))
          .as("stopword_ratio"))
      .orderBy(col("lang"))

  /** BPE-ish token counting: alpha runs, digit runs, single symbols —
    * the standard pre-tokenizer shape — via codegen'd regexp_extract_all.
    */
  def q26TokenStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("source"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long").as("n_tok"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tokens"),
        (sum(col("n_tok")).cast("double") / count(lit(1))).as("avg_tokens"))
      .orderBy(col("source"))

  /** Stopword-profile language ID (n-gram heuristic): score each language
    * by profile-word hits, predict the argmax (fixed priority on ties),
    * report the confusion matrix against the labeled `lang` column.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "los", "que", "por", "una"),
    "fr" -> Seq("le", "les", "et", "des", "dans"),
    "zh" -> Seq("shi", "bu", "wo", "zhe", "ren"))

  def q27LangId(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(lower(col("text")))
    val scored = LangProfiles.foldLeft(Tables.documents(s, d).select(col("lang"), toks.as("toks"))) {
      case (df, (lang, words)) =>
        df.withColumn(s"score_$lang",
          size(filter(col("toks"), x => x.isInCollection(words))).cast("long"))
    }
    // argmax via greatest(); ties resolve to the first profile in
    // declaration order, no score at all -> "und".
    val scores = LangProfiles.map { case (l, _) => col(s"score_$l") }
    val best = greatest(scores: _*)
    val predCol = LangProfiles.foldRight(lit("und"): Column) {
      case ((lang, _), acc) => when(col(s"score_$lang") === best && best > 0, lit(lang)).otherwise(acc)
    }
    scored
      .withColumn("pred_lang", predCol)
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  /** Document fingerprinting: 61-bit Karp-Rabin rolling hash of the whole
    * text plus the minimum 16-gram window hash (winnowing-style local
    * fingerprint for containment detection). Deterministic, seedless.
    */
  private val FpMod = (1L << 61) - 1
  private val FpBase = 1000003L

  private[operators] def rollingFingerprint(text: String): (Long, Long) = {
    var full = 0L
    var minWin = Long.MaxValue
    var win = 0L
    var pow = 1L // FpBase^15 mod FpMod, built incrementally
    val k = 16
    var i = 0
    val n = text.length
    // precompute base^(k-1)
    var j = 0
    while (j < k - 1) { pow = mulMod(pow, FpBase); j += 1 }
    while (i < n) {
      val c = text.charAt(i).toLong
      full = (mulMod(full, FpBase) + c) % FpMod
      win = (mulMod(win, FpBase) + c) % FpMod
      if (i >= k) {
        val out = text.charAt(i - k).toLong
        win = (win - mulMod(mulMod(out, pow), FpBase) % FpMod + FpMod * 2) % FpMod
      }
      if (i >= k - 1 && win < minWin) minWin = win
      i += 1
    }
    (full, if (minWin == Long.MaxValue) full else minWin)
  }

  /** (a*b) mod (2^61-1) without overflow, via 128-bit split multiply. */
  private def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold 128-bit product mod 2^61-1: (hi*2^64 + lo) mod (2^61-1)
    val m = FpMod
    val part = ((hi << 3) | (lo >>> 61)) // top bits beyond 61
    val res = (lo & m) + part
    val r2 = (res & m) + (res >>> 61)
    if (r2 >= m) r2 - m else r2
  }

  def q28Fingerprint(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val (fp, minFp) = rollingFingerprint(text)
        (id, fp, minFp)
      }
      .toDF("doc_id", "fingerprint", "min_window_fp")
      .orderBy(col("doc_id"))
  }
}
