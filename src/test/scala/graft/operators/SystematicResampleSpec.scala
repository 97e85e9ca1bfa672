package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** Weighted systematic resampling (q125). The driver hash-matches the
  * single-window SQL oracle; these fixtures pin the sampler's defining
  * invariants — total multiplicity telescopes to exactly k, heavy docs
  * are guaranteed slots with proportional multiplicity, zero-weight
  * docs never draw — and a randomized differential proves the
  * two-phase bucketed scan equals the plain global window.
  */
class SystematicResampleSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def toks(n: Int): String = Seq.fill(n)("t").mkString(" ")

  test("total multiplicity is exactly k (telescoping sum)") {
    val rng = new Random(7)
    val fixture = (1L to 200L).map(id => id -> toks(1 + rng.nextInt(40)))
    val out = Curation.systematicResample(docs(fixture), k = 37L)
    assert(out.agg(sum(col("multiplicity"))).head().getLong(0) == 37L)
  }

  test("a doc spanning m strides draws m or m+1 times; w >= T/k guarantees a slot") {
    // one heavy doc of 500 tokens among 100 of 5 tokens: T = 1000,
    // k = 20 => stride 50; the heavy doc spans exactly 10 strides
    val fixture = (1L to 100L).map(id => id -> toks(5)) :+ (999L -> toks(500))
    val out = Curation.systematicResample(docs(fixture), k = 20L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("multiplicity")).toMap
    assert(out.contains(999L))
    assert(out(999L) == 10L || out(999L) == 11L)
    assert(out.values.sum == 20L)
  }

  test("zero-weight docs never draw") {
    val fixture = Seq(1L -> toks(10), 2L -> "", 3L -> toks(10))
    val out = Curation.systematicResample(docs(fixture), k = 5L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(!out.contains(2L))
  }

  test("randomized differential: bucketed two-phase scan == plain global window") {
    val rng = new Random(41)
    val fixture = (1L to 300L).map(id => id -> toks(rng.nextInt(30)))
    val k = 53L
    val got = Curation.systematicResample(docs(fixture), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // reference: the oracle's shape — one global window, no buckets
    val rows = docs(fixture)
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), t => t =!= "")).cast("long").as("n_tok"),
        md5(col("text")).as("h"))
    val total = rows.agg(sum(col("n_tok"))).head().getLong(0)
    val want = rows
      .withColumn("w0", coalesce(
        sum(col("n_tok")).over(Window.orderBy(col("h"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("multiplicity",
        expr(s"((w0 + n_tok) * $k) div $total - (w0 * $k) div $total"))
      .filter(col("multiplicity") >= 1)
      .select(col("doc_id"), col("n_tok"), col("multiplicity"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }
}
