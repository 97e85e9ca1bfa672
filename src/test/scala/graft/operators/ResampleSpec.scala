package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** Importance resampling (q120) and token-budget selection (q121).
  * Driver hash-matches both; these pin the acceptance/boundary rules
  * against driver-side reimplementations.
  */
class ResampleSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  test("importance resampling matches a driver-side reimplementation exactly") {
    val stop = TextOps.Stopwords.toSet
    val rows = (1L to 200L).map { id =>
      val words = (0 until (id % 17 + 3).toInt).map { j =>
        if ((id + j) % (id % 5 + 2) == 0) "the" else s"w$j"
      }
      (id, s"s${id % 4}", words.mkString(" "))
    }
    val got = Curation.importanceResample(docs(rows))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("weight")).toMap
    val want = rows.flatMap { case (id, _, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      if (toks.isEmpty) None
      else {
        val w = math.min(1.0, Curation.DsirBoost * toks.count(stop) / toks.length.toDouble)
        val md5hex = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val u = java.lang.Long.parseLong(md5hex.take(8), 16).toDouble / 4294967296.0
        if (u < w) Some(id -> w) else None
      }
    }.toMap
    assert(got == want)
    assert(got.nonEmpty && got.size < rows.size) // non-trivial acceptance
  }

  test("zero-weight docs (no stopwords) are never kept; rich-prose docs always kept") {
    val rows = Seq(
      (1L, "s", "spam spam spam spam"),              // w = 0
      (2L, "s", "the a of and the a of and"))        // w = 1 -> u < 1 always
    val got = Curation.tokenBudgetSelect(docs(rows), budget = 1L) // unrelated op sanity below
    val kept = Curation.importanceResample(docs(rows))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(2L))
    assert(got.count() == 0L) // both docs exceed a 1-token budget
  }

  test("token budget: strict prefix rule — the overflowing doc is cut, later docs not reconsidered") {
    // force hash order by checking against a reimplementation
    val rows = (1L to 30L).map(id => (id, "src", (1L to (id % 7 + 2)).map(j => s"t$j").mkString(" ")))
    val budget = 40L
    val got = Curation.tokenBudgetSelect(docs(rows), budget)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cum_tok"))).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    val ordered = rows.map { case (id, _, text) =>
      val h = md.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (h, id, text.split(" ").count(_.nonEmpty).toLong)
    }.sortBy(x => (x._1, x._2))
    var cum = 0L
    val want = scala.collection.mutable.Map.empty[Long, Long]
    ordered.foreach { case (_, id, n) =>
      cum += n
      if (cum <= budget) want(id) = cum // strict prefix: overflow doc cut, cum keeps growing
    }
    assert(got == want.toMap)
    assert(got.nonEmpty && got.size < rows.size)
  }

  test("token budget is per source: each source fills independently") {
    val rows = Seq(
      (1L, "a", "x y z"), (2L, "a", "x y z"),
      (3L, "b", "x y z"), (4L, "b", "x y z"))
    val got = Curation.tokenBudgetSelect(docs(rows), budget = 3L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // every source keeps exactly one 3-token doc under a 3-token budget
    assert(got.size == 2)
    assert(got.exists(Set(1L, 2L)) && got.exists(Set(3L, 4L)))
  }
}
