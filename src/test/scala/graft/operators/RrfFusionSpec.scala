package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** Reciprocal rank fusion (q139). The driver hash-matches the composed
  * BM25+cosine SQL oracle; these fixtures pin the fusion rule itself
  * on the real corpus lists: the rrf arithmetic, consensus promotion
  * (a doc on both lists outranks single-list docs with better
  * single-list ranks), missing-list handling, and scale invariance
  * (RRF ignores scores entirely, so any monotone rescale of either
  * ranker leaves the fusion unchanged — the property score-mix q81
  * does NOT have).
  */
class RrfFusionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val fused = Similarity.q139RrfFusion(spark, dir).collect()

  test("rrf score is exactly 1/(60+lex) + 1/(60+cos), 0 for a missing list") {
    assert(fused.nonEmpty)
    fused.foreach { r =>
      val lex = Option(r.getAs[Any]("lex_rnk")).map(_.asInstanceOf[Long])
      val cos = Option(r.getAs[Any]("cos_rnk")).map(_.asInstanceOf[Long])
      val expect = lex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        cos.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(r.getAs[Double]("rrf") == expect) // same bits, not approx
      assert(lex.nonEmpty || cos.nonEmpty)
    }
  }

  test("both-list docs beat any single-list doc up to the consensus bound") {
    // 1/(60+a) + 1/(60+b) with a,b <= 20 is >= 2/80 = 0.025, while a
    // single-list doc caps at 1/61 ~ 0.0164: consensus always wins
    val byQuery = fused.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (_, rows) =>
      val both = rows.filter(r => r.getAs[Any]("lex_rnk") != null && r.getAs[Any]("cos_rnk") != null)
      val single = rows.filter(r => r.getAs[Any]("lex_rnk") == null || r.getAs[Any]("cos_rnk") == null)
      if (both.nonEmpty && single.nonEmpty)
        assert(both.map(_.getAs[Long]("rnk")).max < single.map(_.getAs[Long]("rnk")).min)
    }
  }

  test("output shape: top-10 per probe, rank-dense, deterministic ties") {
    val byQuery = fused.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keys.toSet == (0L to 9L).toSet)
    byQuery.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("rnk")).sorted.toSeq == (1L to rows.length))
      assert(rows.length <= Similarity.RrfTopK)
      // equal rrf scores must be ordered by doc_id
      rows.sortBy(_.getAs[Long]("rnk")).sliding(2).foreach {
        case Array(a, b) =>
          val (sa, sb) = (a.getAs[Double]("rrf"), b.getAs[Double]("rrf"))
          assert(sa > sb || (sa == sb &&
            a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
        case _ =>
      }
    }
  }

  test("rank-based fusion is invariant to score calibration by construction") {
    // the fused frame carries only ranks — recompute fusion from the
    // ranks alone and require identity with the operator's output
    val fromRanks = fused.map { r =>
      val lex = Option(r.getAs[Any]("lex_rnk")).map(_.asInstanceOf[Long])
      val cos = Option(r.getAs[Any]("cos_rnk")).map(_.asInstanceOf[Long])
      (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
        lex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
          cos.map(x => 1.0 / (60 + x)).getOrElse(0.0))
    }.toSet
    val fromOp = fused.map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("doc_id"), r.getAs[Double]("rrf"))).toSet
    assert(fromRanks == fromOp)
  }
}
