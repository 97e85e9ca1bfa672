package graft.operators

import graft.mr.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  test("lastBefore attaches the latest right payload at or before each left time") {
    import spark.implicits._
    val trades = Seq( // (key, time, trade_id)
      ("A", 10L, 1L), ("A", 25L, 2L), ("B", 15L, 3L))
      .toDF("sym", "t", "trade_id")
    val quotes = Seq( // (key, time, px)
      ("A", 5L, 100.0), ("A", 10L, 101.0), ("A", 20L, 102.0),
      ("B", 99L, 500.0))
      .toDF("sym", "t", "px")

    val got = AsOfJoin.lastBefore(trades, quotes, "sym", "t", Seq("px"))
      .select($"sym", $"trade_id", $"asof_px").as[(String, Long, Option[Double])]
      .collect().toSet

    assert(got == Set(
      ("A", 1L, Some(101.0)), // equal-time quote visible
      ("A", 2L, Some(102.0)),
      ("B", 3L, None)))       // no quote at or before t=15
  }

  test("lastBefore with tieBreak is deterministic on duplicate (key, time) right rows") {
    import spark.implicits._
    val trades = Seq(("A", 20L, 1L)).toDF("sym", "t", "trade_id")
    val dupQuotes = Seq(("A", 10L, 100.0), ("A", 10L, 101.0)).toDF("sym", "t", "px")
    val got = (1 to 5).map { _ =>
      AsOfJoin.lastBefore(trades, dupQuotes.repartition(4), "sym", "t", Seq("px"), tieBreak = Seq("px"))
        .select($"asof_px").as[Double].head()
    }
    assert(got.toSet == Set(101.0)) // highest px wins the tie, every run
  }

  test("lastBefore carries multiple payload columns") {
    import spark.implicits._
    val left = Seq((1L, 100L, "x")).toDF("k", "t", "tag")
    val right = Seq((1L, 50L, 7.0, "q1"), (1L, 90L, 9.0, "q2")).toDF("k", "t", "v", "name")
    val got = AsOfJoin.lastBefore(left, right, "k", "t", Seq("v", "name"))
      .select($"tag", $"asof_v", $"asof_name").as[(String, Double, String)]
      .collect().toSeq
    assert(got == Seq(("x", 9.0, "q2")))
  }

  test("lastBefore law: matches a per-row scan oracle on random keyed series") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._

    val rowGen = for {
      k <- Gen.choose(0, 3)
      t <- Gen.choose(0L, 50L)
      v <- Gen.choose(-999L, 999L)
    } yield (k, t, v)
    val dataGen = for {
      left <- Gen.listOfN(25, rowGen)
      right <- Gen.listOfN(25, rowGen)
    } yield (left, right)

    for (seed <- 1 to 6) {
      val (left, right) = dataGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      // distinct left ids so rows compare positionally-independently
      val leftIds = left.zipWithIndex.map { case ((k, t, _), i) => (k, t, i.toLong) }
      val got = AsOfJoin.lastBefore(
        leftIds.toDF("k", "t", "id"), right.toDF("k", "t", "v"),
        "k", "t", Seq("v"), tieBreak = Seq("v"))
        .select($"id", $"asof_v").as[(Long, Option[Long])]
        .collect().toMap
      val want = leftIds.map { case (k, t, id) =>
        val cands = right.filter(r => r._1 == k && r._2 <= t)
        id -> (if (cands.isEmpty) None
               else Some(cands.maxBy(r => (r._2, r._3))._3))
      }.toMap
      assert(got == want, s"seed=$seed left=$leftIds right=$right")
    }
  }
}
