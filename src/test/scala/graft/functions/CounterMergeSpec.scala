package graft.functions

import graft.mr.SparkSpec

class CounterMergeSpec extends SparkSpec {

  test("CounterMerge aggregates word counts per group, merging map-side") {
    import spark.implicits._
    val lines = Seq(
      ("a", "word something else"),
      ("a", "else something word"),
      ("b", "mr python could be cool 1")).toDS()
    val agg = new CounterMerge[(String, String)](
      r => r._2.toLowerCase.split("\\s+").toSeq)
    val got = lines.groupByKey(_._1).agg(agg.toColumn.name("counts"))
      .collect().toMap
    assert(got("a") == Map("word" -> 2L, "something" -> 2L, "else" -> 2L))
    assert(got("b") == Map("mr" -> 1L, "python" -> 1L, "could" -> 1L,
      "be" -> 1L, "cool" -> 1L, "1" -> 1L))
  }

  test("CounterMerge global aggregation matches the wordcount oracle") {
    import spark.implicits._
    val ds = spark.createDataset(graft.mr.WordCountTasks.Text).repartition(3)
    val agg = new CounterMerge[String](_.toLowerCase.trim.split("\\s+").toSeq)
    val got = ds.groupByKey(_ => 0).agg(agg.toColumn.name("counts")).collect()
    assert(got.head._2 == graft.mr.WordCountTasks.Oracle)
  }
}
