package graft.mr

/** The Dataset (Tungsten) execution path must agree exactly with the RDD
  * path on the same tasks — both reducer shapes, with and without the
  * keyPreserving elision, and under secondary sort.
  */
class DatasetPathSpec extends SparkSpec {
  import WordCountTasks._

  for (kp <- Seq(true, false)) {
    test(s"yield-mode wordcount: Dataset path == RDD path (keyPreserving=$kp)") {
      import spark.implicits._
      val task = new YieldYield(0, kp)
      val viaRdd = task.runToMap(sc.parallelize(Text, 3))
      val viaDs = task.runDataset(spark.createDataset(Text).repartition(3))
        .collect().toMap
      assert(viaDs.view.mapValues(_.toList).toMap == viaRdd)
    }

    test(s"return-mode wordcount: Dataset path == RDD path (keyPreserving=$kp)") {
      import spark.implicits._
      val task = new YieldReturn(0, kp)
      val viaRdd = task.runToMap(sc.parallelize(Text, 3))
      val viaDs = task.runDataset(spark.createDataset(Text).repartition(3))
        .collect().toMap
      assert(viaDs == viaRdd)
    }
  }

  test("Dataset path honors the secondary-sort matrix") {
    import spark.implicits._
    val data = Seq(2, 3, 1)
    val task = new SortingTasks.SortMapValue(false)
    val got = task.runDataset(spark.createDataset(data).coalesce(1))
      .collect().toMap
    assert(got(0) == Seq(1, 2, 3))
  }
}
