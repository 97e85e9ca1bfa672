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

  test("Dataset path honors the parallelism knobs and stays result-identical") {
    import spark.implicits._
    val knobbed = new HookTasks.AsymmetricSum(mapPar = 5, redPar = 3)
    val plain = new HookTasks.AsymmetricSum(mapPar = 0, redPar = 0)
    val input = spark.createDataset(1 to 1000).repartition(8)
    val out = knobbed.runDataset(input)
    // shuffle #2 width is pinned by reduceParallelism, not the session conf
    assert(out.rdd.getNumPartitions == 3, s"got ${out.rdd.getNumPartitions}")
    val got = out.collect().toMap.view.mapValues(_.toSet).toMap
    val ref = plain.runDataset(input).collect().toMap.view.mapValues(_.toSet).toMap
    assert(got == ref)
  }

  test("Dataset combiner path honors mapParallelism and stays result-identical") {
    import spark.implicits._
    import WordCountTasks.{Oracle, Text}
    val task = new MapReduce1[String, String, Int, Long] {
      def mapper(item: String): IterableOnce[Emit[String, Int, Long]] =
        item.toLowerCase.trim.split("\\s+").iterator.map(w => KV(w, 1L))
      def reducer(key: String, values: Seq[Long]): Emit[String, Int, Long] =
        KV(key, values.sum)
      override def combiner: Option[(Long, Long) => Long] = Some(_ + _)
      override def mapParallelism: Int = 5
    }
    val got = task.runDataset(spark.createDataset(Text).repartition(3))
      .collect().toMap
    assert(got == Oracle)
  }
}
