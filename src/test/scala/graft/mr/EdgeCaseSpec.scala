package graft.mr

/** Degenerate inputs: empty streams, filter-everything mappers, single
  * elements — the places distributed frameworks traditionally break.
  */
class EdgeCaseSpec extends SparkSpec {

  private object Identity extends MapReduce[Int, Int, Int, Int] {
    def mapper(i: Int): IterableOnce[Emit[Int, Int, Int]] = Iterator.single(KV(i % 2, i))
    def reducer(k: Int, vs: Seq[Int]): IterableOnce[Emit[Int, Int, Int]] =
      vs.iterator.map(v => KV(k, v))
  }

  private object DropAll extends MapReduce[Int, Int, Int, Int] {
    def mapper(i: Int): IterableOnce[Emit[Int, Int, Int]] = Iterator.empty
    def reducer(k: Int, vs: Seq[Int]): IterableOnce[Emit[Int, Int, Int]] =
      vs.iterator.map(v => KV(k, v))
  }

  test("empty input produces an empty result") {
    assert(Identity.runToMap(sc.parallelize(Seq.empty[Int], 2)) == Map.empty)
  }

  test("mapper emitting nothing (filter-all) produces an empty result") {
    assert(DropAll.runToMap(sc.parallelize(1 to 100, 4)) == Map.empty)
  }

  test("single element round-trips") {
    assert(Identity.runToMap(sc.parallelize(Seq(7), 1)) == Map(1 -> List(7)))
  }

  test("empty input through the Dataset path") {
    import spark.implicits._
    assert(Identity.runDataset(spark.emptyDataset[Int]).collect().isEmpty)
  }
}
