package graft.mr

import java.util.concurrent.atomic.AtomicInteger

/** Per-partition setup/teardown lifecycle (the reference's context-manager
  * task idiom, docs.rst:189-194) and the per-phase parallelism knobs
  * (`mapper_map` vs `reducer_map`, tinymr.py:156-173).
  */
object HookTasks {

  // static (JVM-wide) counters: every task in local mode shares this JVM,
  // while each task deserializes its own MR instance — so instance state
  // can't count across partitions but these can
  val setups = new AtomicInteger(0)
  val teardowns = new AtomicInteger(0)

  def reset(): Unit = { setups.set(0); teardowns.set(0) }

  final class CountingSum(mapPar: Int) extends MapReduce1[Int, Int, Int, Long] {
    override def mapParallelism: Int = mapPar
    override def setup(): Unit = setups.incrementAndGet()
    override def teardown(): Unit = teardowns.incrementAndGet()
    def mapper(item: Int): IterableOnce[Emit[Int, Int, Long]] =
      Iterator.single(KV(item % 3, item.toLong))
    def reducer(key: Int, values: Seq[Long]): Emit[Int, Int, Long] =
      KV(key, values.sum)
  }

  /** setup() opens a "resource" the mapper and reducer require — proving
    * the once-per-partition init runs BEFORE the first record of each
    * phase's stream (the whole point of the context-manager idiom: the
    * resource is opened on the worker, not serialized from the driver).
    */
  final class ResourceSum extends MapReduce1[Int, Int, Int, Long] {
    @transient private var res: AtomicInteger = _
    override def setup(): Unit = { res = new AtomicInteger(0) }
    override def teardown(): Unit = { res = null }
    def mapper(item: Int): IterableOnce[Emit[Int, Int, Long]] = {
      require(res != null, "setup() did not run before the first mapper call")
      res.incrementAndGet()
      Iterator.single(KV(item % 3, item.toLong))
    }
    def reducer(key: Int, values: Seq[Long]): Emit[Int, Int, Long] = {
      require(res != null, "setup() did not run before the first reducer call")
      KV(key, values.sum)
    }
  }

  /** keyPreserving MapReduce1: the reduce phase's instrumented iterator
    * runs in the FINAL stage (no shuffle #2), so a downstream take/limit
    * short-circuits it mid-stream — the case where teardown is only
    * guaranteed by the TaskContext completion listener.
    */
  final class ShortCircuitSum extends MapReduce1[Int, Int, Int, Long] {
    override def keyPreserving: Boolean = true
    override def setup(): Unit = setups.incrementAndGet()
    override def teardown(): Unit = teardowns.incrementAndGet()
    def mapper(item: Int): IterableOnce[Emit[Int, Int, Long]] =
      Iterator.single(KV(item % 10, item.toLong))
    def reducer(key: Int, values: Seq[Long]): Emit[Int, Int, Long] =
      KV(key, values.sum)
  }

  final class AsymmetricSum(mapPar: Int, redPar: Int) extends MapReduce[Int, Int, Int, Long] {
    override def mapParallelism: Int = mapPar
    override def reduceParallelism: Int = redPar
    def mapper(item: Int): IterableOnce[Emit[Int, Int, Long]] =
      Iterator.single(KV(item % 7, item.toLong))
    def reducer(key: Int, values: Seq[Long]): IterableOnce[Emit[Int, Int, Long]] =
      Iterator.single(KV(key % 2, values.sum))
  }
}

class HooksSpec extends SparkSpec {
  import HookTasks._

  test("setup/teardown fire once per partition per phase (RDD path)") {
    reset()
    val got = new CountingSum(mapPar = 2).runToMap(sc.parallelize(1 to 100, 4))
    assert(got == (1 to 100).groupBy(_ % 3).view.mapValues(_.map(_.toLong).sum).toMap)
    // map phase: 4 input partitions; reduce phase: mapParallelism=2
    // shuffle partitions -> 6 streams, each set up and torn down once
    assert(setups.get() == 6, s"setups=${setups.get()}")
    assert(teardowns.get() == 6, s"teardowns=${teardowns.get()}")
  }

  test("setup opens worker-side resources before the first record of each phase") {
    val got = new ResourceSum().runToMap(sc.parallelize(1 to 50, 3))
    assert(got == (1 to 50).groupBy(_ % 3).view.mapValues(_.map(_.toLong).sum).toMap)
  }

  test("setup/teardown fire and balance on the Dataset path") {
    reset()
    import spark.implicits._
    val got = new CountingSum(mapPar = 0)
      .runDataset(spark.range(1, 101).as[Long].map(_.toInt))
      .collect().toMap
    assert(got == (1 to 100).groupBy(_ % 3).view.mapValues(_.map(_.toLong).sum).toMap)
    // AQE sizes the Dataset shuffles, so exact stream counts aren't
    // pinned — the invariant is: every setup had its teardown, and the
    // hooks actually ran
    assert(setups.get() > 0)
    assert(setups.get() == teardowns.get(),
      s"setups=${setups.get()} teardowns=${teardowns.get()}")
  }

  test("teardown still fires when a downstream take() short-circuits the stream (RDD path)") {
    reset()
    val one = new ShortCircuitSum().run(sc.parallelize(1 to 100, 4)).take(1)
    assert(one.length == 1)
    assert(setups.get() > 0)
    // without the TaskContext completion listener the short-circuited
    // partition's reduce-phase stream is never drained -> teardown leaks
    assert(setups.get() == teardowns.get(),
      s"setups=${setups.get()} teardowns=${teardowns.get()}")
  }

  test("teardown still fires when a downstream limit short-circuits the stream (Dataset path)") {
    reset()
    import spark.implicits._
    val one = new ShortCircuitSum()
      .runDataset(spark.range(1, 101).as[Long].map(_.toInt))
      .head(1)
    assert(one.length == 1)
    assert(setups.get() > 0)
    assert(setups.get() == teardowns.get(),
      s"setups=${setups.get()} teardowns=${teardowns.get()}")
  }

  test("mapParallelism and reduceParallelism size their shuffles independently") {
    val task = new AsymmetricSum(mapPar = 5, redPar = 3)
    val out = task.run(sc.parallelize(1 to 1000, 8))
    // shuffle #2 carries reduceParallelism (the map-side count is pinned
    // by the CountingSum hook test above via its setup tally)
    assert(out.getNumPartitions == 3, s"reduce side: ${out.getNumPartitions}")
    val perKeySums = (1 to 1000).groupBy(_ % 7)
      .map { case (k, vs) => (k, vs.map(_.toLong).sum) }
    val expect = perKeySums.groupBy(_._1 % 2)
      .map { case (k, m) => (k, m.values.toSet) }
    val got = out.collect().toMap.map { case (k, vs) => (k, vs.toSet) }
    assert(got == expect)
  }

  test("numPartitions remains the single knob when the per-phase ones aren't set") {
    val task = new MapReduce1[Int, Int, Int, Long] {
      override def numPartitions: Int = 4
      def mapper(item: Int): IterableOnce[Emit[Int, Int, Long]] =
        Iterator.single(KV(item % 3, item.toLong))
      def reducer(key: Int, values: Seq[Long]): Emit[Int, Int, Long] =
        KV(key % 2, values.sum)
    }
    assert(task.mapParallelism == 4 && task.reduceParallelism == 4)
    assert(task.run(sc.parallelize(1 to 100, 4)).getNumPartitions == 4)
  }
}
