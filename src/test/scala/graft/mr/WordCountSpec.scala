package graft.mr

/** Port of the reference's 288-case execution matrix
  * (/root/reference/tests/test_mapreduce_concurrency.py). The reference
  * crosses 4 task shapes (yield/return x mapper/reducer) with 6 pool
  * types x 2 worker counts; here pools become partition counts (input
  * parallelism x reducer parallelism) and the yield/return dispatch is
  * the MapReduce (multi) vs MapReduce1 (single) trait choice. The
  * expectation is a differential stdlib oracle, exactly like the
  * reference's conftest.py:19-22 Counter oracle.
  */
object WordCountTasks {

  // F1 fixture (reference tests/conftest.py:10-16)
  val Text: Seq[String] = Seq(
    "word something else",
    "else something word",
    "mr python could be cool 1")

  /** stdlib oracle (reference conftest.py:19-22) */
  val Oracle: Map[String, Long] =
    Text.flatMap(_.toLowerCase.trim.split("\\s+")).groupBy(identity)
      .map { case (w, ws) => (w, ws.length.toLong) }

  /** yield-mapper + yield-reducer (WordCountYieldYield) */
  final class YieldYield(parts: Int, kp: Boolean)
      extends MapReduce[String, String, Int, Long] {
    override def numPartitions: Int = parts
    override def keyPreserving: Boolean = kp
    def mapper(item: String): IterableOnce[Emit[String, Int, Long]] =
      item.toLowerCase.trim.split("\\s+").iterator.map(w => KV(w, 1L))
    def reducer(key: String, values: Seq[Long]): IterableOnce[Emit[String, Int, Long]] =
      Iterator.single(KV(key, values.sum))
  }

  /** yield-mapper + return-reducer (WordCountYieldReturn) */
  final class YieldReturn(parts: Int, kp: Boolean)
      extends MapReduce1[String, String, Int, Long] {
    override def numPartitions: Int = parts
    override def keyPreserving: Boolean = kp
    def mapper(item: String): IterableOnce[Emit[String, Int, Long]] =
      item.toLowerCase.trim.split("\\s+").iterator.map(w => KV(w, 1L))
    def reducer(key: String, values: Seq[Long]): Emit[String, Int, Long] =
      KV(key, values.sum)
  }

  /** return-mapper (in-mapper combining: one Counter per line) +
    * yield-reducer (WordCountReturnYield) — values are opaque Maps,
    * exercising non-primitive value types.
    */
  final class ReturnYield(parts: Int)
      extends MapReduce[String, Int, Int, Map[String, Long]] {
    override def numPartitions: Int = parts
    def mapper(item: String): IterableOnce[Emit[Int, Int, Map[String, Long]]] = {
      val counts = item.toLowerCase.trim.split("\\s+").groupBy(identity)
        .map { case (w, ws) => (w, ws.length.toLong) }
      Iterator.single(KV(0, counts))
    }
    def reducer(key: Int, values: Seq[Map[String, Long]]): IterableOnce[Emit[Int, Int, Map[String, Long]]] = {
      val merged = values.foldLeft(Map.empty[String, Long]) { (acc, m) =>
        m.foldLeft(acc) { case (a, (w, n)) => a.updated(w, a.getOrElse(w, 0L) + n) }
      }
      Iterator.single(KV(key, merged))
    }
  }

  /** return-mapper + return-reducer (WordCountReturnReturn) */
  final class ReturnReturn(parts: Int)
      extends MapReduce1[String, Int, Int, Map[String, Long]] {
    override def numPartitions: Int = parts
    def mapper(item: String): IterableOnce[Emit[Int, Int, Map[String, Long]]] = {
      val counts = item.toLowerCase.trim.split("\\s+").groupBy(identity)
        .map { case (w, ws) => (w, ws.length.toLong) }
      Iterator.single(KV(0, counts))
    }
    def reducer(key: Int, values: Seq[Map[String, Long]]): Emit[Int, Int, Map[String, Long]] =
      KV(key, values.foldLeft(Map.empty[String, Long]) { (acc, m) =>
        m.foldLeft(acc) { case (a, (w, n)) => a.updated(w, a.getOrElse(w, 0L) + n) }
      })
  }
}

class WordCountSpec extends SparkSpec {
  import WordCountTasks._

  // partition matrix: input slices x reducer partitions, the Spark
  // analogue of the reference's pool-type x worker-count grid.
  private val grid = for {
    inParts <- Seq(1, 4)
    redParts <- Seq(1, 4)
    kp <- Seq(true, false)
  } yield (inParts, redParts, kp)

  for ((in, red, kp) <- grid) {
    test(s"yield-yield wordcount in=$in red=$red keyPreserving=$kp") {
      val rdd = sc.parallelize(Text, in)
      val got = new YieldYield(red, kp).runToMap(rdd).map { case (k, v) => (k, v.head) }
      assert(got == Oracle)
    }
    test(s"yield-return wordcount in=$in red=$red keyPreserving=$kp") {
      val rdd = sc.parallelize(Text, in)
      assert(new YieldReturn(red, kp).runToMap(rdd) == Oracle)
    }
  }

  for ((in, red, _) <- grid.filter(_._3)) {
    test(s"return-yield counter-merge wordcount in=$in red=$red") {
      val rdd = sc.parallelize(Text, in)
      val got = new ReturnYield(red).runToMap(rdd)(implicitly, implicitly)
      assert(got(0).head == Oracle)
    }
    test(s"return-return counter-merge wordcount in=$in red=$red") {
      val rdd = sc.parallelize(Text, in)
      assert(new ReturnReturn(red).runToMap(rdd)(implicitly, implicitly)(0) == Oracle)
    }
  }
}
