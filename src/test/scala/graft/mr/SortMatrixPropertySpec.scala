package graft.mr

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck laws for the S6 sort-selection matrix (SURVEY.md §1.3/§5):
  * for generated keyed data and every flag combination, each key's value
  * list must equal the stdlib oracle — groupBy + the matrix-selected
  * stable sort. (Raw scalacheck generators with fixed seeds; the
  * scalatest bridge artifact isn't in the offline cache.)
  */
object PropertyTasks {
  final class MatrixTask(withValue: Boolean, reverse: Boolean, emitSort: Boolean)
      extends MapReduce[(Int, Int, Int), Int, Int, Int] {
    override def numPartitions: Int = 1
    override def sortMapWithValue: Boolean = withValue
    override def sortMapReverse: Boolean = reverse
    override def sortOrdering: Ordering[Int] = Ordering.Int
    override def valueOrdering: Ordering[Int] = Ordering.Int
    def mapper(r: (Int, Int, Int)): IterableOnce[Emit[Int, Int, Int]] =
      Iterator.single(if (emitSort) KSV(r._1, r._2, r._3) else KV(r._1, r._3))
    def reducer(key: Int, values: Seq[Int]): IterableOnce[Emit[Int, Int, Int]] =
      values.iterator.map(v => KV(key, v))
  }
}

class SortMatrixPropertySpec extends SparkSpec {
  import PropertyTasks._

  private val rowGen = for {
    k <- Gen.choose(0, 3)
    s <- Gen.choose(-5, 5)
    v <- Gen.choose(-100, 100)
  } yield (k, s, v)

  private val dataGen = Gen.listOfN(40, rowGen)

  /** stdlib oracle: groupBy key then the S6-selected stable sort; reverse
    * = stable sort under the reversed ordering (Python list.sort
    * reverse=True semantics: ties keep arrival order).
    */
  private def oracle(
      data: List[(Int, Int, Int)], withValue: Boolean,
      reverse: Boolean, emitSort: Boolean): Map[Int, List[Int]] =
    data.groupBy(_._1).view.mapValues { rows =>
      val ord: Option[Ordering[(Int, Int, Int)]] = (emitSort, withValue) match {
        case (true, true)   => Some(Ordering.by(r => (r._2, r._3)))
        case (true, false)  => Some(Ordering.by(_._2))
        case (false, true)  => Some(Ordering.by(_._3))
        case (false, false) => None
      }
      ord.fold(rows)(o => rows.sorted(if (reverse) o.reverse else o)).map(_._3)
    }.toMap

  for {
    withValue <- Seq(false, true)
    reverse <- Seq(false, true)
    emitSort <- Seq(false, true)
  } test(s"S6 law: withValue=$withValue reverse=$reverse sortElement=$emitSort") {
    // 20 deterministic generated datasets per flag combination
    val datasets = (1 to 20).map { i =>
      dataGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
    }
    // run all datasets through Spark in one distributed job per combo
    val task = new MatrixTask(withValue, reverse, emitSort)
    for ((data, i) <- datasets.zipWithIndex) {
      val got = task.runToMap(sc.parallelize(data, 1))
      val want = oracle(data, withValue, reverse, emitSort)
      assert(got == want, s"seed=${i + 1} data=$data")
    }
  }
}
