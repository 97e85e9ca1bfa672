package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Counter-monoid aggregator (SURVEY.md §7.3 milestone 6): merges
  * word->count maps associatively — the engine-level form of the
  * reference's in-mapper-combining idiom (docs.rst:197-283), where each
  * mapper emits one `collections.Counter` per block and the reducer
  * folds them. As a Spark `Aggregator` the partial merge happens
  * map-side automatically, which is the entire point of the idiom.
  */
class CounterMerge[IN](extract: IN => IterableOnce[String])(
    implicit enc: Encoder[Map[String, Long]])
    extends Aggregator[IN, Map[String, Long], Map[String, Long]] {

  def zero: Map[String, Long] = Map.empty

  def reduce(acc: Map[String, Long], x: IN): Map[String, Long] =
    extract(x).iterator.foldLeft(acc) { (a, w) => a.updated(w, a.getOrElse(w, 0L) + 1L) }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val (small, large) = if (a.size < b.size) (a, b) else (b, a)
    small.foldLeft(large) { case (acc, (w, n)) => acc.updated(w, acc.getOrElse(w, 0L) + n) }
  }

  def finish(acc: Map[String, Long]): Map[String, Long] = acc

  def bufferEncoder: Encoder[Map[String, Long]] = enc
  def outputEncoder: Encoder[Map[String, Long]] = enc
}
