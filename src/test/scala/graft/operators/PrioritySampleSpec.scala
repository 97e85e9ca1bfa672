package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** q201 priority sampling: distributed output equals a sequential
  * reference implementation row-for-row, small sources are exact by
  * construction, the result is invariant under repartitioning, and
  * the subset-sum estimate respects the DLT error bound on planted
  * data.
  */
class PrioritySampleSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def docs(rows: Seq[(Long, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "n_chars")
  }

  /** Sequential reference: same integer priorities, same estimator. */
  private def ref(rows: Seq[(Long, String, Long)], k: Int = Curation.PriorityK)
      : Map[String, (Long, Long, Long, Long, Long)] = {
    val dom = BigInt(1) << 60
    def hash(id: Long): Long =
      BigInt(java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).take(8).map("%02x".format(_))
        .mkString.take(15), 16).toLong
    rows.filter(_._3 > 0).groupBy(_._2).map { case (src, rs) =>
      val trips = rs.map { case (id, _, w) =>
        val h = hash(id); ((h + 1) / w, h, w)
      }.sorted
      val nDocs = rs.size.toLong
      val wTot = rs.map(_._3).sum
      if (trips.size <= k)
        src -> ((nDocs, wTot, trips.size.toLong, 0L, trips.map(_._3).sum))
      else {
        val tau = trips(k)._1
        val kept = trips.take(k)
        val e =
          if (tau == 0L) kept.map(_._3).sum
          else (kept.map { case (_, _, w) =>
            val wt = BigInt(w) * tau
            if (wt > dom) wt else dom
          }.sum / tau).toLong
        src -> ((nDocs, wTot, k.toLong, tau, e))
      }
    }
  }

  private def run(df: DataFrame): Map[String, (Long, Long, Long, Long, Long)] =
    Curation.prioritySampleOf(df).collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap

  test("distributed output equals the sequential reference row-for-row") {
    val rnd = new scala.util.Random(67)
    val rows = (1 to 2000).map(i =>
      (i.toLong, s"s${rnd.nextInt(4)}", 1L + rnd.nextInt(5000)))
    val got = run(docs(rows).repartition(8))
    val want = ref(rows)
    assert(got.keySet == want.keySet)
    for ((k, v) <- want) assert(got(k) == v, s"source $k")
  }

  test("sources with <= k rows are exact; zero-weight rows are excluded") {
    val small = (1 to 10).map(i => (i.toLong, "tiny", 100L + i)) ++
      Seq((99L, "tiny", 0L)) // weight 0: filtered, never divides
    val got = run(docs(small))
    val (nDocs, wTot, nSample, tau, est) = got("tiny")
    assert(nDocs == 10L && nSample == 10L && tau == 0L)
    assert(est == wTot && wTot == (1 to 10).map(100L + _).sum)
  }

  test("repartitioning never changes the sample or the estimate") {
    val rnd = new scala.util.Random(71)
    val rows = (1 to 1500).map(i =>
      (i.toLong, s"s${rnd.nextInt(3)}", 1L + rnd.nextInt(900)))
    val a = run(docs(rows).repartition(2))
    val b = run(docs(rows).repartition(17))
    assert(a == b)
  }

  test("the estimate lands inside the DLT error bound on planted weights") {
    // one source, 20000 docs, weights 1..20000: W ~ 2e8. DLT stderr
    // <= W/sqrt(k-1); assert 5 sigma.
    val rows = (1 to 20000).map(i => (i.toLong, "web", i.toLong))
    val (_, wTot, _, _, est) = run(docs(rows))("web")
    val sigma = wTot.toDouble / math.sqrt(Curation.PriorityK - 1.0)
    assert(math.abs(est.toDouble - wTot.toDouble) <= 5 * sigma,
      s"est $est vs $wTot (sigma $sigma)")
  }
}
