package graft.functions

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** The bottom-k (hash, value) pair sample behind the q195 quantile
  * sketch: state is a pure function of the input set (merge-order
  * independence, the oracle-replay requirement), collisions keep the
  * minimum value, serialization round-trips, the distributed groupBy
  * matches a sequential reference, and sample quantiles land within
  * the binomial rank bound of exact quantiles on a planted
  * distribution.
  */
class SampleAggSpec extends SparkSpec {

  private def stateOf(xs: Seq[(Long, Long)], k: Int = 8): SamplePairsState = {
    val st = new SamplePairsState(k)
    xs.foreach { case (h, v) => st.insert(h, v) }
    st
  }

  private def contents(st: SamplePairsState): Seq[(Long, Long)] =
    (0 until st.n).map(i => (st.hashes(i), st.vals(i)))

  /** Sequential reference: dedupe hashes keeping min value, k smallest. */
  private def ref(xs: Seq[(Long, Long)], k: Int = 8): Seq[(Long, Long)] =
    xs.groupBy(_._1).map { case (h, ps) => (h, ps.map(_._2).min) }
      .toSeq.sortBy(_._1).take(k)

  test("state equals the set-function reference on randomized inputs") {
    val rnd = new scala.util.Random(43)
    for (_ <- 1 to 100) {
      val xs = Seq.fill(rnd.nextInt(80))(
        (rnd.nextLong(50).abs, rnd.nextLong(1000) - 500))
      assert(contents(stateOf(xs)) == ref(xs), s"input $xs")
    }
  }

  test("merge is commutative and equals the single-pass build") {
    val rnd = new scala.util.Random(47)
    for (_ <- 1 to 60) {
      val a = Seq.fill(rnd.nextInt(60))(
        (rnd.nextLong(70).abs, rnd.nextLong(1000)))
      val b = Seq.fill(rnd.nextInt(60))(
        (rnd.nextLong(70).abs, rnd.nextLong(1000)))
      val ab = stateOf(a).mergeIn(stateOf(b))
      val ba = stateOf(b).mergeIn(stateOf(a))
      assert(contents(ab) == ref(a ++ b))
      assert(contents(ba) == ref(a ++ b))
    }
  }

  test("full-buffer rejection keeps the k smallest hashes; collision keeps min value") {
    val st = stateOf((100L to 200L).map(h => (h, h * 10)) ++ Seq((1L, 11L)))
    assert(contents(st).map(_._1) == Seq(1L, 100L, 101L, 102L, 103L, 104L, 105L, 106L))
    st.insert(500L, 0L) // past the k-th min of a full buffer
    assert(st.n == 8 && st.hashes(7) == 106L)
    st.insert(100L, 3L) // collision inside the buffer: min value wins
    assert(contents(st).contains((100L, 3L)))
    st.insert(100L, 9999L) // larger value loses
    assert(contents(st).contains((100L, 3L)))
  }

  test("serialize/deserialize round-trips the state") {
    val agg = SamplePairsAgg(
      org.apache.spark.sql.graftshim.GraftColumns.exprOf(lit(0L)),
      org.apache.spark.sql.graftshim.GraftColumns.exprOf(lit(0L)), 8)
    val rnd = new scala.util.Random(53)
    for (_ <- 1 to 30) {
      val st = stateOf(Seq.fill(rnd.nextInt(40))(
        (rnd.nextLong(30).abs, rnd.nextLong(100))))
      val back = agg.deserialize(agg.serialize(st))
      assert(contents(back) == contents(st))
    }
  }

  test("distributed groupBy matches the sequential reference per group") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    val rows = (1 to 5000).map(_ =>
      (s"g${rnd.nextInt(7)}", rnd.nextLong(300).abs, rnd.nextLong(1000)))
    val df = rows.toDF("source", "h", "v").repartition(8)
    val got = df.groupBy(col("source"))
      .agg(SamplePairsAgg.sketch(col("h"), col("v"), 8).as("pairs"))
      .as[(String, Seq[Long])].collect().toMap
    for ((g, rs) <- rows.groupBy(_._1)) {
      val want = ref(rs.map(r => (r._2, r._3)))
        .flatMap { case (h, v) => Seq(h, v) }
      assert(got(g) == want, s"group $g")
    }
  }

  test("null hash or value rows are ignored") {
    import spark.implicits._
    val df = Seq(
      (Some(3L), Some(30L)), (None, Some(1L)), (Some(1L), None),
      (Some(2L), Some(20L)))
      .toDF("h", "v").withColumn("source", lit("g"))
    val got = df.groupBy(col("source"))
      .agg(SamplePairsAgg.sketch(col("h"), col("v"), 8).as("pairs"))
      .as[(String, Seq[Long])].collect().head._2
    assert(got == Seq(2L, 20L, 3L, 30L))
  }

  test("rollup law: re-merging per-source sketch members reproduces the corpus sketch") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val docs = (1 to 3000).map(i =>
      (i.toLong, s"s${rnd.nextInt(5)}", rnd.nextInt(4000).toLong))
      .toDF("doc_id", "source", "n_chars")
    val rollup = graft.operators.Corpus.quantileRollupOf(docs)
      .filter(col("lvl") === 1L).collect().head
    // direct corpus sketch: everything in one group
    val direct = graft.operators.Corpus.quantileRollupOf(
      docs.withColumn("source", lit("one")))
      .filter(col("lvl") === 1L).collect().head
    assert(rollup.toSeq.drop(2) == direct.toSeq.drop(2),
      s"rollup $rollup vs direct $direct")
    assert(rollup.getLong(2) == 3000L && rollup.getLong(3) == 256L)
  }

  test("sample quantiles land inside the binomial rank bound on planted data") {
    import spark.implicits._
    // 20k rows, value = row index: exact pXX is XX% of N. A k=256
    // uniform sample's rank-q estimate errs by ~sqrt(q(1-q)/k) in rank
    // space; assert 5 sigma.
    val n = 20000
    val df = (1 to n).map(i => (i.toLong, i.toLong)).toDF("id", "v")
      .select(graft.operators.Corpus.hllKey(col("id").cast("string")).as("h"),
        col("v"))
      .withColumn("g", lit("all"))
    val pairs = df.groupBy(col("g"))
      .agg(SamplePairsAgg.sketch(col("h"), col("v"), 256).as("pairs"))
      .as[(String, Seq[Long])].collect().head._2
    val vals = Array.tabulate(pairs.size / 2)(i => pairs(2 * i + 1)).sorted
    val ns = vals.length
    assert(ns == 256)
    for (qnum <- Seq(50, 90, 99)) {
      val got = vals(SamplePairsAgg.rankOf(ns, qnum) - 1).toDouble / n
      val q = qnum / 100.0
      val sigma = math.sqrt(q * (1 - q) / ns)
      assert(math.abs(got - q) <= 5 * sigma,
        s"p$qnum estimate $got vs $q (sigma $sigma)")
    }
  }
}
