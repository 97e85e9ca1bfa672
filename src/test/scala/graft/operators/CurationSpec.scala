package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Curation batch-2 operators (q58-q62). All five are hash-checked
  * against DuckDB by the driver; these specs pin the properties the
  * oracle can't see — planted contamination/clean cases, the chunk
  * formula's edges, quota determinism under repartitioning, and the
  * two-phase prefix sum's partition-count invariance (the load-bearing
  * scale claim of the packing operator).
  */
class CurationSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def docsDF(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  test("decontaminateStats flags planted 4-gram overlap and nothing else") {
    // the benchmark is its OWN frame (the operator API — the doc_id-mod
    // split lives only in the q58 driver binding); doc 1 repeats one of
    // its 4-grams verbatim mid-document; doc 2 shares only a 3-gram
    // run; doc 3 is too short to carry any 4-gram
    val bench = docsDF(Seq(
      (0L, "bench", "alpha beta gamma delta epsilon")))
    val corpus = docsDF(Seq(
      (1L, "s1", "noise one beta gamma delta epsilon noise two"),
      (2L, "s1", "zzz beta gamma delta qqq rrr sss ttt"),
      (3L, "s2", "beta gamma delta")))
    val got = decollect(Curation.decontaminateStats(corpus, bench))
    assert(got == Map(
      "s1" -> (2L, 1L, 1L),
      "s2" -> (1L, 0L, 1L)))
  }

  test("decontaminateStats: empty benchmark split contaminates nothing") {
    val corpus = docsDF(Seq(
      (1L, "s1", "alpha beta gamma delta epsilon"),
      (2L, "s1", "alpha beta gamma delta epsilon")))
    val bench = docsDF(Seq.empty[(Long, String, String)])
    val got = decollect(Curation.decontaminateStats(corpus, bench))
    assert(got == Map("s1" -> (2L, 0L, 2L)))
  }

  test("decontaminateStats fails fast on a corpus-sized benchmark frame") {
    // 10 distinct 4-grams against a ceiling of 3: the guard must trip
    // BEFORE an unbounded driver collect, with an actionable message
    val corpus = docsDF(Seq((1L, "s1", "alpha beta gamma delta")))
    val bigBench = docsDF(
      (0L until 10L).map(i => (i, "bench", s"a$i b$i c$i d$i")))
    val e = intercept[IllegalArgumentException](
      Curation.decontaminateStats(corpus, bigBench, maxBenchmarkGrams = 3))
    assert(e.getMessage.contains("corpus-sized"))
  }

  private def decollect(df: DataFrame): Map[String, (Long, Long, Long)] =
    df.collect().map(r => r.getAs[String]("source") ->
      ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_contaminated"),
        r.getAs[Long]("n_clean")))).toMap

  test("vocabCoverage counts OOV mass exactly against the top-k vocabulary") {
    // 3 distinct tokens, vocabSize 2: "a" (x4) and "b" (x2) are in
    // vocabulary; "c" (x1) is OOV
    val docs = docsDF(Seq(
      (1L, "s1", "a a b c"),
      (2L, "s1", "a a b")))
    val got = Curation.vocabCoverage(docs, vocabSize = 2).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_docs") == 2L)
    assert(r.getAs[Long]("sum_tokens") == 7L)
    assert(r.getAs[Long]("sum_oov") == 1L)
    assert(r.getAs[Double]("oov_rate") == 1.0 / 7.0)
  }

  test("vocabCoverage ties break token-asc (deterministic vocabulary)") {
    // b and c tie at 2; vocabSize 2 with a(x3) keeps {a, b}, so the two
    // c's are OOV
    val docs = docsDF(Seq((1L, "s1", "a a a b b c c")))
    val r = Curation.vocabCoverage(docs, vocabSize = 2).collect().head
    assert(r.getAs[Long]("sum_oov") == 2L)
  }

  test("chunk formula edges: fits-exactly, one-over, empty, long") {
    import spark.implicits._
    val docs = docsDF(Seq(
      (1L, "s", Seq.fill(32)("t").mkString(" ")), // exactly one window
      (2L, "s", Seq.fill(33)("t").mkString(" ")), // one token over
      (3L, "s", ""), // empty doc still emits one (empty) chunk
      (4L, "s", (0 until 80).map(i => s"w$i").mkString(" "))))
    val got = Curation.chunk(docs)
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

    assert(got(1L).toSeq == Seq((1L, 0L, 0L, 32L, "t")))
    assert(got(2L).toSeq == Seq((2L, 0L, 0L, 32L, "t"), (2L, 1L, 24L, 9L, "t")))
    assert(got(3L).toSeq == Seq((3L, 0L, 0L, 0L, null)))
    // 80 tokens: ceil(48/24)+1 = 3 windows at 0/24/48, all full
    assert(got(4L).toSeq == Seq(
      (4L, 0L, 0L, 32L, "w0"), (4L, 1L, 24L, 32L, "w24"),
      (4L, 2L, 48L, 32L, "w48")))
  }

  test("chunk windows tile the document: strides cover every token") {
    import spark.implicits._
    val rows = Curation.q60Chunk(spark, d)
      .as[(Long, Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      // chunk 0 starts at 0; consecutive starts differ by the stride
      assert(sorted.head._3 == 0L, s"doc $id")
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(b._3 - a._3 == Curation.ChunkStride.toLong, s"doc $id")
        // overlap: next window starts before this one ends
        assert(b._3 < a._3 + a._4, s"doc $id windows must overlap")
      }
      // only the final window may be short
      sorted.init.foreach(c => assert(c._4 == Curation.ChunkSize.toLong))
    }
  }

  test("sourceQuota keeps exactly cap docs per source and is repartition-stable") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("text"))
    val kept = Curation.sourceQuota(docs, cap = 5)
      .as[(Long, String, Long)].collect()
    val bySource = kept.groupBy(_._2)
    bySource.foreach { case (src, rs) =>
      assert(rs.length <= 5, src)
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq, src)
    }
    // membership is a pure function of content: same kept set after a
    // physical reshuffle of the input
    val kept2 = Curation.sourceQuota(docs.repartition(13), cap = 5)
      .as[(Long, String, Long)].collect()
    assert(kept.sortBy(_._1).toSeq == kept2.sortBy(_._1).toSeq)
  }

  test("sourceQuota two-phase pre-prune is row-identical to the naive window") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("text"))
    for (parts <- Seq(1, 13)) {
      val input = docs.repartition(parts)
      val fast = Curation.sourceQuota(input, cap = 5)
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
      val naive = Curation.sourceQuotaNaive(input, cap = 5)
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
      assert(fast == naive, s"parts=$parts")
    }
  }

  test("packSequences matches a sequential fold oracle and is partition-invariant") {
    import spark.implicits._
    // deterministic pseudo-random token counts, including one doc
    // longer than the budget (spans sequences -> a seq_id gap)
    val docs = (0L until 200L).map { id =>
      val n = ((id * 2654435761L) % 97 + 3).toInt
      (id, "s", Seq.fill(n)("t").mkString(" "))
    }.updated(50, (50L, "s", Seq.fill(700)("t").mkString(" ")))
    val df = docsDF(docs)

    // driver-side oracle: plain sequential fold in doc_id order
    val budget = 256
    var cum = 0L
    val expect = collection.mutable.Map.empty[Long, (Long, Long, Long, Long)]
    docs.sortBy(_._1).foreach { case (id, _, text) =>
      val n = text.split(" ").count(_.nonEmpty).toLong
      val seq = cum / budget
      val (nd, nt, fd, ld) = expect.getOrElse(seq, (0L, 0L, Long.MaxValue, Long.MinValue))
      expect(seq) = (nd + 1, nt + n, math.min(fd, id), math.max(ld, id))
      cum += n
    }

    def run(input: DataFrame): Map[Long, (Long, Long, Long, Long)] =
      Curation.packSequences(input, budget)
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

    val got1 = run(df.repartition(1))
    val got7 = run(df.repartition(7))
    assert(got1 == expect.toMap)
    // the two-phase prefix sum must be invariant to input partitioning
    assert(got7 == expect.toMap)
    // the planted long doc forces a skipped seq_id
    val ids = expect.keys.toSeq.sorted
    assert(ids.zip(ids.tail).exists { case (a, b) => b - a > 1 },
      "fixture should produce a seq_id gap")
  }

  test("packSequences conserves tokens and docs") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"))
    val packed = Curation.q62PackSequences(spark, d).collect()
    val totalToks = docs.select(
      sum(size(filter(split(col("text"), " "), t => t =!= "")).cast("long")))
      .head().getLong(0)
    assert(packed.map(_.getAs[Long]("n_tokens")).sum == totalToks)
    assert(packed.map(_.getAs[Long]("n_docs")).sum == docs.count())
  }
}
