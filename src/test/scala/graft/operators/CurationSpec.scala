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

  test("decontaminateStats guard trip falls back to the join path with identical output") {
    // a planted mix — contaminated dup pair, clean docs, a null text —
    // run three ways: broadcast (default at this size), count-gate
    // tripped (ceiling 3 < 10 distinct bench grams), byte-gate tripped.
    // All three must agree row-for-row: the guard swaps plans, never
    // answers.
    val bench = docsDF(
      (0L until 10L).map(i => (i, "bench", s"a$i b$i c$i d$i")) :+
        (99L, "bench", "alpha beta gamma delta epsilon"))
    val corpus = docsDF(Seq(
      (1L, "s1", "noise one beta gamma delta epsilon noise two"),
      (2L, "s1", "noise one beta gamma delta epsilon noise two"), // exact dup: collapse must re-weight
      (3L, "s1", "zzz beta gamma delta qqq rrr sss ttt"),
      (4L, "s2", "beta gamma delta"),
      (5L, "s2", null)))
    val viaBroadcast = decollect(Curation.decontaminateStats(corpus, bench))
    val viaCountTrip = decollect(
      Curation.decontaminateStats(corpus, bench, maxBenchmarkGrams = 3))
    val viaByteTrip = decollect(
      Curation.decontaminateStats(corpus, bench, maxBenchmarkGramBytes = 8L))
    assert(viaBroadcast == Map("s1" -> (3L, 2L, 1L), "s2" -> (2L, 0L, 2L)))
    assert(viaCountTrip == viaBroadcast)
    assert(viaByteTrip == viaBroadcast)
  }

  test("decontaminateStats forced paths agree on the sf0.001 corpus") {
    // the real q58 split, both plans forced explicitly — fallback
    // equivalence at data scale, not just on a planted fixture
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("text"))
    val corpus = docs.filter(col("doc_id") % Curation.BenchmarkMod =!= 0)
    val bench = docs.filter(col("doc_id") % Curation.BenchmarkMod === 0)
    val viaB = decollect(Curation.decontaminateStats(
      corpus, bench, forceJoinPath = Some(false)))
    val viaJ = decollect(Curation.decontaminateStats(
      corpus, bench, forceJoinPath = Some(true)))
    assert(viaB == viaJ)
    assert(viaB.values.map(_._1).sum > 0)
  }

  test("pmiScores ranks exclusive collocations above frequent-token pairs") {
    // "zig zag": both tokens appear ONLY in this pair, 5 times ->
    // ratio = 5N/25 = N/5. "the cat": the/cat each appear 10x but
    // co-occur 5x -> ratio = 5N/100 = N/20. filler inflates N only.
    val docs = docsDF(
      (1L to 5L).map(i => (i, "s", "zig zag")) ++
        (6L to 10L).map(i => (i, "s", "the cat")) ++
        (11L to 15L).map(i => (i, "s", "cat the")) ++
        Seq((16L, "s", (1 to 10).map(j => s"w$j").mkString(" "))))
      .select(col("text"))
    val rows = Curation.pmiScores(docs).collect()
    val byPair = rows.map(r => r.getAs[String]("pair") ->
      ((r.getAs[Long]("cxy"), r.getAs[Double]("pmi_ratio")))).toMap
    val n = 5 * 2 + 10 * 2 + 10 // 40 tokens total
    assert(byPair("zig zag") == ((5L, 5.0 * n / 25.0)))
    assert(byPair("the cat") == ((5L, 5.0 * n / 100.0)))
    assert(byPair("zig zag")._2 > byPair("the cat")._2)
    // sub-floor pairs (the filler's w1 w2 ... singletons) are absent
    assert(!byPair.contains("w1 w2"))
  }

  test("containmentStats: a quote flags by RATIO where any-overlap would just flag") {
    // benchmark doc: 12 tokens -> 8 distinct 5-grams
    val bench = docsDF(Seq(
      (0L, "bench", "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu")))
    val corpus = docsDF(Seq(
      // quotes the first 9 tokens: 5 of 8 bench grams -> containment 0.625
      (1L, "s1", "padding words here alpha beta gamma delta epsilon zeta eta theta iota"),
      // shares only a 4-token run: zero complete 5-grams -> containment 0
      (2L, "s1", "noise alpha beta gamma delta noise two three four five six"),
      // unrelated
      (3L, "s2", "completely different content about query engines and storage")))
    val got = Curation.containmentStats(corpus, bench, threshold = 0.5)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_flagged"), r.getAs[Double]("max_containment")))).toMap
    assert(got("s1")._1 == 1L)
    assert(math.abs(got("s1")._2 - 0.625) < 1e-12)
    assert(got("s2") == ((0L, 0.0)))
  }

  test("containmentStats: full verbatim copy scores 1.0; empty benchmark flags nothing") {
    val benchText = "alpha beta gamma delta epsilon zeta eta theta"
    val bench = docsDF(Seq((0L, "bench", benchText)))
    val got = Curation.containmentStats(
      docsDF(Seq((1L, "s1", "prefix words " + benchText + " suffix"))), bench)
      .collect().head
    assert(got.getAs[Double]("max_containment") == 1.0)
    assert(got.getAs[Long]("n_flagged") == 1L)
    val none = Curation.containmentStats(
      docsDF(Seq((1L, "s1", benchText))),
      docsDF(Seq.empty[(Long, String, String)])).collect().head
    assert(none.getAs[Long]("n_flagged") == 0L)
    assert(none.getAs[Double]("max_containment") == 0.0)
  }

  test("containmentStats guard trip falls back to the inverted join with identical output") {
    // mixed fixture — full quote (containment 1.0), partial overlap,
    // no overlap, an exact dup pair, a null — scored by the broadcast
    // path, the tripped guard (ceiling 3), and both forced paths; all
    // must agree including the DOUBLE max_containment (same single
    // IEEE division on both plans)
    val bench = docsDF(Seq(
      (0L, "bench", "alpha beta gamma delta epsilon"),
      (1L, "bench", "one two three four five six seven")))
    val corpus = docsDF(Seq(
      (1L, "s1", "pre alpha beta gamma delta epsilon post"), // quotes all of bench 0
      (2L, "s1", "pre alpha beta gamma delta epsilon post"), // exact dup: weight 2
      (3L, "s1", "one two three unrelated tail words here xx"), // partial vs bench 1
      (4L, "s2", "totally disjoint text with no overlap at all"),
      (5L, "s2", null)))
    def run(maxGrams: Int, force: Option[Boolean]) =
      Curation.containmentStats(corpus, bench,
        maxBenchmarkGrams = maxGrams, forceJoinPath = force)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSeq
    val viaBroadcast = run(Curation.MaxBenchmarkGrams, None)
    assert(viaBroadcast.map(t => (t._1, t._2, t._3, t._4)) ==
      Seq(("s1", 3L, 2L, 1L), ("s2", 2L, 0L, 2L)))
    assert(viaBroadcast.head._5 == 1.0) // the full quote
    assert(run(3, None) == viaBroadcast) // tripped guard
    assert(run(Curation.MaxBenchmarkGrams, Some(true)) == viaBroadcast)
    assert(run(Curation.MaxBenchmarkGrams, Some(false)) == viaBroadcast)
  }

  test("q75 plants data-dependent quotes: flagged and clean both non-empty") {
    val rows = Curation.q75Containment(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    var flagged = 0L; var docs = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("n_flagged") + r.getAs[Long]("n_clean"))
      flagged += r.getAs[Long]("n_flagged"); docs += r.getAs[Long]("n_docs")
    }
    assert(flagged > 0L && flagged < docs)
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

  test("sourceQuota cap <= 0 keeps nothing, matching the naive window") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("text"))
    for (cap <- Seq(0, -1)) {
      assert(Curation.sourceQuota(docs, cap = cap).count() == 0L, s"cap=$cap")
      assert(Curation.sourceQuotaNaive(docs, cap = cap).count() == 0L, s"cap=$cap")
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

  test("spanDedupStats counts shared and self-repeated spans, zero for short docs") {
    val span = (0 until 16).map(i => s"s$i").mkString(" ")
    val docs = docsDF(Seq(
      // docs 1 and 2 share one verbatim 16-token span (1 dup gram each)
      (1L, "a", s"one two three $span"),
      (2L, "a", s"$span other tail words here"),
      // doc 3 repeats ITS OWN span twice -> both occurrences are dups
      (3L, "a", s"$span $span"),
      // doc 4 is shorter than the span -> zero grams
      (4L, "a", "tiny doc under sixteen tokens")))
    val got = Curation.spanDedupStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1: 19 tokens -> 4 grams; exactly 1 (the span) is shared
    assert(got(1L)._1 == 4L && got(1L)._2 == 1L, got(1L).toString)
    // doc 2: 20 tokens -> 5 grams, 1 shared
    assert(got(2L)._1 == 5L && got(2L)._2 == 1L, got(2L).toString)
    // doc 3: 32 tokens -> 17 grams; gram 0 and gram 16 are identical
    // (the span) AND shared with docs 1/2 -> at least those 2 are dups
    assert(got(3L)._1 == 17L && got(3L)._2 >= 2L, got(3L).toString)
    assert(got(4L) == ((0L, 0L)))
  }

  test("spanCoverage merges overlapping dup windows into token coverage") {
    val span = (0 until 16).map(i => s"s$i").mkString(" ")
    val wide = (0 until 17).map(i => s"x$i").mkString(" ")
    val docs = docsDF(Seq(
      // docs 1/2 share one verbatim 16-token span
      (1L, "a", s"one two three $span"), // span at pos 3: covers 16 of 19
      (2L, "a", s"$span other tail words here"), // 16 of 20
      // doc 3 = span twice: dup grams at pos 0 and 16 cover ALL 32 tokens
      (3L, "a", s"$span $span"),
      // doc 4 shorter than the window: zero grams, zero coverage
      (4L, "a", "tiny doc under sixteen tokens"),
      // docs 5/6 share a 17-token span: TWO overlapping dup grams that
      // must merge to 17 covered tokens, not 32 (the q64-vs-q82 case)
      (5L, "a", wide),
      (6L, "a", s"pad $wide")))
    val got = Curation.spanCoverage(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((19L, 16L)), got(1L).toString)
    assert(got(2L) == ((20L, 16L)), got(2L).toString)
    assert(got(3L) == ((32L, 32L)), got(3L).toString)
    assert(got(4L) == ((5L, 0L)), got(4L).toString)
    assert(got(5L) == ((17L, 17L)), got(5L).toString)
    assert(got(6L) == ((18L, 17L)), got(6L).toString)
    // and the ratio column is the exact double division
    val r5 = Curation.spanCoverage(docs).collect()
      .find(_.getLong(0) == 6L).get.getDouble(3)
    assert(r5 == 17.0 / 18.0)
  }

  test("spanCoverage shuffles the gram stream once (cached gh-partitioned aggregate)") {
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"))
    val out = Curation.spanCoverage(docs)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // both consumers must hit the persisted per-(gh, doc) aggregate
    // (a cache MISS on either branch re-runs the tokenizing flatMap
    // and the wide exchange — the exact regression this pins)
    val scans = "InMemoryTableScan".r.findAllIn(plan).size
    assert(scans >= 2, s"expected both branches cached, got $scans scans")
    // ...and there is exactly ONE underlying gram-wide exchange: the
    // explicit repartition(gh) inside the cached plan. Its print
    // repeats (final/initial, once per scan) but always with one of at
    // most two plan_ids; a cache miss would mint a third.
    val ids = raw"REPARTITION_BY_COL, \[plan_id=(\d+)\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(ids.nonEmpty && ids.size <= 2, s"gh exchange ids: $ids")
  }

  test("spanDedupStats shuffles the gram stream once (AQE reuses the gh exchange)") {
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"))
    val out = Curation.spanDedupStats(docs)
    out.collect()
    // both aggregation branches and the join hang off ONE
    // hashpartitioning(gh) exchange in the final adaptive plan
    assert(out.queryExecution.executedPlan.toString.contains("ReusedExchange"))
  }

  test("unigramQuality scores by corpus frequency with OOV scoring zero") {
    // counts: a=4, b=2, c=1; tableSize 2 keeps {a, b}; c scores 0
    val docs = docsDF(Seq(
      (1L, "s", "a a b c"),
      (2L, "s", "a a b")))
    val got = Curation.unigramQuality(docs, tableSize = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((4L, 4L + 4L + 2L + 0L, 10.0 / 4.0)))
    assert(got(2L) == ((3L, 4L + 4L + 2L, 10.0 / 3.0)))
  }

  test("unigramQuality excludes zero-token documents") {
    val docs = docsDF(Seq((1L, "s", "a b"), (2L, "s", "")))
    val got = Curation.unigramQuality(docs, tableSize = 5).collect()
    assert(got.map(_.getLong(0)).toSet == Set(1L))
  }

  test("pairCounts ranks adjacent pairs count-desc with pair-asc tie-break") {
    import spark.implicits._
    val docs = docsDF(Seq(
      (1L, "s", "x y x y x"), // "x y" x2, "y x" x2
      (2L, "s", "z w")))      // "z w" x1
    val got = Curation.pairCounts(docs, k = 3).as[(String, Long)].collect().toSeq
    assert(got == Seq(("x y", 2L), ("y x", 2L), ("z w", 1L)))
  }

  test("temperatureResample: a whole-corpus group keeps everything; skew flattens") {
    import spark.implicits._
    // single group: share 1.0 -> k = 65536 -> keep-all branch
    val one = docsDF((0L until 40L).map(i => (i, "s", s"doc number $i")))
      .withColumnRenamed("source", "lang")
    val r1 = Curation.temperatureResample(one).collect().head
    assert(r1.getAs[Long]("n_docs") == 40L && r1.getAs[Long]("n_kept") == 40L)
    assert(r1.getAs[Double]("keep_rate") == 1.0)
    // skewed groups: keep_rate is sqrt(share), so the minority group's
    // rate is HIGHER than its share (flattening) and the majority's lower
    val skew = docsDF(
      (0L until 90L).map(i => (i, "big", s"maj doc $i")) ++
        (100L until 110L).map(i => (i, "small", s"min doc $i")))
      .withColumnRenamed("source", "lang")
    val rows = Curation.temperatureResample(skew).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Double]("keep_rate")).toMap
    assert(math.abs(rows("big") - math.sqrt(0.9)) < 1e-4)
    assert(math.abs(rows("small") - math.sqrt(0.1)) < 1e-4)
    assert(rows("small") > 0.1 && rows("big") < 0.95)
  }

  test("curation pipeline composes: gate, dedup, quota, rollup") {
    // build a sf-independent fixture through the same binding the
    // driver uses, via a temp view-free direct call on a tiny frame
    val twelve = (0 until 12).map(i => s"w$i").mkString(" ")
    val docs = docsDF(Seq(
      (1L, "a", twelve),            // survives
      (2L, "a", twelve),            // exact dup of 1 -> dropped
      (3L, "a", "too short"),       // gated out (<10 tokens)
      (4L, "b", (0 until 90).map(i => s"x$i").mkString(" ")), // gated out (>80)
      (5L, "b", (0 until 15).map(i => s"y$i").mkString(" ")))) // survives
    import spark.implicits._
    // inline replica of q68's stages over an arbitrary frame
    val gated = docs
      .withColumn("n_tok",
        size(filter(split(col("text"), " "), t => t =!= "")).cast("long"))
      .filter(col("n_tok").between(10L, 80L))
    val reps = gated.groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
    val deduped = gated.join(reps, "doc_id")
    val capped = Curation.sourceQuota(
      deduped.select(col("doc_id"), col("source"), col("text")), cap = 10)
    val got = capped.join(gated.select(col("doc_id"), col("n_tok")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tokens"))
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got == Map("a" -> ((1L, 12L)), "b" -> ((1L, 15L))))
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

  test("q97 composed report carries all three detectors with live signal") {
    val rows = Curation.q97ContaminationReport(spark, d)
      .collect()
      .map(r => r.getAs[String]("detector") ->
        ((r.getAs[Long]("n_checked"), r.getAs[Long]("n_flagged"))))
      .toMap
    assert(rows.keySet == Set("containment", "embedding", "ngram"))
    // every leg checked a non-trivial population; the planted legs
    // (q58's %97 benchmark grams, q75's planted quotes) must flag > 0
    assert(rows.values.forall(_._1 > 0))
    assert(rows("ngram")._2 > 0 && rows("containment")._2 > 0)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** doc_ids landing on the train / eval side of the md5 half-split
    * shared by noveltyProfile and Scoring. */
  private def noveltyIds(train: Boolean, n: Int): Seq[Long] =
    Iterator.iterate(0L)(_ + 1)
      .filter(id => (md5hex(id.toString).head < '8') == train)
      .take(n).toSeq

  test("noveltyProfile counts seen gram occurrences exactly and drops sub-n docs") {
    val trainIds = noveltyIds(train = true, 2)
    val evalIds = noveltyIds(train = false, 4)
    // train grams (trigrams): {"a b c", "b c d"} from doc 0; doc 1
    // duplicates doc 0 — the distinct train set must not double-count
    val docs = docsDF(Seq(
      (trainIds.head, "s0", "a b c d"),
      (trainIds(1), "s0", "a b c d"),
      // eval doc: 4 grams, "a b c" twice (both occurrences must count
      // as seen — tf grain), "c a b" and "b c a" never trained
      (evalIds.head, "s0", "a b c a b c"),
      // eval doc fully memorized: 2 grams, both trained
      (evalIds(1), "s1", "a b c d"),
      // sub-trigram docs: no grams -> absent from every count
      (evalIds(2), "s2", "a b"),
      (evalIds(3), "s2", "")))
    val rows = Curation.noveltyProfile(docs.select(
        col("doc_id"), col("source"), col("text")))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // s0: eval doc has grams [a b c, b c a, c a b, a b c] -> 4 total,
    // 2 seen (the two "a b c"), not memorized (2*2 >= 4 -> memorized!)
    // seen*2 >= total holds at exactly half -> n_memorized = 1
    assert(rows("s0") === ((1L, 4L, 2L, 1L, ((4L - 2L) * 1000000L) / 4L)))
    // s1: 2 grams, 2 seen, memorized, novelty 0
    assert(rows("s1") === ((1L, 2L, 2L, 1L, 0L)))
    // s2 produced no grams at all -> no row
    assert(!rows.contains("s2"))
  }

  test("noveltyProfile is invariant to input partitioning") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val a = Curation.noveltyProfile(docs)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    val b = Curation.noveltyProfile(docs.repartition(7))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(a === b)
    assert(a.nonEmpty && a.forall(r => r._4 <= r._3 && r._6 >= 0))
  }
}
