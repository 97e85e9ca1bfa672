package graft.operators

import graft.SparkEntry
import graft.mr.SparkSpec
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan regression tests: these pin the *scale* properties —
  * pushdown, pruning, broadcast selection, top-k short-circuit, map-side
  * partial aggregation — so a refactor that silently de-optimizes a plan
  * fails CI, not the 100 TB run.
  */
class PlanSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, d)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q02: filters are pushed to the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("GreaterThanOrEqual(l_quantity,45.0)"), p)
    assert(p.contains("GreaterThan(l_discount,0.05)"), p)
  }

  test("q02: scan schema is pruned to referenced columns only") {
    val p = plan("q02_filter_project")
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("l_shipdate"), readSchema)
    assert(!readSchema.contains("l_returnflag"), readSchema)
  }

  test("q03/q04: dimension joins are broadcast") {
    assert(plan("q03_join_agg").contains("BroadcastHashJoin"))
    val p4 = plan("q04_join_multi")
    assert(p4.contains("BroadcastHashJoin"), p4)
  }

  test("q10: global top-k plans as TakeOrderedAndProject (no full sort)") {
    assert(plan("q10_topk_orders").contains("TakeOrderedAndProject"))
  }

  test("q01/q14: aggregation is partial+final (map-side combine)") {
    assert(plan("q01_pricing_summary").contains("partial_sum"))
    assert(plan("q14_wordcount").contains("partial_count"))
  }

  test("q23: probe filter is pushed into the embeddings scan") {
    assert(plan("q23_knn_brute").contains("LessThan(vec_id,10)"))
  }

  test("q05/q06: semi/anti joins plan as join operators, not subquery loops") {
    assert(plan("q05_semi_join").contains("LeftSemi"))
    assert(plan("q06_anti_join").contains("LeftAnti"))
  }

  test("q07: per-group top-k prunes with WindowGroupLimit before the full window") {
    assert(plan("q07_window_topk").contains("WindowGroupLimit"))
  }

  test("q51: single-pass repetition stats — one exchange (final sort), pruned scan") {
    val p = plan("q51_quality_repetition")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"q51 plans $exchanges exchanges:\n$p")
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("lang") && !readSchema.contains("n_chars"), readSchema)
  }

  test("q52: tf and df both reuse the cached per-(tok,doc) pre-aggregate") {
    val p = plan("q52_term_scores")
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2, p)
    assert(p.contains("WindowGroupLimit"), p) // top-3 prunes before the full window
  }

  test("q55: top-10 by sketch estimate plans as TakeOrderedAndProject (no full sort)") {
    assert(plan("q55_heavy_hitters").contains("TakeOrderedAndProject"))
  }

  test("q22: zero-shuffle probe — no join exchanges, only the tiny top-k window") {
    // the probe gram sets ride the closure (bounded driver collect), so
    // the scoring pass over the corpus must plan with NO join and NO
    // exchange other than the window/order over the small scored frame
    val p = plan("q22_ngram_jaccard")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
    // formatted explain lists each node twice (tree + detail section),
    // so count only the numbered detail headers
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"q22 plans $exchanges exchanges:\n$p")
  }

  test("q107: the query-term probe broadcasts — the corpus tf frame is never re-shuffled by a join") {
    val p = plan("q107_bm25_search")
    // every join in the plan must be broadcast-built (term probe, df
    // attach, totals); a SortMergeJoin would mean the corpus-sized tf
    // frame re-exchanged on the probe path. The dl attach join is
    // allowed either way (slate x per-doc lengths, AQE's call).
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"corpus frame re-shuffled by a sort-merge join:\n$p")
  }

  test("q109: the successor window is per-bucket, never a single global partition") {
    val p = plan("q109_truncation_dups")
    assert(p.contains("Window"), p)
    // the window's exchange hashes on the bucket key — the only
    // SinglePartition exchanges in this plan are the one-row scalar
    // aggregate (the max(doc_id)+1 id shift), never the window input
    assert(p.contains("hashpartitioning(bkey"),
      s"q109's successor window is not bucket-partitioned:\n$p")
  }

  test("q115: one user shuffle + one path aggregate, top-k as TakeOrdered") {
    val p = plan("q115_path_mining")
    assert(p.contains("TakeOrderedAndProject"), p) // never a global sort
    val exchanges = p.linesIterator.count(l =>
      l.contains("- Exchange (") || l.trim.startsWith("Exchange ("))
    assert(exchanges <= 2, s"expected <= 2 exchanges (user shuffle + path agg):\n$p")
  }

  test("q117: compaction joins are all equi-joins — no cartesian anywhere") {
    val p = plan("q117_stream_compaction")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q110: one corpus wordcount with map-side combine; grid joins broadcast") {
    val p = plan("q110_source_drift")
    assert(p.contains("partial_count"), p) // the (source, tok) pre-aggregate
    assert(!p.contains("SortMergeJoin"),
      s"q110's vocabulary-bounded joins should broadcast:\n$p")
  }

  test("q125: the prefix-scan window is bucket-partitioned, offsets broadcast") {
    val p = plan("q125_systematic_resample")
    assert(p.contains("hashpartitioning(bucket"),
      s"q125's running-sum window must partition by hash bucket:\n$p")
    assert(!p.contains("SinglePartition"),
      s"q125 must not plan any SinglePartition exchange:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"q125's offset join should broadcast:\n$p")
  }

  test("q126: pooled ranking windows are bucket-partitioned, never global") {
    val p = plan("q126_quantile_normalize")
    // windows: (v, gb) for the pooled rank, source for the per-source
    // rank — neither may collapse to a single global partition
    assert(!p.contains("SinglePartition"),
      s"q126 must not plan any SinglePartition exchange:\n$p")
  }

  test("q142: centroids broadcast into the corpus; every aggregate is partial+final") {
    val p = plan("q142_label_centroids")
    // the |labels|-row centroid frame must be the broadcast side of the
    // scoring cross join — the corpus never shuffles to meet it
    assert(p.contains("BroadcastNestedLoopJoin"), s"centroid join must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no shuffled cartesian allowed:\n$p")
    // argmin (struct-min) and both groupBys keep map-side partials:
    // each Exchange is fed by an aggregate, never by a bare projection
    assert(!p.contains("SinglePartition"), s"no global-partition exchange:\n$p")
  }

  test("q145: curriculum windows are source-partitioned, never global") {
    val p = plan("q145_curriculum")
    assert(!p.contains("SinglePartition"),
      s"q145 must not plan any SinglePartition exchange:\n$p")
  }

  test("q160: histogram passes are partial+final; windows group-partitioned") {
    val p = plan("q160_hist_quantiles")
    // pass 1 (bounds) and pass 2 (bin cells) both map-side combine
    assert(p.contains("partial_min") && p.contains("partial_count"), p)
    // the 64-row-per-group cumulative window is event_type-partitioned
    assert(!p.contains("SinglePartition"),
      s"q160 must not plan any SinglePartition exchange:\n$p")
  }

  test("hll register build: map-side partial sketch, key-partitioned merge") {
    val docs = graft.Tables.documents(spark, d)
    val p = Corpus.hllRegisters(docs).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    // the per-partition sketch IS the partial aggregate (the native
    // HllRegistersAgg runs partial-then-final through
    // ObjectHashAggregate); the one exchange carries ONE 512-register
    // array per source per partition
    assert(p.contains("partial_hll_registers"), p)
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("hashpartitioning(source"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("quantile sketch build: map-side partial pair sample, key-partitioned merge") {
    val ev = graft.Tables.events(spark, d)
    val p = graft.operators.Corpus.q195QuantileSketch(spark, d)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the per-partition sample IS the partial aggregate (SamplePairsAgg
    // through ObjectHashAggregate — a silent fall to SortAggregate
    // would re-sort the corpus per group); the one exchange carries
    // 2k longs per event_type per partition
    assert(p.contains("partial_sample_pairs"), p)
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("hashpartitioning(event_type"), p)
    assert(!p.contains("SinglePartition"),
      s"q195 must not plan any SinglePartition exchange:\n$p")
    ev.unpersist()
  }
}
