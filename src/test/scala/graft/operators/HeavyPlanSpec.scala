package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.functions._

/** Plan-shape pins for the standing BENCH HEAVIES (q123, q79, q166,
  * q73, q137) — the queries whose wall time dominates every round's
  * artifact. They are iterative (graph loops) or streaming, so the
  * whole-query `explain` pins in [[PlanSpec]] can't see their hot
  * inner plans; instead each loop's STEP builder is extracted
  * (`ccPropagate`/`ccShortcut`, `pageRankStep`, `hitsAuthorityStep`,
  * `editDistanceJoin`) and pinned here at the per-round grain. With
  * these counts pinned, a bench jump on a heavy is adjudicable
  * forever: plan drift fails CI, so a slow artifact means load.
  *
  * Counts are measured under AQE OFF and auto-broadcast OFF — the
  * deterministic worst-case shape, which IS the 100 TB shape (at
  * scale nothing auto-broadcasts; only explicit `broadcast()` hints
  * survive, and the pins assert exactly those survive). Collected
  * programmatically off the physical tree: `collect` does not descend
  * into `InMemoryRelation`'s cached plan, so persist-time shuffles
  * (paid once, by design) never pollute the per-round counts.
  */
class HeavyPlanSpec extends SparkSpec {

  private case class Shape(shuffles: Int, single: Int, broadcasts: Int, inMemScans: Int)

  private def shapeOf(df: DataFrame): Shape = {
    val p = df.queryExecution.executedPlan
    val sh = p.collect { case e: ShuffleExchangeExec => e }
    Shape(
      sh.size,
      sh.count(_.outputPartitioning == SinglePartition),
      p.collect { case e: BroadcastExchangeExec => e }.size,
      p.collect { case s if s.nodeName.contains("InMemoryTableScan") => s }.size)
  }

  /** AQE + auto-broadcast off for the measurement, restored after. */
  private def pinned[A](body: => A): A = {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
    }
  }

  test("CC round (q79/q123/q20 core): cached edges never re-shuffle; " +
    "2 label-sized shuffles per propagate, 1 per shortcut, no global partition") {
    pinned {
      import spark.implicits._
      val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
      val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("p")
      // exactly connectedComponents' edge prep: self-loops folded, key-
      // partitioned BEFORE caching so rounds reuse the layout
      val e = edges.union(nodes.select(col("p").as("src"), col("p").as("dst")))
        .repartition(col("src")).persist()
      e.count()
      val labels = nodes.select(col("p"), col("p").as("lbl"))
        .localCheckpoint(eager = true)
      val prop = Corpus.ccPropagate(e, labels)
      val ps = shapeOf(prop)
      // 2 shuffles: labels into the join + the min-label agg; the edge
      // side reads the cache in place (inMemScans=1, and a third
      // shuffle would mean the persisted partitioning stopped lining up
      // with the join key)
      assert(ps == Shape(2, 0, 0, 1), s"ccPropagate shape drifted: $ps")
      val ss = shapeOf(Corpus.ccShortcut(prop.localCheckpoint(eager = true)))
      // 1 shuffle: only the label side re-keys on lbl; the checkpointed
      // frame's hash(p) layout serves the lp side as-is
      assert(ss == Shape(1, 0, 0, 0), s"ccShortcut shape drifted: $ss")
      e.unpersist(blocking = false)
    }
  }

  test("PageRank round (q73): cached degree-edges never re-shuffle; " +
    "2 node-sized shuffles per iteration, no global partition") {
    pinned {
      import spark.implicits._
      val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
      val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("p")
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val e = edges.join(deg, "src").repartition(col("src")).persist()
      e.count()
      val n = nodes.select(col("p")).persist()
      n.count()
      val ranks = n.select(col("p"), lit(1000000L).as("r"))
      val s = shapeOf(Corpus.pageRankStep(e, n, ranks, 150000L))
      // 2 shuffles: ranks into the contribution join + the per-dst sum;
      // both cached frames (edges, nodes) read in place (inMemScans=2)
      assert(s == Shape(2, 0, 0, 2), s"pageRankStep shape drifted: $s")
      e.unpersist(blocking = false)
      n.unpersist(blocking = false)
    }
  }

  test("HITS round (q166): renorm max is THE one broadcast and THE one " +
    "single-partition point; cached edges never re-shuffle") {
    pinned {
      import spark.implicits._
      val he = Seq((1L, 10L), (2L, 10L), (2L, 11L)).toDF("c", "p")
        .repartition(col("c")).persist()
      he.count()
      val h = he.select(col("c")).distinct()
        .select(col("c"), lit(Corpus.HitsScale).as("h"))
        .localCheckpoint(eager = true)
      val s = shapeOf(Corpus.hitsAuthorityStep(he, h))
      // 3 shuffles: hub frame in, per-p sum, the 1-ROW renorm gather
      // (the single=1 — a second SinglePartition would mean node-sized
      // data through one partition); 1 broadcast: the renorm scalar
      // back out. Edge cache read twice in place (join + araw reuse).
      assert(s == Shape(3, 1, 1, 2), s"hitsAuthorityStep shape drifted: $s")
      he.unpersist(blocking = false)
    }
  }

  test("editDistanceJoin (q123/q84 core): probe segments broadcast even " +
    "with auto-broadcast off; master side never shuffles before the join") {
    pinned {
      import spark.implicits._
      val probes = Seq((1L, "hello world"), (2L, "goodbye moon")).toDF("pid", "pname")
      val master = Seq((10L, "hello world"), (11L, "goodbye man")).toDF("mid", "mname")
      val s = shapeOf(Linkage.editDistanceJoin(probes, master, 2))
      // 1 broadcast: the explicit probe-side hint (the whole point —
      // the master corpus streams map-side); 1 shuffle: the pair
      // distinct AFTER the join, pair-sized not corpus-sized
      assert(s == Shape(1, 0, 1, 0), s"editDistanceJoin shape drifted: $s")
    }
  }

  test("q209 ExactSubstr rewrite: census cache read in place, no extra " +
    "shuffles past the three keyed exchanges, nothing broadcast at scale shape") {
    pinned {
      import spark.implicits._
      val span = (1 to Curation.ExactSubstrL).map(i => s"s$i").mkString(" ")
      val docs = Seq(
        ("a", 1L, span),
        ("b", 2L, s"b1 b2 $span b3 b4"),
        ("c", 3L, (1 to 16).map(i => s"f$i").mkString(" ")))
        .toDF("source", "doc_id", "text")
      val (rw, release) = Curation.exactSubstrRewrite(docs)
      val s = shapeOf(rw)
      // 3 shuffles, each keyed and irreducible: the occurrence stream
      // onto the window key for the census-apply join, the cut
      // positions onto doc_id (per-doc collapse), and the document
      // side onto doc_id for the rewrite join (the cuts side reuses
      // its agg partitioning). The duplicated-window census reads its
      // cache in place (inMemScans=1 — a second scan or a 4th shuffle
      // means the persist stopped covering the census build), and
      // NOTHING broadcasts: at 100 TB no side of any join here is
      // small, so the scale shape is all co-partitioned joins.
      assert(s == Shape(3, 0, 0, 1), s"exactSubstrRewrite shape drifted: $s")
      // the Bloom sideways pass (r18 verdict #1): the census-apply
      // occurrence stream must be probed BELOW its exchange — inside
      // the pre-shuffle subtree — so non-duplicated occurrences never
      // reach the window-key exchange. The probe is a broadcast HANDLE
      // (BloomMightContainBc), so the broadcasts=0 count above still
      // holds: no plan-level BroadcastExchange, no per-task literal.
      val plan = rw.queryExecution.executedPlan
      val bloomFilters = plan.collect {
        case f: org.apache.spark.sql.execution.FilterExec
            if f.condition.exists(_.isInstanceOf[graft.functions.BloomMightContainBc]) => f
      }
      // 1 probe on the occurrence side is the design; Catalyst's
      // constraint propagation may MIRROR it onto the (vocab-sized,
      // always-true modulo FPP) cached dup side too — harmless, so the
      // pin allows it rather than fighting the optimizer
      assert(bloomFilters.size == 1 || bloomFilters.size == 2,
        s"Bloom probe count drifted: ${bloomFilters.size}")
      val preExchange = plan.collect {
        case e: ShuffleExchangeExec
            if bloomFilters.exists(f => e.child.exists(_ eq f)) => e
      }
      assert(preExchange.nonEmpty,
        "the Bloom probe must sit BELOW a shuffle exchange (pre-exchange pruning), " +
          "not above the census-apply join")
      release()
    }
  }

  test("q219 upsert-ingest state merge: the full outer join reuses BOTH " +
    "cached aggregates' hash partitioning — zero exchanges, O(batch) " +
    "movement (a union+groupBy formulation re-shuffles the vocabulary)") {
    pinned {
      import spark.implicits._
      val span = (1 to Curation.ExactSubstrL).map(i => s"m$i").mkString(" ")
      def state(rows: Seq[(String, Long, String)]) = {
        val st = Curation.exactSubstrOccState(
          rows.toDF("source", "doc_id", "text")).persist()
        st.count()
        st
      }
      val prev = state(Seq(("a", 1L, s"$span x1 x2")))
      val bSt = state(Seq(("a", 2L, s"y1 y2 $span")))
      val (m2, merged, changed) = Curation.exactSubstrStateMergeChanged(prev, bSt)
      // m2 is itself persisted (the fusion's point), so descend into
      // ITS cached plan to pin the join shape the cache pays for
      val inner = m2.queryExecution.executedPlan.collectFirst {
        case sc: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          sc.relation.cachedPlan
      }.getOrElse(fail("fused state merge must be persisted"))
      val innerShuffles = inner.collect { case e: ShuffleExchangeExec => e }.size
      val innerScans = inner.collect {
        case sc if sc.nodeName.contains("InMemoryTableScan") => sc }.size
      assert(innerShuffles == 0,
        s"state merge must move nothing — both sides are cached hash-partitioned aggregates; got $innerShuffles shuffles")
      assert(innerScans == 2,
        s"both cached states must be read in place: $innerScans in-mem scans")
      // and it merges correctly: nd adds, keep is the running min
      val m = merged.collect().map(r =>
        r.getString(0) -> ((r.getLong(1), r.getStruct(2).getLong(0)))).toMap
      assert(m(span) == ((2L, 1L)), s"shared window must merge to nd=2 keeper doc 1: $m")
      // the changed set projects from the SAME fused join cache (the
      // r20 fusion: one prev⋈batch join per arrival, not two) and
      // carries exactly the batch-touched windows whose verdict moved:
      // the shared span crossed into duplication; y-windows stay nd=1
      val ch = shapeOf(changed)
      assert(ch.shuffles == 0 && ch.inMemScans >= 1,
        s"changed set must read the fused join's cache in place: $ch")
      assert(changed.collect().map(_.getString(0)).toSeq == Seq(span),
        "only the newly-duplicated window may enter the changed set")
      m2.unpersist(); prev.unpersist(); bSt.unpersist()
    }
  }

  test("q219 repair-id scan: the changed set BROADCASTS through the semi " +
    "join so the standing occurrence stream is filtered in place — one " +
    "broadcast, and the only shuffle is the id distinct") {
    pinned {
      import spark.implicits._
      val span = (1 to Curation.ExactSubstrL).map(i => s"r$i").mkString(" ")
      val orig = Seq(
        ("a", 1L, s"$span z1 z2"),
        ("a", 2L, (1 to 12).map(i => s"u$i").mkString(" ")))
        .toDF("source", "doc_id", "t")
      val changed = Seq(Tuple1(span)).toDF("k")
      val hit = Curation.exactSubstrRepairIds(orig, changed, hashKeys = false)
      val s = shapeOf(hit)
      assert(s.broadcasts == 1,
        s"the changed set must broadcast (the hint is load-bearing at 100 TB): $s")
      assert(s.shuffles == 1,
        s"only the id distinct may shuffle — an occurrence-side exchange means the semi join stopped broadcasting: $s")
      assert(hit.collect().map(_.getLong(0)).toSeq == Seq(1L),
        "only the doc holding the changed window is repaired")
    }
  }

  test("q137 stream outer attribution: BOTH sides watermarked and the join " +
    "stays left_outer (state eviction is what emits the null rows)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(java.sql.Timestamp, Long)]
      .toDF().select(col("_2").as("user_id"), col("_1").as("ts"))
    val purchases = MemoryStream[(java.sql.Timestamp, Long, Double)]
      .toDF().select(col("_2").as("user_id"), col("_1").as("ts"),
        col("_3").as("value"))
    val joined = graft.streaming.EventStream
      .attributionJoinOuter(clicks, purchases)
    val analyzed = joined.queryExecution.analyzed
    val wms = analyzed.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => e
    }
    // one watermark per side: dropping either would make the outer
    // join's state unbounded (nothing could ever be proven unmatched)
    assert(wms.size == 2, s"expected 2 EventTimeWatermark nodes, got ${wms.size}")
    val joins = analyzed.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty && joins.head.joinType.sql == "LEFT OUTER",
      s"join type drifted: ${joins.map(_.joinType.sql)}")
  }
}
