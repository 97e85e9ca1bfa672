package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness: synthesize a larger scale factor from an existing one
  * by disjoint-key replication, for scale-canary timing ONLY (never a
  * correctness oracle input — the salted document copies deliberately
  * change text content).
  *
  * Design goals (so sf0.1→sf1 timing measures the ENGINE's scaling,
  * not an artifact of the synthesis):
  *
  *  - **Fact tables** (`customer supplier part orders lineitem events
  *    documents embeddings`) are replicated N× with every key column
  *    shifted by `copy * (max(key)+1)` — copies are disjoint in key
  *    space, and FK pairs (o_custkey→c_custkey, l_orderkey→o_orderkey,
  *    l_partkey→p_partkey, l_suppkey→s_suppkey, vec_id↔doc_id) shift
  *    by the SAME per-table offset so referential joins stay 1:1. The
  *    lineitem-derived co-purchase graphs (q53/q73/q112/q124) become N
  *    disjoint copies of the original graph — per-component work is
  *    unchanged, component count ×N, i.e. the linear shape a real
  *    corpus grows in.
  *  - **Dimension tables** (`region nation`) are copied as-is:
  *    TPC-H's fixed-cardinality dims don't grow with sf, and
  *    nationkey FKs stay valid without shifting.
  *  - **Timestamps are NOT shifted**: N× events/orders in the same
  *    time window = "more users, same period", which is how a real
  *    lake grows; windowed/streaming state (q83/q93/q137) then scales
  *    with user count as it would in production.
  *  - **Document text is salted per copy** (deterministic 40% token
  *    replacement, positions keyed on (doc_id, position), replacement
  *    carries the copy index): cross-copy token-set Jaccard lands at
  *    (1-0.4)/(1+0.4) ≈ 0.43 < the 0.5 dedup threshold, and shingle
  *    space diverges, so near-dup CLUSTER SIZES stay what they were
  *    at the source sf while cluster COUNT grows ×N. Without this,
  *    every doc would gain N-1 exact twins and the exact-similarity
  *    family (q79/q88) would go quadratic BY CONSTRUCTION of the data
  *    — masking what we actually want to measure. Copy 0 is
  *    byte-identical to the source corpus, so BM25 probe terms keep
  *    hitting, and the unsalted 60% of each copy keeps df/posting
  *    lists growing ~linearly for common terms.
  *
  * Usage: runMain graft.MakeScale <srcDir> <outDir> [copies=10]
  */
object MakeScale {
  /** Deterministic "salt this token position?" decision — a 64-bit
    * mix of (doc_id, pos) taken mod 5 < 2 → 40% of positions, the
    * same positions in every copy (so copy i vs copy j differ in the
    * same 40%, giving the same ≈0.43 cross-copy Jaccard as vs copy 0).
    */
  private def saltPos(docId: Long, pos: Int): Boolean = {
    var h = docId * 0x9e3779b97f4a7c15L + pos * 0xc2b2ae3d27d4eb4fL
    h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
    (((h % 5) + 5) % 5) < 2
  }

  private[graft] def saltText(docId: Long, copy: Int, text: String): String = {
    if (copy == 0 || text == null) return text
    val toks = text.split(" ", -1)
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty && saltPos(docId, i)) toks(i) = toks(i) + "~c" + copy
      i += 1
    }
    toks.mkString(" ")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: MakeScale <srcDir> <outDir> [copies] [mode: full|shared-docs]")
    val src = args(0); val out = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val mode = if (args.length > 3) args(3) else "full"
    val spark = GraftSession.local(GraftSession.envCpus())
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def tbl(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def keyOffset(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    // mode shared-docs: documents.parquet ONLY, doc_id shifted, text
    // VERBATIM — copies share one vocabulary, the way a real corpus
    // grows (more documents drawn from the same language), versus the
    // default salting that makes 40% of each copy's tokens unique BY
    // CONSTRUCTION. This is the q206 decade-canary fixture: it grows
    // the corpus N x while the per-source distinct-gram space stays
    // FIXED, so a vocab-bounded aggregate must go decade-flat on the
    // shuffle and ~linear on the scan — measurable, not argued.
    // (salted-docs is the same cut with the default salting kept — the
    // documents-only counterpart for a same-host A/B against shared-docs)
    if (mode == "shared-docs" || mode == "salted-docs") {
      val docOff0 = keyOffset(tbl("documents"), "doc_id")
      val base = tbl("documents")
      val salt = udf((id: Long, c: Int, t: String) => saltText(id, c, t))
      (0 until copies).map { i =>
          val shifted = base.withColumn("doc_id", col("doc_id") + lit(docOff0 * i))
          if (mode == "salted-docs")
            shifted.withColumn("text",
              salt(col("doc_id") - lit(docOff0 * i), lit(i), col("text")))
              // salting appends "~cN" to ~40% of tokens — n_chars must
              // track the new text or n_chars consumers read fiction
              .withColumn("n_chars",
                length(coalesce(col("text"), lit(""))).cast("long"))
          else shifted
        }
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      println(s"documents: ${copies}x $mode written")
      spark.stop()
      return
    }

    // copy-as-is dims
    Seq("region", "nation").foreach { t =>
      tbl(t).write.mode("overwrite").parquet(s"$out/$t.parquet")
    }

    val custOff = keyOffset(tbl("customer"), "c_custkey")
    val suppOff = keyOffset(tbl("supplier"), "s_suppkey")
    val partOff = keyOffset(tbl("part"), "p_partkey")
    val ordOff = keyOffset(tbl("orders"), "o_orderkey")
    val evOff = keyOffset(tbl("events"), "event_id")
    val userOff = keyOffset(tbl("events"), "user_id")
    val docOff = keyOffset(tbl("documents"), "doc_id")
    val vecOff = keyOffset(tbl("embeddings"), "vec_id")

    /** Union `copies` shifted replicas; `shifts` maps column → per-copy
      * stride. One read per copy — the source is small relative to the
      * output and the write dominates.
      */
    def replicate(name: String, shifts: Map[String, Long],
                  extra: (DataFrame, Int) => DataFrame = (df, _) => df): Unit = {
      val base = tbl(name)
      val unioned = (0 until copies).map { i =>
        val shifted = shifts.foldLeft(base) { case (df, (c, stride)) =>
          df.withColumn(c, col(c) + lit(stride * i))
        }
        extra(shifted, i)
      }.reduce(_ unionByName _)
      unioned.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"$name: ${copies}x written")
    }

    replicate("customer", Map("c_custkey" -> custOff))
    replicate("supplier", Map("s_suppkey" -> suppOff))
    replicate("part", Map("p_partkey" -> partOff))
    replicate("orders", Map("o_orderkey" -> ordOff, "o_custkey" -> custOff))
    replicate("lineitem", Map("l_orderkey" -> ordOff, "l_partkey" -> partOff,
      "l_suppkey" -> suppOff))
    replicate("events", Map("event_id" -> evOff, "user_id" -> userOff))
    replicate("embeddings", Map("vec_id" -> vecOff))

    val saltUdf = udf((id: Long, c: Int, t: String) => saltText(id, c, t))
    replicate("documents", Map("doc_id" -> docOff), (df, i) =>
      df.withColumn("text", saltUdf(col("doc_id") - lit(docOff * i), lit(i), col("text")))
        .withColumn("n_chars", length(coalesce(col("text"), lit(""))).cast("long")))

    spark.stop()
  }
}
