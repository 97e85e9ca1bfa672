package graft.operators

/** Dev harness: stage-level accounting for the BM25 pruned path at a
  * given SF dir — essential-term share, candidate volume, and ranked
  * time, the numbers that decide whether max-score is actually cutting
  * posting volume on this corpus.
  *
  * Usage: runMain graft.DebugBm25 [sfDir]
  */
object DebugBm25 {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/tmp/sf1"
    val spark = graft.GraftSession.local(graft.GraftSession.envCpus())
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[debug] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val parts = TextOps.bm25Build(spark, d, forcePrune = sys.env.get("BM25_PRUNE").map(_ == "1"))
    val nEss = t("essential.count")(parts.essential.count())
    val nCand = t("candidates.count")(parts.candidates.count())
    if (sys.env.contains("BM25_EXPLAIN")) parts.ranked.explain("formatted")
    val nRank = t("ranked.count")(parts.ranked.count())
    println(s"[debug] essential=$nEss candidates=$nCand ranked=$nRank")
    spark.stop()
  }
}
