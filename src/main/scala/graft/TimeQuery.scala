package graft

/** Dev harness: time ONE driver query standalone (warmup + best-of-3,
  * the Bench methodology) without paying for the whole suite — the
  * tool for "did my change regress THIS query" and for re-timing a
  * bench suspect on a quiet host before believing a jump.
  *
  * Usage: runMain graft.TimeQuery <query_name> [sfDir] [passes]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeQuery <query_name> [sfDir] [passes]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 3
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val spark = GraftSession.local(GraftSession.envCpus())
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_STREAM_CENSUS=1: per-batch census for streaming
    // replays — batchId, input rows, the durationMs breakdown and
    // state-operator row counts of EVERY micro-batch, straight from
    // the listener bus. This is the probe the q137/q147 timing
    // adjudications need: recentProgress on the query object is gone
    // by the time the wrapper returns, but the listener sees each
    // progress event as it lands, slow mode or fast.
    if (sys.env.get("SPARK_GRAFT_STREAM_CENSUS").contains("1"))
      spark.streams.addListener(
        new org.apache.spark.sql.streaming.StreamingQueryListener {
          import org.apache.spark.sql.streaming.StreamingQueryListener._
          override def onQueryStarted(e: QueryStartedEvent): Unit =
            println(s"census: started ${e.id} at ${e.timestamp}")
          override def onQueryProgress(e: QueryProgressEvent): Unit = {
            val p = e.progress
            val dur = p.durationMs
            val st = p.stateOperators.map(so =>
              s"${so.operatorName}:total=${so.numRowsTotal},upd=${so.numRowsUpdated},commit=${so.allUpdatesTimeMs + so.commitTimeMs}ms").mkString(" ")
            println(s"census: batch=${p.batchId} in=${p.numInputRows} " +
              s"trigger=${dur.get("triggerExecution")}ms add=${dur.get("addBatch")}ms " +
              s"getBatch=${dur.get("getBatch")}ms latestOffset=${dur.get("latestOffset")}ms " +
              s"queryPlanning=${dur.get("queryPlanning")}ms walCommit=${dur.get("walCommit")}ms " +
              s"stateCommit=${dur.get("commitOffsets")}ms $st")
          }
          override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
            println(s"census: terminated ${e.id}")
        })
    val times = (0 to passes).map { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"pass $i%d (${if (i == 0) "warmup" else "timed"}): $sec%.3f s, $n rows")
      sec
    }
    println(f"best-of-$passes: ${times.drop(1).min}%.3f s")
    spark.stop()
  }
}
