package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (SPARK_GRAFT_STREAM_CENSUS=1): per-micro-batch census for
  * streaming replays — batchId, input rows, the durationMs breakdown
  * and state-operator row counts of EVERY batch, straight from the
  * listener bus. This is the instrument the q137/q147 timing
  * adjudications need: `recentProgress` on the query object is gone by
  * the time the replay wrapper returns, but the listener sees each
  * progress event as it lands — slow mode or fast, standalone or
  * in-suite. Lines go to STDERR so the Bench contract line (stdout)
  * stays parseable.
  */
object StreamCensus {
  def enabled: Boolean =
    sys.env.get("SPARK_GRAFT_STREAM_CENSUS").contains("1")

  /** Install the census listener on `s` if the knob is set. */
  def maybeInstall(s: SparkSession): Unit = if (enabled) {
    s.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        private def now(): Long = System.nanoTime() / 1000000L
        override def onQueryStarted(e: QueryStartedEvent): Unit =
          System.err.println(s"census: started ${e.id} at ${e.timestamp} t=${now()}")
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          val p = e.progress
          val dur = p.durationMs
          val st = p.stateOperators.map(so =>
            s"${so.operatorName}:total=${so.numRowsTotal},upd=${so.numRowsUpdated},commit=${so.allUpdatesTimeMs + so.commitTimeMs}ms").mkString(" ")
          System.err.println(s"census: batch=${p.batchId} in=${p.numInputRows} " +
            s"trigger=${dur.get("triggerExecution")}ms add=${dur.get("addBatch")}ms " +
            s"getBatch=${dur.get("getBatch")}ms latestOffset=${dur.get("latestOffset")}ms " +
            s"queryPlanning=${dur.get("queryPlanning")}ms walCommit=${dur.get("walCommit")}ms " +
            s"commitOffsets=${dur.get("commitOffsets")}ms t=${now()} $st")
        }
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
          System.err.println(s"census: terminated ${e.id} t=${now()}")
      })
  }
}
