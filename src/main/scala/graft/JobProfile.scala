package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev harness: per-JOB wall-clock breakdown of one query — the
  * empirical half of guide §1.1 for multi-job operators (batch-
  * sequential replays, iterative loops) where TimeQuery's single
  * number can't say WHICH action is slow. One untimed warmup pass,
  * then one timed pass with a listener printing every job's duration
  * and call site in completion order.
  *
  * Usage: runMain graft.JobProfile <queryName> [sfDir]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProfile <queryName> [sfDir]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(GraftSession.envCpus())
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
    fn(spark, sfDir).count() // warmup: JIT, codegen, parquet footers
    spark.catalog.clearCache()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var on = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (on) {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short")))).getOrElse("?")
        starts.put(js.jobId, (js.time, site)): Unit
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = if (on) {
        val s = starts.get(je.jobId)
        if (s != null) System.err.println(
          f"[job ${je.jobId}%4d] ${(je.time - s._1) / 1000.0}%7.3f s  ${s._2}")
      }
    })
    on = true
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    on = false
    Thread.sleep(300) // let trailing job-end events print
    System.err.println(f"[total] $sec%.3f s ($name, $sfDir)")
    spark.stop()
  }
}
