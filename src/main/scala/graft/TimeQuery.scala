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
    // validated BEFORE any work: a bad passes arg must fail with the
    // usage line up front, not burn a full warmup pass and then die on
    // empty.min
    val passes = (if (args.length > 2) args(2).toIntOption else Some(3))
      .filter(_ >= 1)
      .getOrElse(sys.error("passes must be a positive integer — " +
        "usage: TimeQuery <query_name> [sfDir] [passes]"))
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val spark = GraftSession.local(GraftSession.envCpus())
    spark.sparkContext.setLogLevel("ERROR")
    StreamCensus.maybeInstall(spark) // SPARK_GRAFT_STREAM_CENSUS=1
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
