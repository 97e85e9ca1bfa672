package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology: one untimed warmup pass (JVM/JIT + codegen + parquet
  * footer cache), then three timed passes reporting the best — i.e.
  * steady-state throughput, which is what a long-lived cluster session
  * delivers. Each pass fully materializes the query via count().
  *
  * Cache hygiene: a few queries (.cache() inside q20/q21/q43) persist
  * intermediate blocks; without eviction those blocks both pre-warm later
  * passes (timing the cache, not the query) and accumulate storage-memory
  * pressure across all 50 queries. clearCache() before every timed run
  * makes each pass pay for its own cache population inside the timed
  * region and start from identical storage state.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(GraftSession.envCpus())
    spark.sparkContext.setLogLevel("ERROR")

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)

    def timeOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      spark.catalog.clearCache() // identical (empty) storage state per run
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    qs.foreach { case (_, fn) => timeOne(fn) } // warmup
    val results = qs.map { case (name, fn) =>
      // best of the SUCCESSFUL passes; -1 only when every pass failed
      val times = Seq(timeOne(fn), timeOne(fn), timeOne(fn)).filter(_ >= 0)
      name -> (if (times.isEmpty) -1.0 else times.min)
    }

    val qjson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qjson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
