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
  *
  * Observability (both additive — the driver's headline fields are
  * unchanged):
  *   - `passes` carries EVERY per-query measurement as
  *     [warmup, t1, t2, t3]: a contended machine shows up as one
  *     outlier pass next to two normal ones instead of masquerading as
  *     a regression of the reported min.
  *   - `cache_bytes` is the query's storage-memory high-water mark
  *     (max over passes of the bytes its internal persists left
  *     cached): clearCache() hides which queries DEPEND on their
  *     persists, and at the 100 TB analogue this is the number that
  *     decides executor storage-fraction sizing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(GraftSession.envCpus())
    spark.sparkContext.setLogLevel("ERROR")

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)

    // (seconds, bytes left in the storage pool by the query's persists);
    // -1 sec marks a failed pass
    def timeOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Long) = {
      spark.catalog.clearCache() // identical (empty) storage state per run
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => return (-1.0, 0L) }
      val sec = (System.nanoTime() - t0) / 1e9
      val cached = spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum
      (sec, cached)
    }

    val measured = qs.map { case (name, fn) =>
      val all = Seq(timeOne(fn), timeOne(fn), timeOne(fn), timeOne(fn))
      val ok = all.map(_._1).drop(1).filter(_ >= 0) // pass 0 is warmup
      (name, all, if (ok.isEmpty) -1.0 else ok.min)
    }

    def fmtMap(rows: Seq[(String, String)]): String =
      rows.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qjson = fmtMap(measured.map { case (n, _, best) => n -> best.toString })
    val passes = fmtMap(measured.map { case (n, all, _) =>
      n -> all.map(_._1).mkString("[", ",", "]")
    })
    val cacheBytes = fmtMap(measured.map { case (n, all, _) =>
      n -> all.map(_._2).max.toString
    })
    val total = measured.map(_._3).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qjson,"passes":$passes,"cache_bytes":$cacheBytes,"sf":"$sfDir"}""")
    spark.stop()
  }
}
