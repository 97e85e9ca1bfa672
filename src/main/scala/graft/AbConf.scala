package graft

/** Dev harness: interleaved A/B of a runtime-settable Spark conf set
  * over named queries, in ONE JVM — the noise-robust complement of
  * [[TimeQuery]] for adjudicating a session-config change on a host
  * with variable co-tenant load. A fresh-JVM A/B (two TimeQuery runs)
  * confounds the conf with JIT state and whatever the co-tenant did in
  * between; here each query runs `rounds` alternating (off, on) pass
  * PAIRS after a shared warmup, so both arms sample the same drift and
  * the reported per-arm MIN is like-for-like.
  *
  * Usage: runMain graft.AbConf <k=v[,k=v...]> <q1[,q2...]> [sfDir] [rounds]
  *
  * Only runtime-settable SQL confs can be A/B'd this way (planner/AQE
  * knobs qualify; spark.sql.extensions or master do not).
  */
object AbConf {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: AbConf <k=v,...> <q1,...> [sfDir] [rounds]")
    val confs = args(0).split(",").map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }.toSeq
    val names = args(1).split(",").toSeq
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 3) args(3).toInt else 3
    val spark = GraftSession.local(GraftSession.envCpus())
    spark.sparkContext.setLogLevel("ERROR")
    val base = confs.map { case (k, _) => k -> spark.conf.get(k) }
    def setArm(on: Boolean): Unit =
      (if (on) confs else base).foreach { case (k, v) => spark.conf.set(k, v) }
    def load1(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0)
      catch { case _: Throwable => "?" }
    var sumOff = 0.0; var sumOn = 0.0
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      def pass(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      setArm(on = false); pass() // shared warmup at base conf
      val (offs, ons) = (1 to rounds).map { _ =>
        setArm(on = false); val off = pass()
        setArm(on = true); val on = pass()
        (off, on)
      }.unzip
      sumOff += offs.min; sumOn += ons.min
      println(f"$name%-34s off=${offs.min}%6.3f on=${ons.min}%6.3f " +
        f"(${ons.min / offs.min * 100}%5.1f%%) load1=${load1()} " +
        s"offs=${offs.map(o => f"$o%.2f").mkString(",")} ons=${ons.map(o => f"$o%.2f").mkString(",")}")
    }
    println(f"TOTAL off=$sumOff%.3f on=$sumOn%.3f (${sumOn / sumOff * 100}%5.1f%%)")
    spark.stop()
  }
}
