package graft

/** Dev harness: time a list of driver queries at TWO scale factors in
  * one JVM (shared session, cache cleared per pass) and print the
  * per-query scale ratio — the round-11 sf0.1→sf1 canary that turns
  * "the plan shape scales" claims into measured exponents. A 10×
  * data-size ratio near (or under) 10 is linear; materially above 10
  * means super-linear work and needs a plan diff.
  *
  * Usage: runMain graft.ScaleCanary q1,q2,... <dirA> <dirB> [passes]
  */
object ScaleCanary {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ScaleCanary <names,csv> <dirA> <dirB> [passes]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val dirs = Seq(args(1), args(2))
    val passes = if (args.length > 3) args(3).toInt else 2
    val spark = GraftSession.local(GraftSession.envCpus())
    spark.sparkContext.setLogLevel("ERROR")
    val results = for (n <- names) yield {
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query '$n'"))
      val best = dirs.map { d =>
        val times = (0 to passes).map { i =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val cnt = fn(spark, d).count()
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"[canary] $n $d pass$i $sec%.3f s rows=$cnt")
          sec
        }
        times.drop(1).min // drop warmup
      }
      println(f"[canary-row] $n ${best(0)}%.3f ${best(1)}%.3f ratio=${best(1) / best(0)}%.2f")
      (n, best(0), best(1))
    }
    println("query,t_a,t_b,ratio")
    results.foreach { case (n, a, b) => println(f"$n,$a%.3f,$b%.3f,${b / a}%.2f") }
    spark.stop()
  }
}
