package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted physical plan of one or all queries.
  * Usage: runMain graft.Explain <sfDir> [queryName] [exec]
  *
  * With the literal third arg `exec`, the query is executed first and
  * the FINAL adaptive plan is printed — the only way to see what AQE
  * actually did (stage/exchange reuse, SMJ->BHJ conversions, coalesced
  * partitions), none of which appears in the pre-execution plan.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val only = if (args.length > 1) Some(args(1)) else None
    val exec = args.length > 2 && args(2) == "exec"
    val spark = GraftSession.local(GraftSession.envCpus())
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_ == n) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"\n================ $name ================")
        try {
          val df = fn(spark, sfDir)
          if (exec) {
            // collect THIS Dataset (count() would execute a different
            // plan and leave this one's adaptive plan un-finalized)
            df.collect()
            println(df.queryExecution.executedPlan.toString)
          } else df.explain("formatted")
        } catch { case e: Throwable => println(s"explain failed: $e") }
      }
    spark.stop()
  }
}
