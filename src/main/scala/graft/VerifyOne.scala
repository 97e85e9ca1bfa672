package graft
import java.nio.file.{Files, Paths}
/** Dev harness: dump ONE driver query + its oracle SQL in the Verify
  * layout, so `tools/compare.py <sfDir> <outDir> <name>` checks a single
  * query without paying for the whole 100+-query suite.
  *
  * Usage: runMain graft.VerifyOne <query_name> [sfDir] [outDir]
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: VerifyOne <query_name> [sfDir] [outDir]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 2) args(2) else "/tmp/verify_one"
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))
    val spark = GraftSession.local(GraftSession.envCpus())
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    fn(spark, sfDir).coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/$name")
    // Verify's own escaper — the dev loop must validate with EXACTLY
    // the escaping the real run uses, or it masks the bug class the
    // escaper exists to catch
    val json = SparkEntry.oracleSql.get(name)
      .map(sql => s"${Verify.jsonEscape(name)}: ${Verify.jsonEscape(sql)}")
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
