package graft.sources

import java.nio.file.{Files, Paths}

import graft.mr.SparkSpec
import org.apache.spark.sql.types.{LongType, StringType, StructType}

class SourcesSpec extends SparkSpec {

  private val schema = new StructType()
    .add("id", LongType).add("name", StringType)

  private def writeLines(prefix: String, suffix: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory(prefix)
    Files.write(Paths.get(dir.toString, s"part-0$suffix"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("jsonl: malformed lines are quarantined, clean rows parse, nothing is lost") {
    val path = writeLines("graft_jsonl_", ".json", Seq(
      """{"id": 1, "name": "a"}""",
      """{"id": broken""",
      """{"id": 3, "name": "c"}"""))
    val (clean, bad) = Sources.quarantine(Sources.jsonl(spark, path, schema))
    assert(clean.columns.toSeq == Seq("id", "name"))
    assert(clean.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      == Set((1L, "a"), (3L, "c")))
    val quarantined = bad.collect().map(_.getString(0))
    assert(quarantined.length == 1 && quarantined.head.contains("broken"))
  }

  test("csv: a row with the wrong arity/type is quarantined with its raw line") {
    val path = writeLines("graft_csv_", ".csv", Seq(
      "id,name",
      "1,a",
      "not_a_number,b",
      "3,c"))
    val (clean, bad) = Sources.quarantine(Sources.csv(spark, path, schema))
    assert(clean.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      == Set((1L, "a"), (3L, "c")))
    assert(bad.collect().map(_.getString(0)).toSeq == Seq("not_a_number,b"))
  }

  test("textLines reads the reference's native line-oriented shape") {
    val path = writeLines("graft_text_", ".txt", Seq("the quick", "brown fox"))
    import spark.implicits._
    assert(Sources.textLines(spark, path).as[String].collect().toSet
      == Set("the quick", "brown fox"))
  }
}
