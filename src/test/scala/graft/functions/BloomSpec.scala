package graft.functions

import java.io.ByteArrayOutputStream

import graft.mr.SparkSpec
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

class BloomSpec extends SparkSpec {

  private def serialized(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  private def filterOf(keys: Seq[Long]): Array[Byte] = {
    val bf = BloomFilter.create(keys.length.toLong, 0.01)
    keys.foreach(bf.putLong)
    serialized(bf)
  }

  test("bloom_might_contain has no false negatives through SQL (codegen)") {
    import spark.implicits._
    val members = (1L to 1000L).map(_ * 7L)
    val bytes = filterOf(members)
    val hits = members.toDF("k")
      .select(call_function("bloom_might_contain", col("k"), lit(bytes)).as("m"))
      .as[Boolean].collect()
    assert(hits.forall(identity))
  }

  test("bloom_might_contain prunes most non-members at the configured FPP") {
    import spark.implicits._
    val bytes = filterOf((1L to 1000L).map(_ * 7L))
    val nonMembers = (1L to 10000L).map(_ * 7L + 3L)
    val fp = nonMembers.toDF("k")
      .select(call_function("bloom_might_contain", col("k"), lit(bytes)).as("m"))
      .as[Boolean].collect().count(identity)
    // fpp=0.01 -> expect ~100 of 10000; 5x headroom before failing
    assert(fp <= 500, s"$fp false positives of 10000")
  }

  test("interpreted eval agrees with the codegen path") {
    val bytes = filterOf(Seq(42L, 99L))
    val lit = Literal.create(bytes, BinaryType)
    val e42 = BloomMightContain(Literal(42L), lit)
    val e43 = BloomMightContain(Literal(43L), lit)
    assert(e42.eval(null) == true)
    // 43 may be a false positive in principle, but with 2 keys the
    // filter is far below capacity — pin the overwhelmingly likely case
    assert(e43.eval(null) == false)
  }

  test("null key evaluates to null, not a probe") {
    import spark.implicits._
    val bytes = filterOf(Seq(1L))
    val rows = Seq(Some(1L), None).toDF("k")
      .select(call_function("bloom_might_contain", col("k"), lit(bytes)).as("m"))
      .collect()
    assert(rows(0).getBoolean(0))
    assert(rows(1).isNullAt(0))
  }

  test("broadcast probe agrees with the literal probe, members and non-members") {
    import spark.implicits._
    val members = (1L to 1000L).map(_ * 7L)
    val bf = BloomFilter.create(members.length.toLong, 0.01)
    members.foreach(bf.putLong)
    val bcast = spark.sparkContext.broadcast(bf)
    val bytes = serialized(bf)
    val probes = ((1L to 1000L).map(_ * 7L) ++ (1L to 5000L).map(_ * 7L + 3L)).toDF("k")
    val both = probes.select(
      BloomMightContainBc.column(col("k"), bcast).as("bc"),
      call_function("bloom_might_contain", col("k"), lit(bytes)).as("lit"))
      .collect()
    assert(both.forall(r => r.getBoolean(0) == r.getBoolean(1)))
  }

  test("broadcast probe: null key is null, interpreted eval matches") {
    import spark.implicits._
    val bf = BloomFilter.create(2L, 0.01)
    bf.putLong(42L)
    val bcast = spark.sparkContext.broadcast(bf)
    val rows = Seq(Some(42L), None).toDF("k")
      .select(BloomMightContainBc.column(col("k"), bcast).as("m"))
      .collect()
    assert(rows(0).getBoolean(0))
    assert(rows(1).isNullAt(0))
    assert(BloomMightContainBc(Literal(42L), bcast).eval(null) == true)
    assert(BloomMightContainBc(Literal(43L), bcast).eval(null) == false)
  }

  test("a non-foldable filter argument fails fast") {
    import spark.implicits._
    val df = Seq((1L, Array[Byte](1, 2, 3))).toDF("k", "b")
    val e = intercept[Exception] {
      df.select(call_function("bloom_might_contain", col("k"), col("b"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m => m.contains("foldable")), messages(e).mkString("; "))
  }
}
