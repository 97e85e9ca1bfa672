package graft.functions

import graft.mr.SparkSpec
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType}
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpec {

  test("fixed_dot computes the exact integer dot product through SQL (codegen)") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))).toDF("a", "b")
      .select(expr("fixed_dot(a, b)").as("d"))
    assert(df.as[Long].head() == 4 + 10 + 18)
  }

  test("fixed_dot returns null for null inputs") {
    import spark.implicits._
    val df = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]]))
      .toDF("a", "b").select(expr("fixed_dot(a, b)").as("d"))
    assert(df.collect().head.isNullAt(0))
  }

  test("fixed_dot rejects ragged arrays (codegen path)") {
    import spark.implicits._
    val df = Seq((Seq(2L, 3L, 100L), Seq(10L, 10L))).toDF("a", "b")
      .select(expr("fixed_dot(a, b)").as("d"))
    val e = intercept[Exception](df.collect())
    assert(e.getMessage.contains("dimension mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("dimension mismatch")))
  }

  test("fixed_dot rejects ragged arrays (interpreted path)") {
    val a = Literal.create(ArrayData.toArrayData(Array(2L, 3L, 100L)), ArrayType(LongType))
    val b = Literal.create(ArrayData.toArrayData(Array(10L, 10L)), ArrayType(LongType))
    val e = intercept[IllegalArgumentException](FixedPointDot(a, b).eval(null))
    assert(e.getMessage.contains("dimension mismatch"))
  }

  test("fixed_dot declares ARRAY<BIGINT> input types: scalar args fail analysis") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "b")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(expr("fixed_dot(a, b)")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array"), e.getMessage)
  }

  test("fixed_dot widens ARRAY<INT> arguments via implicit cast") {
    import spark.implicits._
    val df = Seq((Seq(1, 2, 3), Seq(4L, 5L, 6L))).toDF("a", "b")
      .select(expr("fixed_dot(a, b)").as("d"))
    assert(df.as[Long].head() == 32L)
  }

  test("interpreted eval agrees with the codegen path") {
    val a = Literal.create(ArrayData.toArrayData(Array(7L, -2L, 5L)), ArrayType(LongType))
    val b = Literal.create(ArrayData.toArrayData(Array(3L, 4L, 10L)), ArrayType(LongType))
    assert(FixedPointDot(a, b).eval(null) == 21L - 8L + 50L)
  }

  test("fixed_dot handles large values without intermediate overflow surprises") {
    // 5e6 * 5e6 * 64 dims = 1.6e15, well inside Long
    val big = Array.fill(64)(5000000L)
    val a = Literal.create(ArrayData.toArrayData(big), ArrayType(LongType))
    assert(FixedPointDot(a, a).eval(null) == 64L * 5000000L * 5000000L)
  }
}
