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

  // ---- fixed_quantize ------------------------------------------------

  test("fixed_quantize matches the interpreted transform(round(x*1e6)) form on floats") {
    import spark.implicits._
    // the exact expression fixed_quantize replaces in the ANN queries —
    // values must be bit-identical or q23's hash oracle would drift
    val vecs = Seq(
      Array(0.1f, -0.25f, 1.5e-6f, -3.7f, 0.0f, 123.456f, -0.9999999f),
      Array.tabulate(64)(i => (math.sin(i * 0.37) * (if (i % 2 == 0) 1 else -1)).toFloat)
    ).toDF("v")
    val rows = vecs.select(
        expr("fixed_quantize(v)").as("q"),
        transform(col("v"), x => round(x.cast("double") * 1e6).cast("long")).as("t"))
      .as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (q, t) => assert(q == t) }
  }

  test("fixed_quantize interpreted eval agrees with the codegen/SQL path") {
    import spark.implicits._
    val in = Array(0.1, -0.25, 2.0e-6, -3.7)
    val viaSql = Seq(in.toSeq).toDF("v")
      .select(expr("fixed_quantize(v)").as("q")).as[Seq[Long]].head()
    val lit = Literal.create(ArrayData.toArrayData(in), ArrayType(org.apache.spark.sql.types.DoubleType))
    val viaEval = FixedPointQuantize(lit).eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
    assert(viaSql == viaEval)
    assert(viaEval == Seq(100000L, -250000L, 2L, -3700000L))
  }

  test("quantRound is exact half-away-from-zero (Spark round + long-cast semantics)") {
    assert(VectorKernels.quantRound(2.5) == 3L)
    assert(VectorKernels.quantRound(-2.5) == -3L)
    assert(VectorKernels.quantRound(2.4999999999999996) == 2L)
    assert(VectorKernels.quantRound(0.49999999999999994) == 0L)
    assert(VectorKernels.quantRound(-0.0) == 0L)
    assert(VectorKernels.quantRound(1e12 + 0.5) == 1000000000001L)
  }

  test("fixed_quantize propagates null ELEMENTS (matches the transform form, not garbage-zero)") {
    import spark.implicits._
    val got = Seq(Seq(Some(1.5), None, Some(-2.5)))
      .toDF("v")
      .select(expr("fixed_quantize(v)").as("q"))
      .collect().head.getSeq[Any](0)
    assert(got == Seq(1500000L, null, -2500000L), got)
    // and the oracle form agrees
    val ref = Seq(Seq(Some(1.5), None, Some(-2.5))).toDF("v")
      .select(expr("transform(v, x -> cast(round(x * 1e6) as bigint))").as("q"))
      .collect().head.getSeq[Any](0)
    assert(got == ref)
  }

  test("sorted_intersect_count agrees with size(array_intersect) on sorted-distinct arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(200) {
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted
      (a, b)
    } :+ ((Seq.empty[Long], Seq(1L, 2L))) :+ ((Seq.empty[Long], Seq.empty[Long]))
    val got = rows.toDF("a", "b")
      .select(
        expr("sorted_intersect_count(a, b)").as("fused"),
        expr("CAST(size(array_intersect(a, b)) AS BIGINT)").as("composed"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
  }

  test("sorted_intersect_count null handling and jaccard identity") {
    import spark.implicits._
    val r = Seq((Option.empty[Seq[Long]], Some(Seq(1L)))).toDF("a", "b")
      .select(expr("sorted_intersect_count(a, b)"))
      .collect().head
    assert(r.isNullAt(0))
    // inter/(|a|+|b|-inter) == size(intersect)/size(union) on canonical frames
    val j = Seq((Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L))).toDF("a", "b")
      .selectExpr(
        "CAST(sorted_intersect_count(a, b) AS DOUBLE) / (size(a) + size(b) - sorted_intersect_count(a, b)) AS jf",
        "CAST(size(array_intersect(a, b)) AS DOUBLE) / size(array_union(a, b)) AS jc")
      .collect().head
    assert(j.getDouble(0) == j.getDouble(1))
  }

  test("fixed_quantize returns null for null input and rejects scalars at analysis") {
    import spark.implicits._
    val df = Seq(Option.empty[Seq[Double]]).toDF("v")
      .select(expr("fixed_quantize(v)").as("q"))
    assert(df.collect().head.isNullAt(0))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1.0).toDF("v").select(expr("fixed_quantize(v)")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array"), e.getMessage)
  }
}
