package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.hashing.MurmurHash3

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`Array[Float]` vectors).
  *
  * Determinism: vectors are quantized to fixed-point BIGINTs
  * (round(x * 1e6)) so dot products and norms are exact integers and the
  * final cosine is bit-identical regardless of summation order — the same
  * trick the DuckDB oracle uses, making brute-force KNN hash-matchable.
  *
  * Scale path: brute force is the correctness baseline (probes broadcast,
  * corpus never shuffled); the LSH variant bucket-joins sign-random-
  * projection signatures so each probe only scores its candidate buckets.
  */
object Similarity {

  /** Fixed-point quantization of the embedding column (exact integers). */
  private def quantized: Column =
    transform(col("embedding"), x => round(x.cast("double") * 1e6).cast("long"))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Brute-force cosine top-5 for probe vectors (vec_id < 10) — all
    * codegen'd higher-order functions, probes broadcast, single pass over
    * the corpus.
    */
  def q23KnnBrute(s: SparkSession, d: String): DataFrame = {
    val q = Tables.embeddings(s, d).select(col("vec_id"), quantized.as("q"))
      .withColumn("nrm", dot(col("q"), col("q")))
    val probes = q.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"), col("nrm").as("pn"))
    q.join(broadcast(probes), col("probe_id") =!= col("vec_id"))
      .select(col("probe_id"), col("vec_id"),
        (dot(col("pq"), col("q")).cast("double") /
          sqrt(col("pn").cast("double") * col("nrm").cast("double"))).as("cosine"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("probe_id"))
          .orderBy(col("cosine").desc, col("vec_id"))).cast("long"))
      .filter(col("rnk") <= 5)
      .orderBy(col("probe_id"), col("rnk"))
  }

  // ---- LSH (sign random projection) ---------------------------------

  val Tables_ = 4 // LSH tables
  val BitsPerTable = 6
  val Dim = 64

  /** Deterministic pseudo-random hyperplanes: component (t, b, i) from
    * murmur of the index — seedless and reproducible.
    */
  private[operators] def plane(t: Int, b: Int, i: Int): Double = {
    val h = MurmurHash3.productHash((t, b, i))
    (h % 1000) / 1000.0
  }

  private[operators] def signature(vec: Array[Float], t: Int): Int = {
    var sig = 0
    var b = 0
    while (b < BitsPerTable) {
      var acc = 0.0
      var i = 0
      while (i < vec.length && i < Dim) { acc += vec(i) * plane(t, b, i); i += 1 }
      if (acc >= 0) sig |= (1 << b)
      b += 1
    }
    sig
  }

  /** LSH-bucketed ANN: candidates = same (table, signature) bucket in any
    * of the 4 tables; exact fixed-point cosine on candidates only; top-3.
    * Recall < 1 by design — rows-only oracle.
    */
  def q24KnnLsh(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    val sigs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        (0 until Tables_).iterator.map(t => (id, t, signature(v, t)))
      }.toDF("vec_id", "tbl", "sig")

    val q = emb.select(col("vec_id"), quantized.as("q"))
      .withColumn("nrm", dot(col("q"), col("q")))

    val probeSigs = sigs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("tbl"), col("sig"))
    val cand = broadcast(probeSigs).join(sigs, Seq("tbl", "sig"))
      .filter(col("probe_id") =!= col("vec_id"))
      .select(col("probe_id"), col("vec_id")).distinct()

    val scored = cand
      .join(broadcast(q.select(col("vec_id").as("probe_id"), col("q").as("pq"), col("nrm").as("pn"))), "probe_id")
      .join(q, "vec_id")
      .select(col("probe_id"), col("vec_id"),
        (dot(col("pq"), col("q")).cast("double") /
          sqrt(col("pn").cast("double") * col("nrm").cast("double"))).as("cosine"))

    scored.withColumn("rnk", row_number().over(
        Window.partitionBy(col("probe_id"))
          .orderBy(col("cosine").desc, col("vec_id"))).cast("long"))
      .filter(col("rnk") <= 3)
      .orderBy(col("probe_id"), col("rnk"))
  }
}
