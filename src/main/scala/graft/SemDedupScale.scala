package graft

import org.apache.spark.sql.functions._

/** Route-share sizing probe for semDedup's sign-bucket blocking (the
  * r19 stretch item): for a given embeddings table, report — at the
  * DEFAULT signBits and at the corpus-derived
  * [[graft.operators.Similarity.semDedupSignBitsFor]] width — how much
  * of the corpus would take the over-cap self-join route vs the fast
  * collect_list route. One narrow aggregate per width; prints one
  * summary line each, plus the derivation inputs. Evidence lands in
  * NOTES_r20 §8.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.SemDedupScale /tmp/sf1"
  */
object SemDedupScale {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SemDedupScale <sfDir> [moreSfDirs...]")
    val spark = GraftSession.local(GraftSession.envCpus())
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity
    args.foreach { d =>
      val emb = Tables.embeddings(spark, d)
        .select(col("vec_id"), col("embedding"))
      val n = emb.count()
      val derived = Similarity.semDedupSignBitsFor(n)
      println(s"[semdedup-scale] $d: n=$n default=${Similarity.SemDedupSignBits} " +
        s"derived=$derived cap=${Similarity.SemDedupMaxBucket}")
      Seq(Similarity.SemDedupSignBits, derived).distinct.foreach { bits =>
        val pops = Similarity.semDedupBucketed(emb, bits)
          .groupBy(col("bucket"))
          .agg(countDistinct(col("vec_id")).as("m"))
          .select(
            count(lit(1)).as("buckets"),
            sum(when(col("m") > Similarity.SemDedupMaxBucket, 1L)
              .otherwise(0L)).as("hot_buckets"),
            sum(col("m")).as("vectors"),
            sum(when(col("m") > Similarity.SemDedupMaxBucket, col("m"))
              .otherwise(0L)).as("hot_vectors"),
            max(col("m")).as("max_bucket"))
          .head()
        val vectors = pops.getLong(2)
        val hotVec = pops.getLong(3)
        val share = if (vectors == 0) 0.0 else hotVec.toDouble / vectors
        println(f"[semdedup-scale]   bits=$bits%2d buckets=${pops.getLong(0)}%6d " +
          f"hot=${pops.getLong(1)}%4d max_bucket=${pops.getLong(4)}%8d " +
          f"over-cap vector share=${share * 100}%6.2f%%")
      }
    }
    spark.stop()
  }
}
