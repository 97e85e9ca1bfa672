package graft.operators
import org.apache.spark.sql.functions._
// scratch profiling main (not committed)
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    graft.operators.Corpus.q53CopurchaseClusters(spark, d).count() // warmup
    spark.catalog.clearCache()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name: ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    t("full_q53") { graft.operators.Corpus.q53CopurchaseClusters(spark, d).count() }
    spark.catalog.clearCache()
    val hi = Tables.lineitem(spark, d).filter(col("l_quantity") >= 49)
      .select(col("l_orderkey"), col("l_partkey"))
    val pairs = graft.operators.LshJoin.boundedBucketPairs(hi, "l_partkey",
      graft.operators.LshJoin.MaxBucket, "l_orderkey")
    t("edges_count") { pairs.count() }
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
    val nodes = hi.select(col("l_partkey").as("p")).distinct()
    val sizes = { val l = nodes; () }; t("cc_via_full_minus") { () }
    spark.stop()
  }
}
