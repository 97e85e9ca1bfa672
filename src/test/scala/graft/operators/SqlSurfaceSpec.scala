package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.functions._

/** New-in-Spark-4 SQL surface (q150 recursive CTE, q151 LATERAL).
  * Driver hash-matches DuckDB; these pin the semantics and the plan
  * properties the hash can't see.
  */
class SqlSurfaceSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("recursive reachability: hop bound holds and seeds are hop 0") {
    val rows = Relational.q150RecursiveCte(spark, d).collect()
    assert(rows.nonEmpty)
    val hops = rows.map(_.getAs[Long]("min_hops"))
    assert(hops.min == 0L && hops.max <= 2L)
    // every seed part (partkey < 100 among high-quantity items) is at hop 0
    rows.filter(_.getAs[Long]("l_partkey") < 100L)
      .foreach(r => assert(r.getAs[Long]("min_hops") == 0L))
  }

  test("recursive CTE agrees with the iterative pointer-chase on the same edges") {
    // independent derivation: Scala BFS over the collected edge set
    val hi = graft.Tables.lineitem(spark, d)
      .filter(col("l_quantity") >= 49)
      .select(col("l_orderkey"), col("l_partkey"))
    val edges = hi.as("a").join(hi.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct().collect().map(r => r.getLong(0) -> r.getLong(1))
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seeds = hi.select(col("l_partkey")).distinct().collect()
      .map(_.getLong(0)).filter(_ < 100L).toSet
    var frontier = seeds
    var best = seeds.map(_ -> 0L).toMap
    for (hop <- 1 to 2) {
      frontier = frontier.flatMap(p => adj.getOrElse(p, Set.empty))
      best = frontier.foldLeft(best)((m, p) =>
        if (m.contains(p)) m else m + (p -> hop.toLong))
    }
    val got = Relational.q150RecursiveCte(spark, d).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("min_hops")).toMap
    assert(got == best)
  }

  test("lateral top-2: exactly min(2, group size) rows per nation, ordered") {
    val rows = Relational.q151LateralTopN(spark, d).collect()
    val byNation = rows.groupBy(_.getString(0))
    byNation.foreach { case (_, rs) =>
      assert(rs.length <= 2)
      val bals = rs.map(_.getAs[Double]("acctbal"))
      assert(bals.sorted.reverse.toSeq == bals.toSeq) // desc within nation
    }
    // cross-check against the window formulation
    val want = graft.Tables.customer(spark, d)
      .join(graft.Tables.nation(spark, d), col("c_nationkey") === col("n_nationkey"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("n_name"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))))
      .filter(col("rk") <= 2)
      .select(col("n_name"), col("c_name"), col("c_acctbal"))
      .collect().map(_.toSeq).toSet
    assert(rows.map(_.toSeq).toSet == want)
  }

  test("the lateral limit decorrelates: no cartesian product in the plan") {
    val p = Relational.q151LateralTopN(spark, d)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"), s"lateral must decorrelate:\n$p")
  }
}
