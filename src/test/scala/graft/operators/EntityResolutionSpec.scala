package graft.operators

import graft.mr.SparkSpec
import org.apache.spark.sql.DataFrame

/** End-to-end entity resolution (q123): PassJoin edges + connected
  * components. The driver hash-matches a brute-force levenshtein +
  * recursive-CTE oracle at sf0.01; these fixtures pin the TRANSITIVE
  * semantics the pairwise join alone cannot express — a bridging probe
  * merges two master records into one entity — plus the unresolved-
  * singleton path and the partition invariants (every probe appears
  * exactly once; entity_id is the minimum member id).
  */
class EntityResolutionSpec extends SparkSpec {

  private val Off = 1000L

  private def frame(rows: Seq[(Long, String)], id: String, nm: String): DataFrame = {
    import spark.implicits._
    rows.toDF(id, nm)
  }

  private def resolve(probes: Seq[(Long, String)], master: Seq[(Long, String)],
      tau: Int = 2): Map[Long, (String, Long, Long)] =
    Linkage.resolveEntities(
        frame(probes, "pid", "pname"), frame(master, "mid", "mname"), tau, Off)
      .collect()
      .map(r => r.getAs[Long]("record_id") ->
        ((r.getAs[String]("kind"), r.getAs[Long]("entity_id"),
          r.getAs[Long]("entity_size"))))
      .toMap

  test("a bridging probe merges two master records into one entity") {
    // probe "smith" is within 1 edit of BOTH masters, so the entity is
    // {master 1, master 2, probe} — transitive closure, not pairwise
    val got = resolve(
      probes = Seq(10L -> "smith"),
      master = Seq(1L -> "smitha", 2L -> "smith,"))
    assert(got.keySet == Set(1L, 2L, Off + 10L))
    assert(got.values.map(_._2).toSet == Set(1L)) // one entity, min member id
    assert(got.values.forall(_._3 == 3L))
    assert(got(1L)._1 == "master" && got(Off + 10L)._1 == "probe")
  }

  test("unmatched probes surface as singleton probe entities") {
    val got = resolve(
      probes = Seq(10L -> "alpha", 11L -> "qqqqqqqq"),
      master = Seq(1L -> "alpha"))
    assert(got(Off + 11L) == (("probe", Off + 11L, 1L)))
    assert(got(1L)._2 == 1L && got(Off + 10L)._2 == 1L)
    assert(got(1L)._3 == 2L)
  }

  test("unlinked master records do not appear in the output") {
    val got = resolve(
      probes = Seq(10L -> "alpha"),
      master = Seq(1L -> "alpha", 2L -> "completely different"))
    assert(!got.contains(2L))
    assert(got.keySet == Set(1L, Off + 10L))
  }

  test("partition invariants: probes appear once; entity_id = min member id") {
    val probes = Seq(10L -> "aaaa", 11L -> "aaab", 12L -> "zz",
      13L -> "mmmmmmmmmm")
    val master = Seq(5L -> "aaaa", 6L -> "aaac", 7L -> "zz")
    val rows = Linkage.resolveEntities(
        frame(probes, "pid", "pname"), frame(master, "mid", "mname"), 2, Off)
      .collect()
    val ids = rows.map(_.getAs[Long]("record_id"))
    assert(ids.length == ids.distinct.length)
    assert(probes.map(Off + _._1).toSet.subsetOf(ids.toSet))
    // entity_id equals the minimum record_id of its members
    rows.groupBy(_.getAs[Long]("entity_id")).foreach { case (eid, members) =>
      assert(eid == members.map(_.getAs[Long]("record_id")).min)
      assert(members.forall(_.getAs[Long]("entity_size") == members.length.toLong))
    }
  }
}
