package graft

import graft.mr.SparkSpec

/** Driver-contract insurance: entry() must return rows on the smoke SF
  * and every declared query must have either an oracle or a documented
  * rows-only status; oracle keys must be a subset of query names.
  */
class EntrySpec extends SparkSpec {

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("query names are unique and well-formed") {
    assert(SparkEntry.queries.keys.forall(_.matches("q\\d+_[a-z0-9_]+")))
  }
}
