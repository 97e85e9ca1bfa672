package graft.operators

import graft.mr.SparkSpec

/** The r17 verdict's residual q208 hole, closed: hashed-key (100 TB)
  * mode equals string-key (oracle) mode ON THE REAL DRIVER CORPUS at
  * sf0.1 — 5,000 documents, ~300k distinct windows — not just the
  * small-vocabulary random corpora of ExactSubstrPropertySpec. The
  * same equality is also driver-checked every round at verify SF via
  * q210 (registered against the string-mode oracle); this spec is the
  * larger-corpus CI pin.
  */
class ExactSubstrScaleModeSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.1"

  test("q208 hashed mode == string mode on the sf0.1 documents corpus") {
    assume(new java.io.File(s"$d/documents.parquet").exists())
    val docs = graft.Tables.documents(spark, d)
    val str = Curation.exactSubstrOf(docs).collect().toSeq
    val hsh = Curation.exactSubstrOf(docs, hashKeys = true).collect().toSeq
    assert(str == hsh, "scale-mode divergence on the driver corpus")
  }

  test("q209 dedup rollup: hashed mode == string mode on the sf0.1 documents corpus") {
    assume(new java.io.File(s"$d/documents.parquet").exists())
    val docs = graft.Tables.documents(spark, d)
    val str = Curation.exactSubstrDedupOf(docs).collect().toSeq
    val hsh = Curation.exactSubstrDedupOf(docs, hashKeys = true).collect().toSeq
    // the md5 witnesses ride the rollup, so this equality certifies the
    // REWRITTEN TEXT byte-identical across key modes, not just counts
    assert(str == hsh, "rewrite scale-mode divergence on the driver corpus")
  }
}
