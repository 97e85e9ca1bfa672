package graft.operators

import graft.mr.SparkSpec

/** Randomized differential pin for q208: the distributed window census
  * must equal a brute-force single-JVM recomputation on arbitrary
  * corpora — not just the hand-built fixtures. Documents are generated
  * from a SMALL vocabulary at short lengths so duplicate 8-token
  * windows arise naturally (not only via plants), exercising the
  * corpus-wide >=2 rule, per-doc distinctness, per-source mass
  * accounting, and the top-offender tiebreak on adversarial inputs a
  * hand fixture would never include. Fixed seed for determinism.
  */
class ExactSubstrPropertySpec extends SparkSpec {
  import spark.implicits._

  private val L = Curation.ExactSubstrL
  private val vocab = Vector("a", "b", "c") // tiny -> natural collisions

  private def doc(rnd: scala.util.Random): String =
    Seq.fill(L + rnd.nextInt(2 * L))(vocab(rnd.nextInt(vocab.length)))
      .mkString(" ")

  /** Brute-force reference: same plant rule, same per-doc-distinct
    * windows, corpus-wide doc frequency, per-source rollup.
    */
  private def reference(rows: Seq[(String, Long, String)])
      : Map[String, (Long, Long, Long, Option[Long], Option[String])] = {
    val plant = " license plate sentence shared verbatim across documents for dedup canary"
    val winsByDoc = rows.map { case (src, id, text) =>
      val t = (if (text == null) "" else text) + (if (id % 17 == 0) plant else "")
      val toks = t.split(" ").filter(_.nonEmpty)
      (src, toks.sliding(L).filter(_.length == L).map(_.mkString(" ")).toSet)
    }
    val totalDocs = winsByDoc.flatMap { case (_, ws) => ws }
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    winsByDoc.groupBy(_._1).collect {
      case (src, docs) if docs.exists(_._2.nonEmpty) =>
        val df = docs.flatMap(_._2).groupBy(identity)
          .map { case (w, xs) => w -> xs.size.toLong }
        val dup = df.filter { case (w, _) => totalDocs(w) >= 2L }
        val top = if (dup.isEmpty) None
          else Some(dup.keys.maxBy(w => (totalDocs(w), w)))
        src -> ((df.size.toLong, dup.size.toLong, dup.values.sum,
          if (dup.isEmpty) None else Some(dup.keys.map(totalDocs).max),
          top))
    }
  }

  test("hashed-key (100 TB) mode == string-key (oracle) mode on random corpora") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 2) {
      val rows = (0 until 80).map { i =>
        (s"s${i % 5}", i.toLong, doc(rnd))
      }
      val df = rows.toDF("source", "doc_id", "text")
      val str = Curation.exactSubstrOf(df, hashKeys = false).collect().toSeq
      val hsh = Curation.exactSubstrOf(df, hashKeys = true).collect().toSeq
      assert(str == hsh, s"trial $trial: modes diverge")
    }
  }

  test("distributed census == brute force on random small-vocabulary corpora") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val rows = (0 until 60).map { i =>
        (s"s${i % 4}", i.toLong, if (i == 13) null else doc(rnd))
      }
      val got = Curation.exactSubstrOf(rows.toDF("source", "doc_id", "text"))
        .collect().map { r =>
          r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
            Option(r.get(4)).map(_.asInstanceOf[Long]),
            Option(r.getString(5))))
        }.toMap
      val want = reference(rows)
      assert(got == want, s"trial $trial: got $got\nwant $want")
    }
  }
}
