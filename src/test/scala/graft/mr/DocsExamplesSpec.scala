package graft.mr

/** Byte-for-byte replay of the reference's own doctest goldens
  * (/root/reference/docs.rst) on its LICENSE.txt fixture — the most
  * visible contract of the reference library:
  *
  *  - word count top-3 `[('OR', 8), ('OF', 8), ('the', 7)]`
  *    (docs.rst:158-159);
  *  - the thread-pool variant over two input files doubling the counts to
  *    `[('OR', 16), ('OF', 16), ('the', 14)]` (docs.rst:370-371), which
  *    in this engine is the per-phase parallelism knobs instead of two
  *    pools;
  *  - the key-cycling partition-abuse example `0 52 / 1 48 / 2 49 / 3 38`
  *    (docs.rst:404-407), run through the untyped adapter because its
  *    mapper and reducer emit different value types, like the reference's
  *    dynamic API.
  */
object DocsExampleTasks {

  /** docs.rst:140-150 WordCount: split on whitespace, emit (word, 1),
    * reducer sums. Case-sensitive, exactly like `str.split()`.
    */
  final class DocWordCount extends MapReduce1[String, String, Int, Int] {
    override def keyPreserving: Boolean = true
    def mapper(line: String): IterableOnce[Emit[String, Int, Int]] =
      line.split("\\s+").iterator.filter(_.nonEmpty).map(w => KV(w, 1))
    def reducer(word: String, counts: Seq[Int]): Emit[String, Int, Int] =
      KV(word, counts.sum)
  }

  /** Same task with the phases sized independently — the engine's
    * analogue of the reference passing `mapper_map`/`reducer_map` two
    * different pools (docs.rst:360-368).
    */
  final class PooledWordCount extends MapReduce1[String, String, Int, Int] {
    override def keyPreserving: Boolean = true
    override def mapParallelism: Int = 4
    override def reduceParallelism: Int = 2
    def mapper(line: String): IterableOnce[Emit[String, Int, Int]] =
      line.split("\\s+").iterator.filter(_.nonEmpty).map(w => KV(w, 1))
    def reducer(word: String, counts: Seq[Int]): Emit[String, Int, Int] =
      KV(word, counts.sum)
  }

  /** docs.rst:140-151 WordCount with the `output()` finalizer overridden
    * to a Counter-style most-common view — the reference's user hook
    * that "can in fact do anything" (tinymr.py:93-114, docs.rst:150-151,
    * docs.rst:282-283).
    */
  final class MostCommonWordCount extends MapReduce1[String, String, Int, Int] {
    override def keyPreserving: Boolean = true
    def mapper(line: String): IterableOnce[Emit[String, Int, Int]] =
      line.split("\\s+").iterator.filter(_.nonEmpty).map(w => KV(w, 1))
    def reducer(word: String, counts: Seq[Int]): Emit[String, Int, Int] =
      KV(word, counts.sum)
    override def output(mapping: Map[String, Int]): Any =
      mapping.toSeq.sortBy { case (w, n) => (-n, w) }.take(3)
  }

  /** docs.rst:389-401 KeyCount: each line's words get keys cycling
    * 0,1,2,3; the reducer counts DISTINCT words per key. Mapper emits
    * strings, reducer emits an int — dynamically typed, so it runs
    * through [[UntypedMapReduce]].
    */
  final class KeyCount extends UntypedMapReduce[String] {
    def untypedMapper(line: String): IterableOnce[Product] =
      line.split("\\s+").iterator.filter(_.nonEmpty).zipWithIndex
        .map { case (w, i) => (i % 4, w) }
    def untypedReducer(key: Any, values: Seq[Any]): IterableOnce[Product] =
      Iterator.single((key, values.distinct.size))
  }
}

class DocsExamplesSpec extends SparkSpec {
  import DocsExampleTasks._

  private val LicensePath = "/root/reference/LICENSE.txt"

  private def licenseLines: Seq[String] = {
    val src = scala.io.Source.fromFile(LicensePath)
    try src.getLines().toList finally src.close()
  }

  private def top3(counts: Map[String, Int]): Seq[(String, Int)] =
    counts.toSeq.sortBy { case (w, n) => (-n, w) }.take(3)

  test("docs.rst:158-159 — word count top-3 is [('OR', 8), ('OF', 8), ('the', 7)]") {
    assume(new java.io.File(LicensePath).exists())
    val counts = new DocWordCount().runToMap(sc.parallelize(licenseLines, 3))
    // ('OR', 8) and ('OF', 8) tie; the doctest's order is Counter
    // insertion order, so assert the golden multiset exactly: two words
    // at 8 (OR, OF), third place 'the' at 7, alone at that count.
    assert(counts("OR") == 8)
    assert(counts("OF") == 8)
    assert(counts("the") == 7)
    assert(top3(counts).map(_._2) == Seq(8, 8, 7))
    assert(top3(counts).map(_._1).toSet == Set("OR", "OF", "the"))
    assert(counts.count(_._2 == 8) == 2 && counts.count(_._2 == 7) == 1)
  }

  test("docs.rst:370-371 — two input files double the counts (per-phase pools)") {
    assume(new java.io.File(LicensePath).exists())
    val twoFiles = licenseLines ++ licenseLines
    val counts = new PooledWordCount().runToMap(sc.parallelize(twoFiles, 5))
    assert(counts("OR") == 16)
    assert(counts("OF") == 16)
    assert(counts("the") == 14)
    assert(top3(counts).map(_._2) == Seq(16, 16, 14))
  }

  test("tinymr.py:93-114 — overridden output() finalizer yields the Counter-style top-3") {
    assume(new java.io.File(LicensePath).exists())
    val lines = sc.parallelize(licenseLines, 3)
    val got = new MostCommonWordCount().runOutput(lines)
      .asInstanceOf[Seq[(String, Int)]]
    assert(got.map(_._2) == Seq(8, 8, 7))
    assert(got.map(_._1).toSet == Set("OR", "OF", "the"))
    // un-overridden output() is the identity on the mapping (tinymr.py:113-114)
    val dflt = new DocWordCount().runOutput(lines).asInstanceOf[Map[String, Int]]
    assert(dflt("the") == 7)
  }

  test("docs.rst:404-407 — key-cycling distinct counts are 0:52 1:48 2:49 3:38") {
    assume(new java.io.File(LicensePath).exists())
    val got = new KeyCount().runToMap(sc.parallelize(licenseLines, 3))
    assert(got == Map(0 -> List(52), 1 -> List(48), 2 -> List(49), 3 -> List(38)))
  }
}
