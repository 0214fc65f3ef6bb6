package graft.mr

import graft.SparkTestBase

/** Facade laws (SURVEY.md §5 test plan items 1 and 4a/4b):
  * equivalence with a naive Scala groupBy-fold, and partition-count
  * invariance (the reference's N_WORKER knob must never change
  * answers). */
class MapReduceSpec extends SparkTestBase {

  private val corpus = Seq(
    "the quick brown fox",
    "jumps over the lazy dog",
    "the dog barks",
    "", // empty line: no tokens, no pairs
    "fox fox fox")

  // map fns live in the companion so Spark closures don't capture the
  // (non-serializable) suite instance
  import MapReduceSpec.{mapOnes, tokenMap}

  /** Naive single-threaded oracle of the reference pipeline. */
  private def naive(lines: Seq[String],
                    mapFn: (Long, String) => Iterator[(String, String)],
                    reduceFn: (String, Iterator[String]) => Seq[String]): Seq[(String, Seq[String])] =
    lines.zipWithIndex
      .flatMap { case (l, i) => mapFn(i.toLong, l) }
      .groupBy(_._1)
      .map { case (k, kvs) => (k, reduceFn(k, kvs.map(_._2).iterator)) }
      .toSeq.sortBy(_._1)

  test("run == naive groupBy fold (positions reducer)") {
    import spark.implicits._
    val ds = spark.createDataset(corpus)
    val reduceFn = (_: String, vs: Iterator[String]) => vs.toSeq.distinct.sorted
    val got = MapReduce.run(ds, tokenMap, reduceFn, 2).collect().toSeq
    val want = naive(corpus, tokenMap, reduceFn)
    assert(got == want)
  }

  test("numPartitions never changes the answer (N_WORKER invariance)") {
    import spark.implicits._
    val ds = spark.createDataset(corpus)
    val reduceFn = (_: String, vs: Iterator[String]) => Seq(vs.size.toString)
    val results = Seq(1, 2, 7).map(n => MapReduce.run(ds, tokenMap, reduceFn, n).collect().toSeq)
    assert(results.distinct.size == 1)
  }

  test("runFold (algebraic) == run (generic) for a sum reducer") {
    import spark.implicits._
    val ds = spark.createDataset(corpus)
    val generic = MapReduce.run(ds, mapOnes,
      (_, vs) => Seq(vs.map(_.toLong).sum.toString), 2).collect().toSeq
    val folded = MapReduce.runFold[Long](ds, mapOnes,
      0L, (b, v) => b + v.toLong, _ + _, b => Seq(b.toString)).collect().toSeq
    assert(folded == generic)
  }

  test("output is key-sorted (O6: byte-wise string order)") {
    import spark.implicits._
    val ds = spark.createDataset(corpus)
    val keys = MapReduce.run(ds, tokenMap, (_, vs) => vs.toSeq, 3)
      .collect().map(_._1).toSeq
    assert(keys == keys.sorted)
  }
}

object MapReduceSpec {
  val tokenMap: (Long, String) => Iterator[(String, String)] =
    (no, line) => line.split("\\s+").iterator.filter(_.nonEmpty).map(w => (w, no.toString))
  val mapOnes: (Long, String) => Iterator[(String, String)] =
    (_, line) => line.split("\\s+").iterator.filter(_.nonEmpty).map(w => (w, "1"))
}
