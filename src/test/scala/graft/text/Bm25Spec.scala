package graft.text

import graft.SparkTestBase

/** q92's BM25 retrieval, cross-checked against a driver-side
  * recomputation with the identical double expression tree (one ln,
  * same mul/div grouping, floor(x·10⁴ + ½) quantization before the
  * per-doc integer sum). Also pins the ranking property the operator
  * exists for: the rarest query term dominates the common ones. */
class Bm25Spec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet"))

  private val terms = Seq("dup", "join", "scan", "filter")

  private def expectedTop10: Seq[(Long, Long, Long)] = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").filter(_.nonEmpty)))
      .filter(_._2.nonEmpty)
    val n = docs.length.toLong
    val t = docs.map(_._2.length.toLong).sum
    val df = terms.map(q => q -> docs.count(_._2.contains(q)).toLong).toMap
    docs.flatMap { case (id, toks) =>
      val dl = toks.length.toLong
      val contribs = terms.flatMap { q =>
        val tf = toks.count(_ == q).toLong
        if (tf == 0) None
        else {
          // exact mirror of q92's expression tree
          val idf = 10000.0 * math.log(1.0 + ((n - df(q)) + 0.5) / (df(q) + 0.5))
          val comp = (tf * 2.2) / (tf + 1.2 * (0.25 + ((0.75 * dl) * n) / t))
          Some(math.floor(idf * comp + 0.5).toLong)
        }
      }
      if (contribs.isEmpty) None else Some((id, contribs.sum, contribs.length.toLong))
    }.sortBy { case (id, score, _) => (-score, id) }.take(10).toSeq
  }

  test("q92 top-10 equals the driver-side recomputation exactly") {
    assume(ready)
    val got = TextQueries.queries("q92_bm25_search")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expectedTop10, s"got=$got\nwant=$expectedTop10")
  }

  test("q92 ranks rare-term docs above common-only docs") {
    assume(ready)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").filter(_.nonEmpty).toSet))
    val rare = terms.minBy(q => docs.count(_._2.contains(q)))
    val top = TextQueries.queries("q92_bm25_search")(spark, dir)
      .collect().map(_.getLong(0))
    val rareDocs = docs.filter(_._2.contains(rare)).map(_._1).toSet
    assume(rareDocs.nonEmpty && rareDocs.size < docs.length / 2)
    assert(top.take(3).forall(rareDocs.contains),
      s"idf weighting must float the '$rare' docs to the top; top=$${top.toSeq}")
  }

  test("q145 at production C: exact top-10 fully recalled, champion ranks agree") {
    assume(ready)
    val got = TextQueries.queries("q145_bm25_champions")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.length == 10)
    // candidates bounded by |terms|·C regardless of corpus size
    assert(got.head._6 <= terms.length * 64L, s"candidates ${got.head._6}")
    // exact top-10 and its scores equal q92's answer
    assert(got.map(r => (r._2, r._3)).toSeq ==
      expectedTop10.map { case (id, sc, _) => (id, sc) })
    // on this fixture the champion index recalls everything, and since
    // pruned scores equal exact scores, ranks must line up 1:1
    assert(got.forall(_._4 == 1L), s"missed docs: ${got.filter(_._4 == 0L).toSeq}")
    assert(got.forall(r => r._1 == r._5), s"rank drift: ${got.toSeq}")
  }

  test("q145 core at C=1 pins the miss path: candidates shrink, misses report -1") {
    assume(ready)
    val got = TextQueries.championAudit(spark, dir, 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.length == 10)
    assert(got.head._6 <= terms.length.toLong, s"C=1 candidates ${got.head._6}")
    val missed = got.filter(_._4 == 0L)
    assert(missed.nonEmpty, "C=1 over a 4-term query cannot recall 10 docs")
    assert(missed.forall(_._5 == -1L))
    // found rows keep exact relative order: champion rank increases
    // with exact rank (scores are identical on both sides)
    val foundRanks = got.filter(_._4 == 1L).map(_._5)
    assert(foundRanks.sorted.sameElements(foundRanks), s"order drift: ${got.toSeq}")
  }
}
