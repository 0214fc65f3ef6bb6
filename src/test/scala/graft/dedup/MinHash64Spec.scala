package graft.dedup

import graft.SparkTestBase

/** Evidence for the xxhash64 MinHash path (no DuckDB twin): signature
  * determinism, agreement ∝ Jaccard similarity, and guaranteed band
  * recall for exact duplicates. */
class MinHash64Spec extends SparkTestBase {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def sigRows(d: org.apache.spark.sql.DataFrame) =
    MinHash64.signatures(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong).toSeq).toMap

  test("identical text gives identical signatures; short docs degrade to whole-text shingle") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val sigs = sigRows(docs(1L -> base, 2L -> base, 3L -> "one two", 4L -> "one two"))
    assert(sigs(1L) == sigs(2L))
    assert(sigs(3L) == sigs(4L)) // <3 tokens: whole text as the single shingle
    assert(sigs(1L) != sigs(3L))
  }

  test("signature agreement tracks Jaccard: near-dup shares more components than unrelated") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val oneEdit = ((1 to 39).map(i => s"tok$i") :+ "CHANGED").mkString(" ")
    val unrelated = (1 to 40).map(i => s"zzz$i").mkString(" ")
    val sigs = sigRows(docs(1L -> base, 2L -> oneEdit, 3L -> unrelated))
    def agree(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (x, y) => x == y }
    assert(agree(sigs(1L), sigs(2L)) > agree(sigs(1L), sigs(3L)),
      s"near ${agree(sigs(1L), sigs(2L))} vs unrelated ${agree(sigs(1L), sigs(3L))}")
  }

  test("signatures are partition-count invariant (min is commutative)") {
    val d = docs((1L to 50L).map(i =>
      i -> (1 to 20).map(j => s"t${(i * 7 + j) % 31}").mkString(" ")): _*)
    val one = sigRows(d.repartition(1))
    val seven = sigRows(d.repartition(7))
    assert(one == seven)
  }

  test("candidatePairs catches every exact duplicate and no self/reversed pairs") {
    val base = (1 to 50).map(i => s"w$i").mkString(" ")
    val other = (1 to 50).map(i => s"x$i").mkString(" ")
    val pairs = MinHash64.candidatePairs(
      docs(1L -> base, 2L -> base, 3L -> other, 4L -> other, 5L -> "lone doc here"),
      "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // identical sigs → identical bands, guaranteed
    assert(pairs.contains((3L, 4L)))
    assert(pairs.forall { case (a, b) => a < b })
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(5L) })
  }
}
