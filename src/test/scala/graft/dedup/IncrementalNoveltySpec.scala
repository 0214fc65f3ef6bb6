package graft.dedup

import graft.SparkTestBase

/** Pins q234 incremental novelty against a brute-force JVM replay on
  * sf0.001 (the md5 day carve, per-doc DISTINCT gram occurrences
  * split known/novel against the out-of-batch corpus gram set) plus
  * its containment relation to q216: a gram novel against the FULL
  * corpus history is necessarily novel against the corpus-minus-batch
  * too, so per-source incremental novelty ≥ would-be retrospective
  * novelty of the same docs. */
class IncrementalNoveltySpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/documents.parquet"))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q234 equals the brute-force incremental replay") {
    assume(fixture)
    val docs = graft.core.Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .map { case (id, src, tx) =>
        val t = tx.split("\\s+").filter(_.nonEmpty)
        (id, src, if (t.length >= 5)
          (0 to t.length - 5).map(i => t.slice(i, i + 5).mkString(" ")).toSet
        else Set.empty[String])
      }
      .filter(_._3.nonEmpty)
    val inBatch = (id: Long) => md5hex(s"day|$id").charAt(0) < '2'
    val corpus = docs.filterNot(d => inBatch(d._1)).flatMap(_._3).toSet
    val batch = docs.filter(d => inBatch(d._1))
    val expected = batch.groupBy(_._2).map { case (src, ds) =>
      val occ = ds.flatMap(d => d._3.toSeq)
      val known = occ.count(corpus)
      src -> (ds.length.toLong, occ.length.toLong, known.toLong,
        (occ.length - known).toLong,
        (occ.length - known).toLong * 1000000L / occ.length)
    }
    val got = DedupQueries.queries("q234_incremental_novelty")(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_grams"), r.getAs[Long]("n_known"),
        r.getAs[Long]("n_novel"), r.getAs[Long]("novelty_ppm"))).toMap
    graft.core.ScratchCache.drain()
    assert(got == expected, s"incremental replay mismatch:\n got=$got\n exp=$expected")
    // non-vacuity on both branches: the carve lands, some batch grams
    // are already known (the semi-join does work), and some are novel
    assert(got.nonEmpty)
    assert(got.values.map(_._3).sum > 0L, "no known grams — corpus side vacuous")
    assert(got.values.map(_._4).sum > 0L, "no novel grams — novelty vacuous")
    assert(got.values.forall { case (_, g, k, n, _) => k + n == g })
  }
}
