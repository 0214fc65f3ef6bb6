package graft.text

import java.security.MessageDigest
import graft.SparkTestBase

/** q111's corpus-duplicated-segment removal: planted boilerplate at
  * segment boundaries is dropped from EVERY document carrying it, the
  * cleaned text reconstructs in segment order (clean_md5), an
  * all-boilerplate document cleans to the empty string, and the
  * accounting invariants (segment count, kept + dropped = total)
  * hold on real data via full driver-side recomputation. */
class LineDedupSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet"))

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Driver-side mirror of q111's contract. */
  private def recompute(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Long, Long, Long, String)] = {
    val k = TextQueries.LineSegToks
    val segs = docs.map { case (id, text) =>
      id -> text.split("\\s+").filter(_.nonEmpty).grouped(k).map(_.mkString(" ")).toVector
    }
    val dup = segs.flatMap { case (id, ss) => ss.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      .filter(_._2 >= 2).keySet
    segs.map { case (id, ss) =>
      val nToks = ss.iterator.map(_.split(" ").length.toLong).sum
      val kept = ss.filterNot(dup)
      val keptToks = kept.iterator.map(_.split(" ").length.toLong).sum
      (id, nToks, ss.size.toLong, ss.count(dup).toLong, keptToks,
        (nToks - keptToks) * 1000000L / nToks, md5hex(kept.mkString(" ")))
    }.sortBy(_._1)
  }

  private def run(rows: Seq[(Long, String)]): Seq[(Long, Long, Long, Long, Long, Long, String)] = {
    import spark.implicits._
    TextQueries.lineDedupOf(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6))).toSeq
  }

  test("planted aligned boilerplate is dropped everywhere; clean text reconstructs") {
    val rows = Seq(
      0L -> "nav home about us contact page alpha beta gamma",
      1L -> "nav home about x y z unique1 w1 w2",
      2L -> "aa bb cc nav home about dd ee",
      3L -> "solo only words",
      4L -> "nav home about")
    val got = run(rows)
    assert(got == recompute(rows))
    val byId = got.map(r => r._1 -> r).toMap
    // "nav home about" sits at a segment boundary in docs 0,1,2,4 → dropped from all four
    assert(byId(0L)._4 == 1L && byId(0L)._5 == 6L)
    assert(byId(0L)._7 == md5hex("us contact page alpha beta gamma"))
    assert(byId(2L)._7 == md5hex("aa bb cc dd ee"))
    // untouched doc keeps everything
    assert(byId(3L)._4 == 0L && byId(3L)._6 == 0L && byId(3L)._7 == md5hex("solo only words"))
    // all-boilerplate doc cleans to the empty string, ppm = 1e6
    assert(byId(4L)._5 == 0L && byId(4L)._6 == 1000000L && byId(4L)._7 == md5hex(""))
  }

  test("misaligned repeat is NOT flagged (tumbling segments, the documented contract)") {
    val rows = Seq(
      0L -> "nav home about us contact page",
      1L -> "pad nav home about x y") // repeat shifted off the 3-token grid
    val got = run(rows)
    assert(got == recompute(rows))
    assert(got.forall(_._4 == 0L), s"no aligned duplicate segment exists: $got")
  }

  test("q111 equals the driver-side recomputation on real data") {
    assume(ready)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = TextQueries.queries("q111_line_dedup")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6))).toSeq
    val expected = recompute(docs.filter(_._2.split("\\s+").exists(_.nonEmpty)))
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // accounting invariants
    got.foreach { case (id, nToks, nSegs, _, keptToks, _, _) =>
      assert(nSegs == (nToks - 1) / TextQueries.LineSegToks + 1, s"doc $id segment count")
      assert(keptToks <= nToks, s"doc $id kept_toks bound")
    }
  }
}
