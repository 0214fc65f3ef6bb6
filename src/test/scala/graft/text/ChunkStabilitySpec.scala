package graft.text

import graft.SparkTestBase

/** Pins q233's stability measurement against a brute-force JVM replay
  * on sf0.001 (the md5 edit carve, q91's content gate on both
  * versions, the stride-8 control) and the verdict the table exists
  * to deliver: CDC survives the near-start insertion, fixed stride
  * does not. */
class ChunkStabilitySpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/documents.parquet"))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def cdcChunks(toks: Array[String]): Set[String] = {
    val starts = 1 +: (5 to toks.length).filter { p =>
      md5hex(toks.slice(p - 5, p - 1).mkString(" ")).startsWith("0") }
    val ends = starts.drop(1) :+ (toks.length + 1)
    starts.zip(ends).map { case (st, en) =>
      md5hex(toks.slice(st - 1, en - 1).mkString(" ")) }.toSet
  }
  private def strideChunks(toks: Array[String]): Set[String] =
    toks.grouped(8).map(g => md5hex(g.mkString(" "))).toSet

  test("q233 equals the brute-force stability replay; CDC survives, stride does not") {
    assume(fixture)
    val docs = graft.core.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").filter(_.nonEmpty)))
      .filter { case (id, t) => t.length >= 12 && md5hex(s"edit|$id").charAt(0) < '4' }
    val per = docs.map { case (_, t) =>
      val te = (t.take(3) :+ "zzedit") ++ t.drop(3)
      val (co, ce) = (cdcChunks(t), cdcChunks(te))
      val (so, se) = (strideChunks(t), strideChunks(te))
      (co.size.toLong, co.intersect(ce).size.toLong,
        so.size.toLong, so.intersect(se).size.toLong)
    }
    def agg(n: Seq[Long], sh: Seq[Long]) =
      (per.length.toLong, n.sum, sh.sum, sh.sum * 1000000L / n.sum)
    val expected = Map(
      "cdc" -> agg(per.map(_._1), per.map(_._2)),
      "stride8" -> agg(per.map(_._3), per.map(_._4)))
    val got = TextQueries.queries("q233_chunk_stability")(spark, dir).collect()
      .map(r => r.getAs[String]("scheme") -> (r.getAs[Long]("n_docs_edited"),
        r.getAs[Long]("chunks_orig"), r.getAs[Long]("chunks_survived"),
        r.getAs[Long]("survival_ppm"))).toMap
    assert(got == expected, s"stability replay mismatch:\n got=$got\n exp=$expected")
    // the verdict: CDC resynchronizes (majority of chunks survive the
    // worst-case near-start insertion); fixed stride collapses (every
    // block after token 3 shifts — on ≥12-token docs that is ~all of
    // them, so survival is essentially zero)
    assert(got("cdc")._4 > 500000L, s"CDC survival ${got("cdc")._4} ppm — gate broken?")
    assert(got("stride8")._4 < 100000L, s"stride survival ${got("stride8")._4} ppm — shift not happening?")
    assert(got("cdc")._1 == got("stride8")._1)
  }
}
