package graft.multimodal

import graft.SparkTestBase

/** Pins q212 media integrity against a brute-force JVM replay of the
  * carve + byte arithmetic, and the ground-truth contracts: verdicts
  * are EXACTLY the carve (truncated = carved & even id, padded =
  * carved & odd id, ok = uncarved), the matrix tiles the corpus, and
  * the delta column prices the damage exactly. */
class MediaIntegritySpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/documents.parquet"))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def mintSel(docId: Long) = md5hex(s"mint|$docId").head < '4'

  test("q212 equals the JVM replay; verdicts are exactly the carve; matrix tiles") {
    assume(fixture)
    // declared payload length replayed from Multimodal.syntheticMedia's
    // contract: (8 + id%25) md5 blocks of 16 bytes, trimmed by id%7
    val docs = graft.core.Tables.documents(spark, dir)
      .select("doc_id").collect()
      .map(r => (r.getLong(0), (8 + r.getLong(0) % 25) * 16 - r.getLong(0) % 7))
    val perDoc = docs.map { case (id, n) =>
      val mt = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val actual =
        if (mintSel(id) && id % 2 == 0) n / 2
        else if (mintSel(id)) n + 2
        else n
      val verdict =
        if (actual < n) "truncated" else if (actual > n) "padded" else "ok"
      // ground truth: verdict must be a pure function of the carve
      val expectVerdict =
        if (mintSel(id) && id % 2 == 0) "truncated"
        else if (mintSel(id)) "padded" else "ok"
      assert(verdict == expectVerdict, s"doc $id: $verdict != carve $expectVerdict")
      (mt, verdict, n, actual)
    }
    val expected = perDoc.groupBy(d => (d._1, d._2)).view.mapValues { g =>
      val (dcl, act) = (g.map(_._3).sum, g.map(_._4).sum)
      (g.length.toLong, dcl, act, act - dcl)
    }.toMap
    val got = MultimodalQueries.queries("q212_media_integrity")(spark, dir)
      .collect().map(r => ((r.getAs[String]("media_type"), r.getAs[String]("verdict")),
        (r.getAs[Long]("n_media"), r.getAs[Long]("declared_bytes"),
          r.getAs[Long]("actual_bytes"), r.getAs[Long]("delta_bytes")))).toMap
    assert(got == expected, s"integrity replay mismatch:\n got=$got\n exp=$expected")
    assert(got.values.map(_._1).sum == docs.length.toLong, "matrix must tile the corpus")
    // all three verdicts live, and damage signs are right
    val verdicts = got.keys.map(_._2).toSet
    assert(verdicts == Set("ok", "truncated", "padded"), s"verdicts: $verdicts")
    got.foreach { case ((_, v), (_, _, _, delta)) =>
      if (v == "truncated") assert(delta < 0L)
      else if (v == "padded") assert(delta > 0L)
      else assert(delta == 0L)
    }
  }
}
