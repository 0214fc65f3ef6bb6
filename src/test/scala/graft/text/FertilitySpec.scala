package graft.text

import graft.SparkTestBase

/** Pins q210 tokenizer fertility against a brute-force JVM replay
  * (same whitespace + BPE-pretokenizer regexes Spark compiles), plus
  * the contracts: the planted mixed-script fragments make BPE
  * fertility strictly exceed whitespace fertility in every language,
  * and all ratios are the exact integer milli arithmetic. */
class FertilitySpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/documents.parquet"))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def fertSel(docId: Long) = md5hex(s"fert|$docId").head < '4'
  private def plant(docId: Long): String = (docId % 3) match {
    case 0 => " pre-trained v2.0 state-of-the-art"
    case 1 => " état café naïve señor"
    case _ => " 你好世界 3.14-beta über"
  }

  test("q210 equals the JVM replay; BPE fertility strictly exceeds whitespace everywhere") {
    assume(fixture)
    val bpeRe = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+".r
    val docs = graft.core.Tables.documents(spark, dir)
      .select("doc_id", "lang", "text").collect()
      .map { r =>
        val t = r.getString(2) + (if (fertSel(r.getLong(0))) plant(r.getLong(0)) else "")
        (r.getString(1), t.length.toLong,
          t.split("\\s+").count(_.nonEmpty).toLong,
          bpeRe.findAllIn(t).size.toLong)
      }.filter(_._3 >= 1L)
    val expected = docs.groupBy(_._1).view.mapValues { g =>
      val (c, w, b) = (g.map(_._2).sum, g.map(_._3).sum, g.map(_._4).sum)
      (g.length.toLong, c, w, b, c * 1000 / w, c * 1000 / b, b * 1000 / w)
    }.toMap
    val got = TextQueries.queries("q210_tokenizer_fertility")(spark, dir)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_chars"),
          r.getAs[Long]("n_ws_tokens"), r.getAs[Long]("n_bpe_tokens"),
          r.getAs[Long]("chars_per_ws_milli"), r.getAs[Long]("chars_per_bpe_milli"),
          r.getAs[Long]("bpe_per_ws_milli"))).toMap
    assert(got == expected, s"fertility replay mismatch:\n got=$got\n exp=$expected")
    // the plant must bite in every language: budget conversion is the
    // operator's purpose, and a 1.000 ratio table converts nothing
    got.foreach { case (lang, v) =>
      assert(v._7 > 1000L, s"$lang: bpe_per_ws ${v._7} not > 1000 — plant didn't land") }
  }
}
