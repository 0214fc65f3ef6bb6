package graft.text

import graft.SparkTestBase

/** Pins q207 encoding health against a brute-force JVM replay (same
  * regex dialect Spark compiles), the clean-doc guard (the raw corpus
  * carries zero damage, so unplanted docs must count zero in every
  * class), and the non-vacuity of all four damage classes. */
class EncodingHealthSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/documents.parquet"))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def encSel(docId: Long) = md5hex(s"enc|$docId").head < '4'
  private def plant(docId: Long): String = (docId % 4) match {
    case 0 => ""
    case 1 => " x &amp; y &lt; z &#8212;"
    case 2 => "��"
    case _ => " "
  }

  test("q207 audit equals the JVM replay; unplanted docs are damage-free; all classes live") {
    assume(fixture)
    val ctrl = "[\\x01-\\x08\\x0B\\x0C\\x0E-\\x1F]".r
    val entity = "&(amp|lt|gt|quot|#[0-9]+);".r
    val repl = "�".r
    val nbsp = " ".r
    val docs = graft.core.Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val perDoc = docs.map { case (id, src, text) =>
      val t = text + (if (encSel(id)) plant(id) else "")
      (id, src, ctrl.findAllIn(t).size.toLong, entity.findAllIn(t).size.toLong,
        repl.findAllIn(t).size.toLong, nbsp.findAllIn(t).size.toLong)
    }
    perDoc.filter(d => !encSel(d._1)).foreach { case (id, _, c, e, r, n) =>
      assert(c + e + r + n == 0L, s"unplanted doc $id counted damage ($c,$e,$r,$n)") }
    val expected = perDoc.groupBy(_._2).view.mapValues { g =>
      val aff = g.count(d => d._3 + d._4 + d._5 + d._6 > 0).toLong
      (g.length.toLong, aff, g.map(_._3).sum, g.map(_._4).sum,
        g.map(_._5).sum, g.map(_._6).sum, aff * 1000000L / g.length)
    }.toMap
    val got = TextQueries.queries("q207_encoding_health")(spark, dir)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_affected"),
          r.getAs[Long]("ctrl_occ"), r.getAs[Long]("entity_occ"),
          r.getAs[Long]("repl_occ"), r.getAs[Long]("nbsp_occ"),
          r.getAs[Long]("affected_ppm"))).toMap
    assert(got == expected, s"audit replay mismatch:\n got=$got\n exp=$expected")
    assert(got.values.map(_._3).sum > 0 && got.values.map(_._4).sum > 0 &&
      got.values.map(_._5).sum > 0 && got.values.map(_._6).sum > 0,
      "all four damage classes must be exercised by the plant")
  }
}
