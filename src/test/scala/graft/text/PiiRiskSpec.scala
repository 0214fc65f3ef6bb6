package graft.text

import graft.SparkTestBase

/** Pins q206 PII risk triage against a brute-force JVM replay (same
  * java.util.regex patterns Spark compiles), plus the contracts the
  * hash can't name: every unplanted doc triages CLEAN (the
  * false-positive guard), the planted combos exercise all four tiers,
  * and the tier is exactly the distinct-class count. */
class PiiRiskSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/documents.parquet"))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def piiSel(docId: Long) = md5hex(s"pii|$docId").head < '4'
  private def plant(docId: Long): String = (docId % 4) match {
    case 0 => " contact bob@example.com"
    case 1 => " call 555-123-4567 or mail sue@example.org"
    case 2 => " host 10.1.2.3 admin jo@example.net phone 555-987-6543"
    case _ => " server 192.168.0.1"
  }

  test("q206 triage equals the JVM regex replay; unplanted docs clean; all tiers live") {
    assume(fixture)
    val email = TextQueries.emailRe.r
    val phone = TextQueries.phoneRe.r
    val ip = TextQueries.ipRe.r
    val docs = graft.core.Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val perDoc = docs.map { case (id, src, text) =>
      val t = text + (if (piiSel(id)) plant(id) else "")
      val (e, p, i) = (email.findAllIn(t).size.toLong,
        phone.findAllIn(t).size.toLong, ip.findAllIn(t).size.toLong)
      val classes = Seq(e, p, i).count(_ > 0)
      val tier = classes match {
        case 0 => "clean"; case 1 => "low"; case 2 => "high"; case _ => "critical" }
      (id, src, tier, e, p, i)
    }
    // false-positive guard: the raw corpus is PII-free
    perDoc.filter { case (id, _, _, _, _, _) => !piiSel(id) }
      .foreach { case (id, _, tier, _, _, _) =>
        assert(tier == "clean", s"unplanted doc $id triaged $tier") }
    val expected = perDoc.groupBy(d => (d._2, d._3)).view
      .mapValues(g => (g.length.toLong, g.map(_._4).sum, g.map(_._5).sum, g.map(_._6).sum))
      .toMap
    val got = TextQueries.queries("q206_pii_risk")(spark, dir)
      .collect().map(r => ((r.getAs[String]("source"), r.getAs[String]("tier")),
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_email"),
          r.getAs[Long]("n_phone"), r.getAs[Long]("n_ip")))).toMap
    assert(got == expected, s"triage replay mismatch:\n got=$got\n exp=$expected")
    val tiers = got.keys.map(_._2).toSet
    assert(tiers == Set("clean", "low", "high", "critical"),
      s"planted combos must exercise every tier: $tiers")
  }
}
