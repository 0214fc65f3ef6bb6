package graft.text

import graft.SparkTestBase

/** Pins q209 against a full brute-force JVM replay — the planted
  * jargon, the min-frequency vocab threshold, and both roll-ups are
  * recomputed in plain Scala and compared cell-for-cell — plus the
  * ground-truth contracts: every planted jargon type is OOV (it sits
  * an order of magnitude under the mass bar), every original corpus
  * type is in-vocab on this fixture, and OOV mass is exactly the
  * planted mass. */
class OovRateSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/documents.parquet"))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def oovSel(docId: Long) = md5hex(s"oov|$docId").head < '4'

  test("q209 equals the JVM replay; jargon OOV, corpus in-vocab, mass accounted") {
    assume(fixture)
    val docs = graft.core.Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map { r =>
        val id = r.getLong(0)
        val t = r.getString(2) + (if (oovSel(id)) s" jargon${id % 16}" else "")
        (id, r.getString(1), t.split("\\s+").filter(_.nonEmpty))
      }.filter(_._3.nonEmpty)
    val total = docs.map(_._3.length.toLong).sum
    val counts = docs.flatMap(_._3).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val vocab = counts.filter { case (_, c) => c * 1000 >= total }.keys.toSet
    // planted jargon under the bar, corpus words above it
    (0 until 16).map(i => s"jargon$i").filter(counts.contains).foreach(j =>
      assert(!vocab(j), s"planted $j must be OOV (count ${counts(j)} vs total $total)"))
    counts.keys.filterNot(_.startsWith("jargon")).foreach(w =>
      assert(vocab(w), s"corpus type $w fell out of vocab"))
    val expected = docs.groupBy(_._2).view.mapValues { g =>
      val toks = g.flatMap(_._3)
      val oov = toks.filterNot(vocab)
      (toks.length.toLong, oov.length.toLong,
        oov.length.toLong * 1000000L / toks.length,
        oov.distinct.length.toLong)
    }.toMap
    val got = TextQueries.queries("q209_oov_rate")(spark, dir)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
          r.getAs[Long]("oov_ppm"), r.getAs[Long]("n_oov_types"))).toMap
    assert(got == expected, s"OOV replay mismatch:\n got=$got\n exp=$expected")
    // OOV mass is exactly the planted mass (no false positives/negatives)
    val planted = docs.count(d => oovSel(d._1)).toLong
    assert(got.values.map(_._2).sum == planted,
      s"OOV occurrences ${got.values.map(_._2).sum} != planted docs $planted")
  }
}
