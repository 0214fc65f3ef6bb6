package graft.dedup

import graft.SparkTestBase

/** Pins q229 retroactive contamination against a full brute-force JVM
  * replay on sf0.001: v1 decontamination (q81's exact survivor rule),
  * the md5 eval-v2 carve, new-shingle exposure, and the per-source
  * token pricing — recomputed in plain Scala cell-for-cell. */
class RetroContaminationSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/documents.parquet"))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q229 equals the brute-force retro-contamination replay") {
    assume(fixture)
    val docs = graft.core.Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def shingles(text: String): Set[String] = {
      val t = text.split("\\s+").filter(_.nonEmpty)
      if (t.length >= 3) (0 to t.length - 3).map(i => t.slice(i, i + 3).mkString(" ")).toSet
      else Set(text)
    }
    val sh = docs.map { case (id, _, tx) => id -> shingles(tx) }.toMap
    val benchSh = docs.filter(_._1 % 50 == 0).flatMap(d => sh(d._1)).toSet
    val survivors = docs.filter(d => d._1 % 50 != 0 && sh(d._1).intersect(benchSh).isEmpty)
    val isV2 = (id: Long) => md5hex(s"ev2|$id").charAt(0) < '1'
    val v2Sh = survivors.filter(d => isV2(d._1)).flatMap(d => sh(d._1)).toSet
    val audited = survivors.filterNot(d => isV2(d._1))
    val expected = audited.groupBy(_._2).map { case (src, ds) =>
      val nt = (d: (Long, String, String)) =>
        d._3.split("\\s+").count(_.nonEmpty).toLong
      val hit = ds.filter(d => sh(d._1).intersect(v2Sh).nonEmpty)
      val tt = ds.map(nt).sum
      val ct = hit.map(nt).sum
      src -> (ds.length.toLong, tt, hit.length.toLong, ct, ct * 1000000L / tt)
    }
    val got = DedupQueries.queries("q229_retro_contamination")(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> (r.getAs[Long]("n_trained"),
        r.getAs[Long]("trained_tokens"), r.getAs[Long]("n_newly_contaminated"),
        r.getAs[Long]("contaminated_tokens"), r.getAs[Long]("contaminated_ppm"))).toMap
    graft.core.ScratchCache.drain()
    assert(got == expected, s"retro replay mismatch:\n got=$got\n exp=$expected")
    // non-vacuity: the v2 carve lands, contaminates SOMETHING, and
    // does not contaminate everything (the audit separates)
    assert(survivors.exists(d => isV2(d._1)), "v2 carve selected no survivor")
    val totalHit = got.values.map(_._3).sum
    assert(totalHit > 0L && totalHit < got.values.map(_._1).sum)
  }
}
