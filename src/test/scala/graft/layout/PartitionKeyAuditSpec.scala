package graft.layout

import graft.SparkTestBase

/** Pins q224's partition-key comparison against a brute-force JVM
  * replay on sf0.001 and the fixture's known key shapes: `source` is
  * the generator's perfectly uniform key, `lang` is the skewed one —
  * the audit must rank them that way or it can't be trusted to pick
  * partition columns. */
class PartitionKeyAuditSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/documents.parquet"))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q224 equals the brute-force key replay; lang reads as the skewed key") {
    assume(fixture)
    val docs = graft.core.Tables.documents(spark, dir)
      .select("doc_id", "source", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val n = docs.length.toLong
    def audit(cells: Map[String, Long]): (Long, Long, Long, Long) = {
      val mx = cells.values.max
      (cells.size.toLong, mx, mx * 1000000L / n, mx * cells.size * 1000L / n)
    }
    val expected = Map(
      "id_hash16" -> audit(docs.groupBy(d => md5hex(d._1.toString).substring(0, 1))
        .view.mapValues(_.length.toLong).toMap),
      "source" -> audit(docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap),
      "lang" -> audit(docs.groupBy(_._3).view.mapValues(_.length.toLong).toMap))
    val got = LayoutQueries.queries("q224_partition_key_audit")(spark, dir).collect()
      .map(r => r.getAs[String]("key_name") -> (r.getAs[Long]("n_cells"),
        r.getAs[Long]("max_cell_docs"), r.getAs[Long]("max_cell_ppm"),
        r.getAs[Long]("imbalance_x1000"))).toMap
    assert(got == expected, s"key audit mismatch:\n got=$got\n exp=$expected")
    // fixture shape: source is uniform by construction (imbalance at
    // the 1000 ideal), lang is skewed (en dominates) — the audit must
    // separate them decisively or it can't disqualify a bad key
    assert(got("source")._4 <= 1100L, "source should read near-uniform")
    assert(got("lang")._4 > 1500L, "lang should read decisively skewed")
    assert(got("lang")._4 > got("source")._4)
  }
}
