package graft.rel

import graft.SparkTestBase

/** Pins q228's FK orphan audit against a brute-force JVM replay on
  * sf0.001: the md5 damage carve, orphan counts, distinct missing
  * parents — and the clean edges reading EXACTLY zero (the
  * false-positive guard). */
class FkIntegritySpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/lineitem.parquet"))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q228 equals the brute-force orphan replay; clean edges read exactly zero") {
    assume(fixture)
    val li = graft.core.Tables.lineitem(spark, dir)
      .selectExpr("l_orderkey", "l_linenumber", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val ok = graft.core.Tables.orders(spark, dir)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val oc = graft.core.Tables.orders(spark, dir)
      .select("o_custkey").collect().map(_.getLong(0))
    val pk = graft.core.Tables.part(spark, dir)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val ck = graft.core.Tables.customer(spark, dir)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val damagedKeys = li.map { case (o, l, _) =>
      if (md5hex(s"fk|$o|$l").charAt(0) < '2') o + 1000000000L else o }
    def row(keys: Seq[Long], parents: Set[Long]) = {
      val orphans = keys.filterNot(parents)
      (keys.length.toLong, orphans.length.toLong,
        orphans.length.toLong * 1000000L / keys.length,
        orphans.distinct.length.toLong)
    }
    val expected = Map(
      "lineitem_orders" -> row(damagedKeys.toSeq, ok),
      "lineitem_part" -> row(li.map(_._3).toSeq, pk),
      "orders_customer" -> row(oc.toSeq, ck))
    val got = RelQueries.queries("q228_fk_integrity")(spark, dir).collect()
      .map(r => r.getAs[String]("fk_edge") -> (r.getAs[Long]("n_child"),
        r.getAs[Long]("n_orphan"), r.getAs[Long]("orphan_ppm"),
        r.getAs[Long]("n_missing_parents"))).toMap
    assert(got == expected, s"orphan replay mismatch:\n got=$got\n exp=$expected")
    // the verdicts: undamaged edges are EXACTLY clean (false-positive
    // guard) and the planted edge is decisively broken (~12.5% carve)
    assert(got("lineitem_part") == ((li.length.toLong, 0L, 0L, 0L)))
    assert(got("orders_customer")._2 == 0L)
    val (nc, no, ppm, miss) = got("lineitem_orders")
    assert(no > 0L && ppm > 50000L && ppm < 250000L, s"carve off-band: $ppm ppm")
    assert(miss > 0L && miss <= no)
    assert(nc == li.length.toLong)
  }
}
