package graft.layout

import graft.SparkTestBase

/** Pins q226's estimate-vs-actual audit against a brute-force JVM
  * replay on sf0.001, and the two verdicts that give the table its
  * meaning: the uniform FK joins calibrate at err 0 (the case a CBO
  * is trusted on) while the planted-skew self-join under-estimates by
  * well over 2× (the independence-assumption failure that motivates
  * AQE and q181's key profiler). */
class CardinalityAuditSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/lineitem.parquet"))

  test("q226 equals the brute-force cardinality replay; skew row misses as planted") {
    assume(fixture)
    def col1(df: org.apache.spark.sql.DataFrame, c: String): Array[Long] =
      df.selectExpr(s"CAST($c AS BIGINT)").collect().map(_.getLong(0))
    val lo = col1(graft.core.Tables.lineitem(spark, dir), "l_orderkey")
    val lp = col1(graft.core.Tables.lineitem(spark, dir), "l_partkey")
    val ok = col1(graft.core.Tables.orders(spark, dir), "o_orderkey")
    val oc = col1(graft.core.Tables.orders(spark, dir), "o_custkey")
    val pk = col1(graft.core.Tables.part(spark, dir), "p_partkey")
    val ck = col1(graft.core.Tables.customer(spark, dir), "c_custkey")
    def row(a: Array[Long], b: Array[Long]) = {
      val cb = b.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val actual = a.map(k => cb.getOrElse(k, 0L)).sum
      val est = a.length.toLong * b.length.toLong /
        math.max(a.distinct.length.toLong, b.distinct.length.toLong)
      (a.length.toLong, a.distinct.length.toLong, b.length.toLong,
        b.distinct.length.toLong, est, actual,
        math.abs(est - actual) * 1000000L / actual)
    }
    val sk = lo.map(k => math.min(k % 100, 9L))
    val expected = Map(
      "lineitem_orders" -> row(lo, ok), "lineitem_part" -> row(lp, pk),
      "orders_customer" -> row(oc, ck), "skewed_self_mod100cap" -> row(sk, sk))
    val got = LayoutQueries.queries("q226_cardinality_audit")(spark, dir).collect()
      .map(r => r.getAs[String]("join_name") -> (r.getAs[Long]("rows_a"),
        r.getAs[Long]("ndv_a"), r.getAs[Long]("rows_b"), r.getAs[Long]("ndv_b"),
        r.getAs[Long]("est_rows"), r.getAs[Long]("actual_rows"),
        r.getAs[Long]("err_ppm"))).toMap
    assert(got == expected, s"cardinality replay mismatch:\n got=$got\n exp=$expected")
    // the verdicts: FK joins calibrate exactly on the uniform
    // generator; the planted-skew row UNDER-estimates by > 2×
    Seq("lineitem_orders", "lineitem_part", "orders_customer").foreach { j =>
      assert(got(j)._7 == 0L, s"$j should calibrate at err 0 on this generator") }
    val (_, _, _, _, est, actual, err) = got("skewed_self_mod100cap")
    assert(est < actual && err > 500000L,
      s"skew row must under-estimate by >2x: est=$est actual=$actual err=$err")
  }
}
