package graft.layout

import graft.SparkTestBase

/** Pins q217's ANALYZE pass against a brute-force JVM replay on
  * sf0.001 lineitem, plus the documented precondition that l_quantity
  * is an integer-valued DOUBLE in this testdata vintage (the BIGINT
  * cast in both engines is exact only while that holds). */
class ColumnStatsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/lineitem.parquet"))

  test("q217 equals the brute-force stats replay; l_quantity stays integer-valued") {
    assume(fixture)
    val rows = graft.core.Tables.lineitem(spark, dir)
      .selectExpr("l_orderkey", "l_linenumber", "l_quantity",
        "l_returnflag", "l_linestatus", "CAST(CAST(l_shipdate AS DATE) AS STRING) AS d")
      .collect()
    // the documented vintage precondition
    rows.foreach { r =>
      val q = r.getDouble(2)
      assert(q == math.floor(q) && !q.isInfinite, s"l_quantity $q not integer-valued")
    }
    val n = rows.length.toLong
    def stats[T: Ordering](vs: Seq[T]): (Long, Long, String, String) =
      (n - vs.length.toLong, vs.distinct.length.toLong,
        vs.min.toString, vs.max.toString)
    val expected = Map(
      "l_orderkey" -> stats(rows.map(_.getLong(0)).toSeq),
      "l_linenumber" -> stats(rows.map(_.getInt(1)).toSeq),
      "l_quantity" -> stats(rows.map(_.getDouble(2).toLong).toSeq),
      "l_returnflag" -> stats(rows.map(_.getString(3)).toSeq),
      "l_linestatus" -> stats(rows.map(_.getString(4)).toSeq),
      "l_shipdate" -> stats(rows.map(_.getString(5)).toSeq))
    val got = LayoutQueries.queries("q217_column_stats")(spark, dir).collect()
      .map(r => r.getAs[String]("col") -> (r.getAs[Long]("n_nulls"),
        r.getAs[Long]("ndv"), r.getAs[String]("min_val"), r.getAs[String]("max_val"))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (c, e) =>
      assert(got(c) == e, s"column $c: got ${got(c)} expected $e") }
    // one row per column, n_rows constant everywhere
    val out = LayoutQueries.queries("q217_column_stats")(spark, dir).collect()
    assert(out.length == 6)
    assert(out.map(_.getAs[Long]("n_rows")).distinct.toSeq == Seq(n))
  }
}
