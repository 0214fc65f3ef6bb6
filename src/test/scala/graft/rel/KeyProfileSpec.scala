package graft.rel

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q181 key profiler: planted distributions pin each strategy verdict
  * (the oracle only hashes whatever the fixture happens to produce),
  * and the plan must combine map-side — profiling may not cost more
  * than one keyed exchange. */
class KeyProfileSpec extends SparkTestBase {

  private def keyed(rows: Seq[String], tbl: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    rows.toDF("k").select(lit(tbl).as("tbl"), lit("k").as("col_name"), col("k"))
  }

  test("q181 verdicts: small side → broadcast; dominant key → salt; uniform big → hash") {
    // small: 100 rows, under the broadcast threshold regardless of skew
    val small = keyed(Seq.fill(100)("hot"), "small")
    // skewed: 20k rows, one key owns 50% >> SaltPpm
    val skewed = keyed(Seq.fill(10000)("hot") ++ (1 to 10000).map("k" + _), "skewed")
    // uniform: 20k rows over 20k keys
    val uniform = keyed((1 to 20000).map("u" + _), "uniform")
    val out = RelQueries.keyProfileOf(small.unionAll(skewed).unionAll(uniform))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getString(7))).toMap
    assert(out("small") == ((100L, 1L, 100L, 1000000L, "broadcast")), out("small"))
    assert(out("skewed") == ((20000L, 10001L, 10000L, 500000L, "salt")), out("skewed"))
    assert(out("uniform")._5 == "hash", out("uniform"))
    assert(out("uniform")._4 == 50L, "uniform top1 = 1/20000 in ppm")
  }

  test("q181 threshold boundaries: exactly-at-threshold rows hash, exactly-at-ppm salts") {
    // n_rows == BroadcastRows is NOT broadcast (strict <)
    val atRows = keyed((1 to RelQueries.KeyProfileBroadcastRows.toInt).map("r" + _), "atrows")
    // top1 exactly SaltPpm (10%): 1000 hot of 10000 → 100000 ppm ≥ threshold
    val atPpm = keyed(Seq.fill(1000)("hot") ++ (1 to 9000).map("c" + _), "atppm")
    val out = RelQueries.keyProfileOf(atRows.unionAll(atPpm))
      .collect().map(r => r.getString(0) -> (r.getLong(5), r.getString(7))).toMap
    assert(out("atrows")._2 == "hash", out("atrows"))
    assert(out("atppm") == ((100000L, "salt")), out("atppm"))
  }

  test("q189 join-size profile: planted counts give the closed-form cardinality, top key, and empty-overlap zeroes") {
    import spark.implicits._
    // pair p1: left counts {a:2, b:1}, right {a:3, c:4} -> join_rows 6,
    // one matched key, top a (6 rows, 1e6 ppm)
    // pair p2: no shared keys -> all-zero row with NULL top_key
    val rows =
      Seq.fill(2)(("p1", "l", "a")) ++ Seq(("p1", "l", "b")) ++
      Seq.fill(3)(("p1", "r", "a")) ++ Seq.fill(4)(("p1", "r", "c")) ++
      Seq(("p2", "l", "x"), ("p2", "r", "y"))
    val out = RelQueries.joinSizeOf(rows.toDF("pair", "side", "k")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), Option(r.getString(5)), r.getLong(6), r.getLong(7))).toMap
    assert(out("p1") == ((3L, 7L, 1L, 6L, Some("a"), 6L, 1000000L)), out("p1"))
    assert(out("p2") == ((1L, 1L, 0L, 0L, None, 0L, 0L)), out("p2"))
  }

  test("q189: the profile matches the actually-executed join rowcounts on the fixture") {
    val dir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/orders.parquet")))
    val out = graft.SparkEntry.queries("q189_join_size_profile")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val c = spark.read.parquet(s"$dir/customer.parquet")
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    assert(out("orders_customer") ==
      o.join(c, o("o_custkey") === c("c_custkey")).count())
    assert(out("lineitem_orders") ==
      l.join(o, l("l_orderkey") === o("o_orderkey")).count())
  }

  test("q181 catalog plan: map-side partial counts, exchanges carry keys not payloads") {
    val dir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/lineitem.parquet")))
    val p = graft.SparkEntry.queries("q181_key_profile")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_count"), p)
    // scans are pruned to the single profiled column each
    assert(!p.contains("l_extendedprice") && !p.contains("o_totalprice"), p)
  }
}
