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
