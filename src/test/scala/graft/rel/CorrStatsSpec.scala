package graft.rel

import graft.SparkTestBase

/** q115's exact-decimal covariance/correlation: agrees with Spark's
  * built-in streaming aggregates to floating tolerance (the built-ins
  * are order-dependent, which is why the catalog never uses them — but
  * they're a fine cross-check), and correlation stays in [−1, 1]. */
class CorrStatsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/lineitem.parquet"))

  test("q115 matches Spark's built-in covar_samp/corr within tolerance") {
    assume(ready)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = RelQueries.queries("q115_corr_stats")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val ref = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        covar_samp($"l_quantity", $"l_extendedprice").as("cv"),
        corr($"l_quantity", $"l_extendedprice").as("cr"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (k, (n, cv, cr)) =>
      val (rn, rcv, rcr) = ref(k)
      assert(n == rn, s"group $k count")
      assert(math.abs(cv - rcv) <= 1e-4 * math.max(1.0, math.abs(rcv)), s"group $k covar: $cv vs $rcv")
      assert(math.abs(cr - rcr) <= 1e-6, s"group $k corr: $cr vs $rcr")
      assert(cr >= -1.0 && cr <= 1.0, s"group $k corr range")
    }
  }
}
