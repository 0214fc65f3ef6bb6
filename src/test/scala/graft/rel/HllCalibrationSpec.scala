package graft.rel

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Error calibration for q25's approx_count_distinct (HLL++) — the
  * evidence that licenses its rows-only oracle status, the way
  * q106's signature-vs-exact calibration licenses the MinHash
  * estimator and q47/q55's md5 twins license xxhash64: measure
  * `|approx − exact| / exact` (reported as ppm) on the real testdata
  * across the three cardinality regimes the engine meets —
  *
  *   low   (~10¹):  distinct l_returnflag × l_linestatus keys — the
  *                  sparse-mode regime, where HLL++ stores exact
  *                  hashes and the error must be ZERO
  *   mid   (~10³):  distinct l_partkey per l_returnflag group (q25's
  *                  own shape)
  *   high  (~10⁴+): distinct l_orderkey corpus-wide
  *
  * Documented bound: Spark's default rsd is 0.05 (the standard error
  * of the HLL++ estimator); a correct implementation stays within
  * 3σ = 15% relative error with ~99.7% probability, and the sketch
  * is deterministic for a fixed input, so the assertion is stable.
  * The tighter-rsd run (0.01 → 3σ = 3%) pins that error CONVERGES
  * with sketch precision — the property a miscalibrated sketch
  * breaks first. CATALOG.md's q25 row cites this suite. */
class HllCalibrationSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.01"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/lineitem.parquet"))

  /** (exact, approx, err_ppm) for approx_count_distinct(col, rsd)
    * against countDistinct(col), grouped by `key` (pass a literal for
    * the corpus-wide regime). Worst group's ppm is returned. */
  private def worstErrPpm(keyCol: String, valCol: String, rsd: Double): (Long, Long) = {
    import spark.implicits._
    val rows = graft.core.Tables.lineitem(spark, dir)
      .groupBy(col(keyCol))
      .agg(countDistinct(col(valCol)).as("exact"),
        approx_count_distinct(col(valCol), rsd).as("approx"))
      .select($"exact", $"approx",
        (abs($"approx" - $"exact") * 1000000L / $"exact").cast("long").as("ppm"))
      .collect()
    (rows.map(_.getAs[Long]("ppm")).max, rows.map(_.getAs[Long]("exact")).min)
  }

  test("low cardinality (sparse mode): approx is EXACT") {
    assume(ready)
    import spark.implicits._
    val r = graft.core.Tables.lineitem(spark, dir)
      .select(concat_ws("|", $"l_returnflag", $"l_linestatus").as("k"))
      .agg(countDistinct($"k").as("exact"),
        approx_count_distinct($"k", 0.05).as("approx"))
      .collect()(0)
    assert(r.getAs[Long]("exact") < 20, "fixture drifted: low regime should be ~10^1")
    assert(r.getAs[Long]("approx") == r.getAs[Long]("exact"),
      s"sparse-mode HLL must be exact: ${r}")
  }

  test("mid cardinality (q25's shape): per-flag error within 3 sigma of rsd, converges with precision") {
    assume(ready)
    val (ppm5, minExact) = worstErrPpm("l_returnflag", "l_partkey", 0.05)
    assert(minExact > 500, s"fixture drifted: mid regime should be ~10^3, got $minExact")
    assert(ppm5 <= 150000L, s"worst per-group err ${ppm5} ppm > 15% (3 sigma at rsd=0.05)")
    val (ppm1, _) = worstErrPpm("l_returnflag", "l_partkey", 0.01)
    assert(ppm1 <= 30000L, s"worst per-group err ${ppm1} ppm > 3% (3 sigma at rsd=0.01)")
    assert(ppm1 <= math.max(ppm5, 10000L),
      s"error must not degrade as rsd tightens: rsd=.01 -> $ppm1 ppm vs rsd=.05 -> $ppm5 ppm")
  }

  test("high cardinality: corpus-wide orderkey error within 3 sigma") {
    assume(ready)
    import spark.implicits._
    val r = graft.core.Tables.lineitem(spark, dir)
      .agg(countDistinct($"l_orderkey").as("exact"),
        approx_count_distinct($"l_orderkey", 0.05).as("approx"))
      .select($"exact", $"approx",
        (abs($"approx" - $"exact") * 1000000L / $"exact").cast("long").as("ppm"))
      .collect()(0)
    assert(r.getAs[Long]("exact") > 10000, s"fixture drifted: high regime should be ~10^4+: $r")
    assert(r.getAs[Long]("ppm") <= 150000L, s"err ${r.getAs[Long]("ppm")} ppm > 15%: $r")
  }
}
