package graft

import org.apache.spark.sql.SparkSession
import graft.core.ScratchCache

/** Benchmark main: runs every catalog query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line for the driver.
  *
  * Queries are fully materialized through the noop sink (count() would
  * let Catalyst prune projections and under-measure scan-heavy
  * queries). A warmup query runs first, untimed, so JVM/codegen/parquet
  * footer costs don't land on the alphabetically-first query.
  *
  * Methodology: each query runs SPARK_GRAFT_BENCH_RUNS times (default
  * 3, floored at 1) and the reported per-query number is the LOWER
  * MEDIAN (for even run counts this picks the faster middle run —
  * never the max, which would hand a busy-host spike straight back to
  * the report); "queries_max" carries the worst run. Single-shot
  * timings at sf0.1 under a busy host swing up to 13× (measured: a
  * 1.3 s query reported at 14.1 s), so one-run numbers routinely fake
  * regressions — the median of three is stable to ~1.5× of an
  * isolated run. Scratch caches registered by
  * catalog queries are drained after every run so no storage leaks
  * across the catalog and every run rebuilds its own cache (uniform
  * work per run).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val only = args.toSet // optional query-name subset (local dev)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runNoop(name: String): Boolean =
      try { SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      finally ScratchCache.drain()

    // warmup (untimed): touches the fact table + one agg + one join path
    runNoop("q01_pricing_summary")

    val results = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n)).map { name =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val ok = runNoop(name)
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val ok = times.forall(_._2)
      val sorted = times.map(_._1).sorted
      (name, sorted((sorted.size - 1) / 2), sorted.last, ok)
    }
    // A failing query must not silently lower the total: it is reported
    // as -1 in the per-query map and listed in "failed".
    val qs = results
      .map { case (k, med, _, ok) => "\"" + k + "\":" + (if (ok) med else -1) }.mkString("{", ",", "}")
    val qsMax = results
      .map { case (k, _, mx, ok) => "\"" + k + "\":" + (if (ok) mx else -1) }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, _, false) => "\"" + k + "\"" }.mkString("[", ",", "]")
    val total = results.collect { case (_, med, _, true) => med }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"queries":$qs,"queries_max":$qsMax,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
