package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every catalog query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line for the driver.
  *
  * Queries are fully materialized through the noop sink (count() would
  * let Catalyst prune projections and under-measure scan-heavy
  * queries). A warmup query runs first, untimed, so JVM/codegen/parquet
  * footer costs don't land on the alphabetically-first query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val only = args.toSet // optional query-name subset (local dev)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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

    // warmup (untimed): touches the fact table + one agg + one join path
    runNoop("q01_pricing_summary")

    val results = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n)).map { name =>
      val t0 = System.nanoTime()
      val ok = runNoop(name)
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // A failing query must not silently lower the total: it is reported
    // as -1 in the per-query map and listed in "failed".
    val qs = results
      .map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) v else -1) }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }.mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
