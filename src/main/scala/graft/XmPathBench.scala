package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time q236 cross-modal retrieval under each dispatched
  * physical path — auto (the production cardinality-probe dispatch),
  * forced broadcast, forced salted shuffled hash join — against an SF
  * directory. This produced the evidence BENCH_SF1.md carries for the
  * [[graft.sim.SimilarityQueries.XmBroadcastMaxCandidates]] policy:
  * at the 100× replica (5.2k-query fleet × 128 buckets × 200k-vector
  * index ≈ 64M candidate pairs) the broadcast path measured ~100 s —
  * its scoring parallelism is whatever the source file layout gives,
  * and a 55 MB index packs into a handful of scan partitions — while
  * the salted shuffle
  * measured ~14 s by spreading the identical candidate scoring across
  * every reducer. Below the candidate cap the ordering flips: the
  * work is trivial either way and broadcast wins by never shuffling
  * the corpus.
  *
  * Usage: sbt "runMain graft.XmPathBench /tmp/graft_sf10"
  */
object XmPathBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // second arg "xmtopk" times the promoted high-recall entry point
    // instead of the q236 catalog default; optional "carve=N" third
    // arg shrinks the fleet modulus (97 → N) to synthesize a
    // proportionally larger query fleet from the same corpus — the
    // next-decade dispatch-flip measurement (xmtopk mode only)
    val useTopK = args.lift(1).contains("xmtopk")
    val carve = args.find(_.startsWith("carve=")).map(_.drop(6).toInt).getOrElse(97)
    for (path <- Seq(None, Some("broadcast"), Some("shuffle"))) {
      // carve only reaches xmTopK, so the label carries the suffix only
      // in xmtopk mode — a 'carve=N' arg without 'xmtopk' would
      // otherwise label unchanged %97-fleet rows as a synthesized fleet
      val label = (if (useTopK) "xmtopk-" else "") + path.getOrElse("auto") +
        (if (useTopK && carve != 97) s"-carve$carve" else "")
      // REBUILD the plan per execution (Bench semantics): reusing one
      // DataFrame across drains would time runs whose ScratchCache
      // persists (xmTopK's qfeat decode) were already unpersisted —
      // a plan production never runs, and one that re-decodes the
      // fleet once per union branch (caught by the r19 self-review)
      def build() =
        if (useTopK) graft.sim.SimilarityQueries.xmTopK(spark, sfDir, forcePath = path, carve = carve)
        else graft.sim.SimilarityQueries.q236Plan(spark, sfDir, path)
      // warm once (parquet footers, codegen), then time two runs. A
      // path that fails (e.g. a deliberately out-of-envelope forced
      // plan at a synthetic-fleet point) is reported and the bench
      // moves on — the failure IS a measurement.
      try {
        build().write.format("noop").mode("overwrite").save()
        graft.core.ScratchCache.drain()
        (1 to 2).foreach { i =>
          val t0 = System.nanoTime()
          build().write.format("noop").mode("overwrite").save()
          println(f"[xmpath] $label run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
          graft.core.ScratchCache.drain()
        }
      } catch {
        case e: Throwable =>
          println(s"[xmpath] $label FAILED: ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString)
          graft.core.ScratchCache.drain()
      }
    }
    spark.stop()
  }
}
