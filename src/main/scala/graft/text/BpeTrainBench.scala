package graft.text

import org.apache.spark.sql.SparkSession

/** Dev tool: wall-clock curve for the BPE trainers — sequential
  * (q240's one-merge-per-round loop) vs batched (top-M symbol-disjoint
  * merges per round, [[TextQueries.bpeTrainBatchedStates]]) — at
  * production-ish merge counts. This produces the rounds-vs-wall
  * evidence BENCH_SF1.md carries for the r19 verdict's item 4: the
  * sequential shape is one driver job round-trip per merge (fine at 8,
  * an O(merges) wall at 10³–10⁴), the batched shape cuts round-trips
  * to ~merges/M.
  *
  * Usage: sbt "runMain graft.text.BpeTrainBench <sfDir> [spec ...]"
  * where spec is `seq:<merges>` or `bat:<merges>:<batchM>`.
  * Defaults: seq:8 seq:32 seq:64 bat:64:8 bat:256:16.
  */
object BpeTrainBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val specs = if (args.length > 1) args.drop(1).toSeq
      else Seq("seq:8", "seq:32", "seq:64", "bat:64:8", "bat:256:16")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    specs.foreach { spec =>
      val t0 = System.nanoTime()
      val (label, merges, rounds) = spec.split(':') match {
        case Array("seq", m) =>
          val (bests, _) = TextQueries.bpeTrainStates(spark, dir, m.toInt)
          // the trajectory frames are already materialized
          // (localCheckpoint) — count() just confirms
          ("seq", bests.map(_.count()).sum, m.toInt)
        case Array("bat", m, bm) =>
          val (traj, _) = TextQueries.bpeTrainBatchedStates(spark, dir, m.toInt, bm.toInt)
          (s"bat(M=$bm)", traj.size.toLong, traj.map(_._2).distinct.size)
        case other => sys.error(s"bad spec: ${other.mkString(":")}")
      }
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[bpebench] $spec%-12s merges=$merges%4d driver_rounds=$rounds%4d wall=$secs%7.2f s  (${secs / math.max(1, merges)}%.3f s/merge)")
    }
    spark.stop()
  }
}
