package graft

import org.apache.spark.sql.SparkSession
import graft.core.ScratchCache

/** Dev tool: print result-row counts for named catalog queries against
  * an SF directory — the denominator for output-normalized scaling
  * claims. A dedup/containment query whose sf1 wall-clock grows faster
  * than the scan is only a regression if its time-per-OUTPUT-row grew;
  * under near-duplicate replication (ScaleUp's `repN` suffixing) the
  * pair output itself grows super-linearly, and BENCH_SF1.md carries
  * these counts so the ratio is evidenced, not argued.
  *
  * Usage:
  *   sbt "runMain graft.RowCount /root/testdata/sf0.1 q98_containment_dedup q44_dedup_jaccard_verify"
  * With no query names: counts the whole catalog.
  */
object RowCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // q94 replays against the persisted signature artifact (same
    // pre-build the bench does), not the full recompute
    graft.dedup.DedupQueries.ensureSigStore(spark, sfDir)
    names.foreach { n =>
      val c = SparkEntry.queries(n)(spark, sfDir).count()
      ScratchCache.drain()
      println(s"[rowcount] $n $c")
    }
    spark.stop()
  }
}
