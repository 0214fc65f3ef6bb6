package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet // optional query-name filter (local dev)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Per-query time budget (construction + execution + write), r12
    // lesson: one builder that never returns must become ONE failed
    // entry, not zero the whole correctness artifact. On timeout the
    // query's job group is cancelled so its half-run Spark jobs don't
    // keep competing with the remaining sweep; NonFatal exceptions stay
    // per-query failures, fatal errors abort the run (Preflight
    // rethrows them).
    val timeoutMs =
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_TIMEOUT_SEC", "600").toLong * 1000L
    val sc = spark.sparkContext
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      graft.core.Preflight.bounded(name, timeoutMs,
          onTimeout = () => sc.cancelJobGroup(s"verify-$name")) {
        sc.setJobGroup(s"verify-$name", name, interruptOnCancel = true)
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        finally sc.clearJobGroup()
      }.left.foreach(m => System.err.println(s"[verify] $name failed: $m"))
      graft.core.ScratchCache.drain()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // the no-oracle queries' documented justification — distinguishes
    // "unverifiable by design" (sketches, Spark-native hash fns) from
    // "unverified" in the correctness artifact
    val reasons = SparkEntry.noOracleReasons
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/no_oracle_reasons.json"), reasons)
    spark.stop()
  }
}
