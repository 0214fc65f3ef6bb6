package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver star schema + pipeline tables (TESTDATA.md /
  * FIXTURES.md §B). One parquet file per table under `$dir`.
  *
  * All access goes through `spark.read.parquet` so Catalyst gets a
  * relation it can push filters and column pruning into — at 100 TB the
  * scan is the dominant cost and `PushedFilters`/`ReadSchema` pruning is
  * the first-order win.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Every catalog query loads at least one table through here, so this
    // is the one choke point that guarantees the engine's native
    // expressions (ws_tokens & co — used inside shared expr strings all
    // over the catalog) are resolvable in whatever session the caller
    // built. createOrReplaceTempFunction is idempotent and cheap.
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** events.ts has shipped in two parquet vintages: TIMESTAMP(NANOS)
    * (unreadable as a timestamp by Spark — SPARK-40819 — so we read it
    * as nanos-since-epoch and truncate to µs, matching DuckDB's
    * TIMESTAMP_NS→TIMESTAMP cast) and plain timestamp[us] (read by
    * Spark as TIMESTAMP_NTZ). Normalize BOTH to session-tz TimestampType
    * at microsecond precision; with session tz pinned to UTC every
    * downstream query and the DuckDB oracle see identical values. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // Two inference overrides, SCOPED to this one read (set-and-restore
    // — 4.1.2's ParquetOptions accepts neither as a reader option, and
    // leaving them pinned session-wide would silently re-type a future
    // parquet source with a legitimate NTZ column depending on load
    // order; TablesSpec pins that an NTZ table read AFTER events keeps
    // its type). Both confs are consulted ONLY during the eager schema
    // inference inside spark.read.parquet, never again at action time
    // (verified empirically on both legacy vintages), so restoring
    // before the frame executes is safe:
    //  - nanosAsLong: TIMESTAMP(NANOS) is otherwise unreadable
    //    (SPARK-40819) — read as nanos-since-epoch and truncate below;
    //  - inferTimestampNTZ=false: infer isAdjustedToUTC=false
    //    (timestamp[us]) columns as LTZ directly instead of NTZ — with
    //    the session tz pinned to UTC the values are identical, but the
    //    column is then a PLAIN scan output rather than a cast
    //    projection, so ts predicates reach the parquet reader as
    //    PushedFilters (row-group pruning at 100 TB) instead of dying
    //    at a Cast node above the scan.
    val confKeys = Seq("spark.sql.legacy.parquet.nanosAsLong",
      "spark.sql.parquet.inferTimestampNTZ.enabled")
    val prior = confKeys.map(k => k -> spark.conf.getOption(k))
    val raw =
      try {
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        table(spark, dir, "events")
      } finally prior.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      }
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported parquet physical type $other — expected " +
            "INT64 nanos, TIMESTAMP_NTZ (timestamp[us]) or TIMESTAMP")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Register every table as a temp view under its own name, so
    * `spark.sql("SELECT ... FROM lineitem ...")` works directly — the
    * engine's SQL entry point. `events` goes through its µs-truncating
    * loader so SQL sees the same timestamps as the DataFrame API. */
  def registerTempViews(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
    events(spark, dir).createOrReplaceTempView("events")
  }
}
