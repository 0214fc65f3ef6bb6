package graft.core

import graft.SparkTestBase

/** The SQL entry point: registered views answer the same queries as the
  * DataFrame API, including the events µs-truncation contract. */
class TablesSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("registerTempViews lets spark.sql run the star schema directly") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/lineitem.parquet")))
    Tables.registerTempViews(spark, dir)
    val viaSql = spark.sql(
      "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1 ORDER BY 1")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaDf = {
      import org.apache.spark.sql.functions._
      Tables.lineitem(spark, dir).groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n")).orderBy(col("l_returnflag"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    assert(viaSql == viaDf && viaSql.nonEmpty)
  }

  test("events loader: timestamp[us] (NTZ) vintage normalizes to TimestampType, exact µs") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("events-us-vintage").toString
    // 2021-03-04T05:06:07.123456 as µs since epoch, written as TIMESTAMP_NTZ
    val micros = 1614834367123456L
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts", TimestampNTZType), StructField("etype", StringType)))
    val rows = java.util.Arrays.asList(
      Row(1L, 10L, java.time.LocalDateTime.ofEpochSecond(
        micros / 1000000L, (micros % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC), "click"))
    spark.createDataFrame(rows, schema)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Tables.events(spark, tmp)
    assert(got.schema("ts").dataType == TimestampType)
    val ts = got.select(unix_micros(col("ts"))).head().getLong(0)
    assert(ts == micros, s"expected $micros, got $ts")
  }

  test("events loader: INT64-nanos vintage truncates to µs TimestampType") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("events-ns-vintage").toString
    val nanos = 1614834367123456789L // µs truncation drops the trailing 789
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts", LongType), StructField("etype", StringType)))
    spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, 10L, nanos, "click")), schema)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Tables.events(spark, tmp)
    assert(got.schema("ts").dataType == TimestampType)
    val ts = got.select(unix_micros(col("ts"))).head().getLong(0)
    assert(ts == nanos / 1000L, s"expected ${nanos / 1000L}, got $ts")
  }

  test("events loader (µs vintage): ts predicates reach the parquet scan as PushedFilters") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("events-pushdown").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts", TimestampNTZType), StructField("etype", StringType)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, 10L, java.time.LocalDateTime.of(2021, 1, 1, 0, 0), "click"),
        Row(2L, 11L, java.time.LocalDateTime.of(2022, 1, 1, 0, 0), "view")),
      schema).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val filtered = Tables.events(spark, tmp)
      .filter(col("ts") > lit(java.sql.Timestamp.valueOf("2021-06-01 00:00:00")))
    val plan = filtered.queryExecution.executedPlan.toString
    // ts must be a plain scan column (LTZ inference), not a cast
    // projection that strands the predicate above the scan
    assert(plan.contains("PushedFilters:") && plan.contains("GreaterThan(ts"),
      s"ts predicate not pushed to the parquet reader:\n$plan")
    assert(filtered.count() == 1)
  }

  test("events loader handles the driver testdata vintage (whatever it is today)") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/events.parquet")))
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(got.limit(1).count() == 1)
  }

  test("events loader's inference confs do not leak: an NTZ table read after events keeps NTZ") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("events-conf-scope").toString
    val evSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts", TimestampNTZType), StructField("etype", StringType)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, 10L, java.time.LocalDateTime.of(2021, 1, 1, 0, 0), "click")),
      evSchema).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val otherSchema = StructType(Seq(
      StructField("k", LongType), StructField("when", TimestampNTZType)))
    spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, java.time.LocalDateTime.of(2021, 1, 1, 0, 0))),
      otherSchema).write.mode("overwrite").parquet(s"$tmp/other.parquet")
    val priorNanos = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    val priorInfer = spark.conf.getOption("spark.sql.parquet.inferTimestampNTZ.enabled")
    val ev = Tables.events(spark, tmp)
    assert(ev.schema("ts").dataType == TimestampType) // LTZ inference still applied to events
    // the overrides were restored, so an unrelated parquet source with a
    // legitimate NTZ column is NOT silently re-typed by load order
    assert(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong") == priorNanos)
    assert(spark.conf.getOption("spark.sql.parquet.inferTimestampNTZ.enabled") == priorInfer)
    val other = spark.read.parquet(s"$tmp/other.parquet")
    assert(other.schema("when").dataType == TimestampNTZType,
      s"NTZ column re-typed to ${other.schema("when").dataType} after Tables.events")
    assert(ev.count() == 1 && other.count() == 1) // both frames still execute post-restore
  }

  test("events view carries the µs-truncated timestamps of the loader") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/events.parquet")))
    Tables.registerTempViews(spark, dir)
    val sqlTs = spark.sql("SELECT min(ts) FROM events").head().getTimestamp(0)
    val dfTs = {
      import org.apache.spark.sql.functions._
      Tables.events(spark, dir).agg(min(col("ts"))).head().getTimestamp(0)
    }
    assert(sqlTs == dfTs)
  }
}
