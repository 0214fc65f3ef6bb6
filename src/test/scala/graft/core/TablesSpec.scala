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
