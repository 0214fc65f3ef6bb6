package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Round-trip and pruning behavior of the source/sink surface. */
class SourcesSpec extends SparkTestBase {

  private def sample = {
    import spark.implicits._
    Seq((1L, "alpha", 2.5, "2024-01-15"),
        (2L, "beta", 4.0, "2024-02-20"),
        (3L, "gamma", 1.25, "2025-01-05"))
      .toDF("id", "name", "score", "day")
      .withColumn("day", to_date($"day"))
  }

  // file readers mark all columns nullable — compare modulo nullability
  private def loose(s: org.apache.spark.sql.types.StructType) =
    org.apache.spark.sql.types.StructType(s.fields.map(_.copy(nullable = true)))

  test("parquet round-trip preserves schema and rows") {
    val dir = Files.createTempDirectory("pq").toString + "/t"
    Sources.writeParquet(sample, dir)
    val back = Sources.readParquet(spark, dir)
    assert(loose(back.schema) == loose(sample.schema))
    assert(back.orderBy("id").collect().toSeq == sample.orderBy("id").collect().toSeq)
  }

  test("partitioned parquet write enables partition pruning") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pqpart").toString + "/t"
    Sources.writeParquet(sample.withColumn("yr", year($"day")), dir, partitionBy = Seq("yr"))
    val pruned = Sources.readParquet(spark, dir).filter($"yr" === 2024)
    // the partition filter must reach the scan, not a post-scan Filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("yr"), plan)
    assert(pruned.count() == 2)
  }

  test("csv round-trip with explicit schema (no inference pass)") {
    val dir = Files.createTempDirectory("csv").toString + "/t"
    Sources.writeCsv(sample, dir)
    val back = Sources.readCsv(spark, dir, sample.schema)
    assert(loose(back.schema) == loose(sample.schema))
    assert(back.orderBy("id").collect().toSeq == sample.orderBy("id").collect().toSeq)
  }

  test("jsonl round-trip with explicit schema") {
    val dir = Files.createTempDirectory("jsonl").toString + "/t"
    Sources.writeJsonl(sample, dir)
    val back = Sources.readJsonl(spark, dir, sample.schema)
    assert(back.orderBy("id").collect().toSeq == sample.orderBy("id").collect().toSeq)
  }

  test("bucketed tables join with NO exchange (co-located join, the 100 TB layout)") {
    import spark.implicits._
    val facts = (1 to 1000).map(i => (i.toLong % 100, s"f$i")).toDF("k", "payload")
    val dims = (1 to 500).map(i => (i.toLong % 100, i * 1.0)).toDF("k", "score")
    Sources.writeBucketed(facts, "facts_b", "k", 8)
    Sources.writeBucketed(dims, "dims_b", "k", 8)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the merge path
      val j = spark.table("facts_b").join(spark.table("dims_b"), "k")
      val plan = j.queryExecution.executedPlan.toString
      // same key, same bucket count → both sides are already hash-
      // clustered: the join must not re-shuffle either side
      assert(!plan.contains("Exchange"), plan)
      assert(j.count() == 100 * 10 * 5) // 100 keys × 10 fact rows × 5 dim rows
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS facts_b")
      spark.sql("DROP TABLE IF EXISTS dims_b")
    }
  }

  test("orc round-trip preserves schema and rows; filters push to the ORC scan") {
    val dir = Files.createTempDirectory("orc").toString + "/t"
    import spark.implicits._
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5)).toDF("id", "tag", "x")
    Sources.writeOrc(df, dir)
    val back = Sources.readOrc(spark, dir)
    // ORC reads everything nullable; names+types are the contract
    assert(back.schema.map(f => (f.name, f.dataType)) == df.schema.map(f => (f.name, f.dataType)))
    assert(back.count() == 3)
    val filtered = back.filter($"tag" === "a").select($"id")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("EqualTo(tag,a)"), plan)
    assert(filtered.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("textLines: line-oriented source feeds the MapReduce facade contract") {
    val dir = Files.createTempDirectory("txt").toString + "/t"
    import spark.implicits._
    Seq("one line", "two line").toDF("value").write.mode(SaveMode.Overwrite).text(dir)
    val lines = Sources.textLines(spark, dir).collect().sorted.toSeq
    assert(lines == Seq("one line", "two line"))
  }
}
