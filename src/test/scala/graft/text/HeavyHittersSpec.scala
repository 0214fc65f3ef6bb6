package graft.text

import graft.SparkTestBase

/** Pins q131's count-min-sketch contracts: est ≥ exact for every
  * reported token (counts only add — the CMS one-sided-error
  * guarantee), the sketch stays d×w rows regardless of corpus size,
  * and a planted skewed corpus ranks its heavy hitter first. */
class HeavyHittersSpec extends SparkTestBase {

  private def docsOf(texts: Seq[String]) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      texts.zipWithIndex.map { case (t, i) =>
        org.apache.spark.sql.Row(i.toLong, t, "en", "web", t.length.toLong)
      }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType))))
  }

  private def runOn(texts: Seq[String]) = {
    val dir = java.nio.file.Files.createTempDirectory("hh").toString
    docsOf(texts).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    HeavyHitters.q131(spark, dir).collect()
  }

  test("one-sided error: est_n >= exact_n for every reported token") {
    val out = runOn(Seq.tabulate(50)(i => s"alpha beta gamma tok$i tok$i"))
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Long]("err_n") >= 0L),
      "a CMS estimate fell below the exact count — impossible for a correct sketch")
    assert(out.forall(r => r.getAs[Long]("est_n") ==
      r.getAs[Long]("exact_n") + r.getAs[Long]("err_n")))
  }

  test("planted heavy hitter ranks first with its exact count") {
    val out = runOn(
      Seq.fill(30)("hot hot hot hot") ++ Seq.tabulate(20)(i => s"cold$i rare$i"))
    val first = out.head
    assert(first.getAs[String]("tok") == "hot")
    assert(first.getAs[Long]("exact_n") == 120L)
    assert(first.getAs[Long]("est_n") >= 120L)
  }

  test("top-20 cut is by exact count then token, deterministically") {
    val out = runOn(Seq.tabulate(60)(i => (s"w$i " * (i + 1)).trim))
    assert(out.length == 20)
    val ranks = out.map(r => (-r.getAs[Long]("exact_n"), r.getAs[String]("tok"))).toSeq
    assert(ranks == ranks.sorted)
    assert(out.head.getAs[Long]("exact_n") == 60L) // w59 appears 60 times
  }

  test("driver fixture: estimates bounded and sketch cells fixed-size") {
    assume(java.nio.file.Files.exists(
      java.nio.file.Paths.get("/root/testdata/sf0.001/documents.parquet")))
    val out = HeavyHitters.q131(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 20)
    assert(out.forall(r => r.getAs[Long]("err_n") >= 0L))
  }
}
