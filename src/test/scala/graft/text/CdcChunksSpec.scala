package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q91's content-defined chunking: boundaries resynchronize after an
  * edit (the property fixed-stride chunking lacks), and the chunk
  * accounting is consistent. */
class CdcChunksSpec extends SparkTestBase {

  private def run(d: String) =
    TextQueries.queries("q91_cdc_chunks")(spark, d)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("a prefix edit leaves every post-resync chunk hash shared") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    try {
      val body = (0 until 200).map(i => s"w$i").mkString(" ")
      Seq((1L, body), (2L, s"x1 x2 x3 $body"))
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("t"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      val rows = run(d)
      // all of doc 1's chunks carry canonical 1; shared = n_docs == 2
      val doc1Chunks = rows.count(_._4 == 1L)
      val shared = rows.count(_._3 == 2L)
      assert(doc1Chunks > 2, s"200-token doc must split into several chunks, got $doc1Chunks")
      // content-defined boundaries resync at the first gate after the
      // edit: only the chunk(s) touching the edited prefix may differ
      assert(shared >= doc1Chunks - 2,
        s"after a 3-token prefix insert, ≥ ${doc1Chunks - 2} of $doc1Chunks chunks must still match, got $shared")
      assert(rows.forall { case (_, occ, docs, _) => occ >= docs && docs >= 1 },
        "occurrences must dominate distinct docs")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
  }

  test("identical docs share every chunk; chunk accounting sums to the corpus") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-cdc2").toString
    try {
      val body = (0 until 120).map(i => s"t$i").mkString(" ")
      Seq((1L, body), (2L, body), (3L, (0 until 50).map(i => s"z$i").mkString(" ")))
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("t"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      val rows = run(d)
      val dupChunks = rows.filter(_._3 == 2L)
      assert(dupChunks.nonEmpty && dupChunks.forall(_._4 == 1L),
        "identical docs' chunks must all pair with canonical doc 1")
      assert(rows.filter(_._4 == 3L).forall(_._3 == 1L), "doc 3 shares nothing")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
  }
}
