package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q125's split assignment: exact coverage/disjointness, empirical
  * shares near 98/1/1, and the STABILITY property that justifies a
  * hash split over a rank split — removing or adding other documents
  * never moves a surviving doc across splits. */
class SplitAssignSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.01"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet"))

  private def run(dirOrDf: String) =
    graft.SparkEntry.queries("q125_split_assign")(spark, dirOrDf)

  test("every doc is assigned exactly once; shares are within 3 sigma of 98/1/1") {
    assume(ready)
    val rows = run(dir).collect()
    val total = graft.core.Tables.documents(spark, dir).count()
    assert(rows.length == total, s"coverage: ${rows.length} assignments for $total docs")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length, "a doc was assigned twice")
    val byStream = rows.groupBy(_.getString(2)).view.mapValues(_.length.toLong).toMap
    assert(byStream.keySet == Set("train", "val", "test"), s"splits: ${byStream.keySet}")
    // binomial 3-sigma bands at n = total
    def within(p: Double, n: Long): Unit = {
      val sigma = math.sqrt(total * p * (1 - p))
      assert(math.abs(n - total * p) <= 3 * sigma + 1,
        s"share ${n.toDouble / total} vs expected $p (n=$n, 3 sigma=${3 * sigma})")
    }
    within(64225.0 / 65536, byStream("train"))
    within(655.0 / 65536, byStream("val"))
    within(656.0 / 65536, byStream("test"))
  }

  test("stability: dropping half the corpus never reassigns a surviving doc") {
    assume(ready)
    import spark.implicits._
    val full = run(dir).select($"doc_id", $"split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // simulate corpus evolution: re-run the same assignment logic on an
    // arbitrary half of the docs (even ids) — a rank/ntile split would
    // reshuffle everything; the id-hash split must agree exactly
    val stage = java.nio.file.Files.createTempDirectory("graft-split").toString
    graft.core.Tables.documents(spark, dir).filter($"doc_id" % 2 === 0)
      .write.parquet(s"$stage/documents.parquet")
    try {
      val half = run(stage).select($"doc_id", $"split")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(half.nonEmpty && half.size < full.size)
      half.foreach { case (id, sp) =>
        assert(full(id) == sp, s"doc $id moved ${full(id)} -> $sp when the corpus shrank")
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
  }
}
