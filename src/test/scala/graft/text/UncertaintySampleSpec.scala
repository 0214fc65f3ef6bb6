package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q188 uncertainty queue: planted margins pin the selection contract
  * (smallest |score|/1k-tokens first, ties by doc_id, exactly k per
  * source) and the plan must group-limit map-side — the window may
  * never sort a whole source partition. */
class UncertaintySampleSpec extends SparkTestBase {

  private def df(rows: Seq[(String, Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("source", "doc_id", "n_toks", "score")
  }

  test("q188: picks the k nearest-to-boundary docs, length-normalized, ties by doc_id") {
    val rows = Seq(
      // src1: margins (|score|*1000/n_toks): 0, 10, 10, 500, 1000, 5000
      ("s1", 1L, 100L, 0L),      // margin 0 -> rank 1
      ("s1", 3L, 100L, 1L),      // margin 10 -> rank 2 (tie, lower id)
      ("s1", 4L, 100L, -1L),     // margin 10 -> rank 3 (|score| symmetric)
      ("s1", 2L, 10L, 5L),       // margin 500 -> rank 4
      ("s1", 5L, 100L, 100L),    // margin 1000 -> rank 5
      ("s1", 6L, 100L, -500L),   // margin 5000 -> CUT (k=5)
      // s2: a long doc with a big raw score is still LOW margin
      ("s2", 7L, 100000L, 900L), // margin 9
      ("s2", 8L, 10L, 900L))     // margin 90000
    val out = TextQueries.uncertaintyQueueOf(df(rows)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("s1", 1L, 1L), ("s1", 2L, 3L), ("s1", 3L, 4L), ("s1", 4L, 2L), ("s1", 5L, 5L),
      ("s2", 1L, 7L), ("s2", 2L, 8L)), out.toSeq)
  }

  test("q188 catalog plan: the per-source top-k group-limits map-side (WindowGroupLimit)") {
    val dir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet")))
    val p = graft.SparkEntry.queries("q188_uncertainty_sample")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
  }
}
