package graft.ingest

import graft.SparkTestBase

/** q192 recrawl schedule: planted verdict counts pin every interval
  * class, the exact ppm threshold EDGES (≥, not >), the zero-corpus
  * guard, and the fetch-budget arithmetic the oracle hash can't name
  * branch by branch. */
class RecrawlSpec extends SparkTestBase {

  private def counts(rows: Seq[(String, Long, Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("source", "n_added", "n_removed", "n_changed", "n_unchanged")
  }

  test("q192: every interval class, at its exact threshold edge") {
    val rows = Seq(
      ("hot",    5L, 3L, 2L, 10L),   // churn 10/20 = 500000 ppm -> hourly (edge)
      ("warm",   1L, 0L, 0L,  9L),   // 1/10 = 100000 ppm -> daily (edge)
      ("cool",   1L, 0L, 0L, 99L),   // 1/100 = 10000 ppm -> weekly (edge)
      ("cold",   0L, 0L, 0L, 100L),  // 0 ppm -> monthly
      ("nearhot", 4L, 3L, 2L, 11L),  // 9/20 = 450000 -> daily (below the edge)
      ("empty",  0L, 0L, 0L, 0L))    // zero corpus -> churn 0, monthly, 0 fetches
    val out = IngestQueries.recrawlScheduleOf(counts(rows)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(out("hot") == ((17L, 500000L, "hourly", 1L, 408000L)), out("hot"))
    assert(out("warm") == ((10L, 100000L, "daily", 24L, 10000L)), out("warm"))
    assert(out("cool") == ((100L, 10000L, "weekly", 168L, 14285L)), out("cool"))
    assert(out("cold") == ((100L, 0L, "monthly", 720L, 3333L)), out("cold"))
    assert(out("nearhot")._3 == "daily", out("nearhot"))
    assert(out("empty") == ((0L, 0L, "monthly", 720L, 0L)), out("empty"))
  }

  test("q192 on the fixture agrees with q162's counts recomputed by hand") {
    val dir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet")))
    val diff = graft.SparkEntry.queries("q162_snapshot_diff")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val sched = graft.SparkEntry.queries("q192_recrawl_schedule")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sched.keySet == diff.keySet)
    sched.foreach { case (src, (nCur, churn)) =>
      val (a, rm, ch, un) = diff(src)
      assert(nCur == a + ch + un, s"$src n_cur")
      val tot = a + rm + ch + un
      assert(churn == (if (tot == 0) 0L else (a + rm + ch) * 1000000L / tot), s"$src churn")
    }
  }
}
