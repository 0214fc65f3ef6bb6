package graft.ingest

import graft.SparkTestBase

/** q199 crawl ROI: planted schedule/yield frames pin the full-outer
  * miss paths (a source only one side knows about), the exact
  * tokens-per-fetch arithmetic, the zero-fetch guard, and the class
  * threshold EDGES (≥, not >) — the branches the oracle hash can't
  * name individually. The fixture test pins non-vacuity: all three
  * live classes appear at sf0.001, so the thresholds actually split
  * the synthetic crawl rather than lumping it into one verdict. */
class CrawlRoiSpec extends SparkTestBase {

  private def sched(rows: Seq[(String, String, Long)]) = {
    import spark.implicits._
    rows.toDF("source", "interval_class", "daily_fetches_x1000")
  }
  private def adm(rows: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("source", "n_admitted_docs", "admitted_toks")
  }

  test("q199: exact arithmetic, threshold edges, zero-fetch guard, miss paths") {
    val schedRows = Seq(
      ("edge_rich",   "daily",   1000000L), // 10000*1000000/1000000 = 10000 = rich edge
      ("edge_viable", "daily",   1000000L), // 4000 exactly = viable edge
      ("below",       "daily",   1000000L), // 3999 -> starve
      ("zero_fetch",  "monthly",       0L), // guard: 0 fetches -> no_refresh, tok 0
      ("sched_only",  "weekly",     2000L)) // no admitted row -> 0 toks, starve
    val admRows = Seq(
      ("edge_rich",   7L, 10000L),
      ("edge_viable", 5L,  4000L),
      ("below",       5L,  3999L),
      ("zero_fetch",  2L,   123L),
      ("adm_only",    3L,   777L))          // no schedule row -> none/no_refresh
    val out = IngestQueries.crawlRoiOf(sched(schedRows), adm(admRows)).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))).toMap

    assert(out("edge_rich") == (("daily", 1000000L, 7L, 10000L, 10000L, "rich")), out("edge_rich"))
    assert(out("edge_viable") == (("daily", 1000000L, 5L, 4000L, 4000L, "viable")), out("edge_viable"))
    assert(out("below") == (("daily", 1000000L, 5L, 3999L, 3999L, "starve")), out("below"))
    // zero daily fetches: division guarded, class is no_refresh even with yield
    assert(out("zero_fetch") == (("monthly", 0L, 2L, 123L, 0L, "no_refresh")), out("zero_fetch"))
    // full-outer miss paths: yield-side zeros vs schedule-side defaults
    assert(out("sched_only") == (("weekly", 2000L, 0L, 0L, 0L, "starve")), out("sched_only"))
    assert(out("adm_only") == (("none", 0L, 3L, 777L, 0L, "no_refresh")), out("adm_only"))
  }

  test("q199: DECIMAL(38,0) product survives an int64-overflowing token mass") {
    // admitted_toks * 1e6 overflows BIGINT (9.3e18 < 2e13 * 1e6); the
    // quotient stays small — exactly the 100 TB envelope the Scaladoc claims.
    val out = IngestQueries.crawlRoiOf(
      sched(Seq(("big", "hourly", 2000000000000L))),
      adm(Seq(("big", 1000000L, 20000000000000L)))).collect()
    assert(out.length == 1)
    // 2e13 * 1e6 / 2e12 = 1e7 exactly
    assert(out(0).getLong(5) == 10000000L, out(0))
    assert(out(0).getString(6) == "rich")
  }

  test("q199 on the fixture: classes are non-vacuous and consistent with q192/q194") {
    val dir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet")))
    val roi = graft.SparkEntry.queries("q199_crawl_roi")(spark, dir).collect()
    assert(roi.nonEmpty)
    val classes = roi.map(_.getString(6)).toSet
    assert(Set("rich", "viable", "starve").subsetOf(classes), classes)
    // cross-check one leg: every source's daily fetch cost matches q192's
    val schedMap = graft.SparkEntry.queries("q192_recrawl_schedule")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(5)).toMap
    roi.foreach { r =>
      assert(r.getLong(2) == schedMap.getOrElse(r.getString(0), 0L), r.getString(0))
    }
  }
}
