package graft.text

import graft.SparkTestBase

/** q101's token-budget selection: the two-phase (per-score-bucket +
  * bucket-offset) prefix sum must equal the naive global running sum,
  * the keep set must be the maximal quality-first prefix within
  * budget, and the doc-sized frame must never pass through a global
  * single-partition window (the property that makes the prefix sum
  * distributable at 100 TB). */
class TokenBudgetSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet"))

  private def rows = TextQueries.queries("q101_token_budget")(spark, dir)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("two-phase cumulative sum equals the global-order running sum") {
    assume(ready)
    val got = rows
    // reference: one global pass in quality order on the driver
    var cum = 0L
    val expected = got.sortBy { case (id, score, _, _, _) => (-score, id) }
      .map { case (id, _, n, _, _) => cum += n; id -> cum }.toMap
    got.foreach { case (id, _, _, cumGot, _) =>
      assert(cumGot == expected(id), s"doc $id: two-phase $cumGot != global ${expected(id)}")
    }
  }

  test("keep set is the maximal quality-first prefix within the budget") {
    assume(ready)
    val got = rows
    val budget = got.map(_._3).sum / 2
    val ordered = got.sortBy { case (id, score, _, _, _) => (-score, id) }
    // kept docs form a PREFIX of the quality order: once one doc is
    // dropped, every later doc is dropped too
    val keeps = ordered.map(_._5)
    assert(!keeps.dropWhile(_ == 1L).contains(1L), "keep set is not a prefix")
    val keptTokens = got.filter(_._5 == 1L).map(_._3).sum
    assert(keptTokens <= budget, s"kept $keptTokens exceeds budget $budget")
    // maximality: the first dropped doc would not have fit
    ordered.find(_._5 == 0L).foreach { case (id, _, _, cum, _) =>
      assert(cum > budget, s"doc $id was dropped but fit the budget ($cum <= $budget)")
    }
  }

  test("no global window over the document-sized frame") {
    assume(ready)
    val plan = TextQueries.queries("q101_token_budget")(spark, dir)
      .queryExecution.executedPlan.toString
    // Window nodes print [exprs], [partitionSpec], [orderSpec]; an
    // UNPARTITIONED window prints only [exprs], [orderSpec]. The
    // within-shard prefix must be partitioned by (score, ps_shard);
    // the only unpartitioned window allowed is over the per-score
    // totals frame (distinct-key cardinality).
    val windows = plan.linesIterator.filter(_.contains("Window [")).toList
    assert(windows.nonEmpty, plan)
    val unpartitioned = windows.filterNot(_.matches(".*\\], \\[.*\\], \\[.*"))
    assert(unpartitioned.size <= 1, s"more than one unpartitioned window:\n${windows.mkString("\n")}")
    assert(windows.exists(_.matches(".*\\], \\[score#[0-9]+L?, ps_shard#[0-9]+L?\\], \\[.*")),
      s"within-shard window must be partitioned by (score, ps_shard):\n${windows.mkString("\n")}")
  }
}
