package graft.core

import graft.SparkTestBase

/** PrefixSum.runningTotal: the three-level decomposition must equal a
  * driver-side global running sum on every frame shape that breaks a
  * lesser scheme — the modal-key frame that defeats partition-by-key,
  * sparse ids, negative keys, and degenerate shard counts — and the
  * plan must keep document-sized frames out of unpartitioned windows. */
class PrefixSumSpec extends SparkTestBase {

  private def reference(rows: Seq[(Long, Long, Long)]): Map[Long, Long] = {
    var cum = 0L
    rows.sortBy { case (k, id, _) => (-k, id) }
      .map { case (_, id, v) => cum += v; id -> cum }.toMap
  }

  private def check(rows: Seq[(Long, Long, Long)], targetShards: Int): Unit = {
    import spark.implicits._
    val df = rows.toDF("k", "id", "v")
    val got = PrefixSum.runningTotal(df, "k", "id", "v", "cum", targetShards)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cum")).toMap
    val exp = reference(rows)
    assert(got.size == rows.size, s"row count ${got.size} != ${rows.size}")
    got.foreach { case (id, cum) =>
      assert(cum == exp(id), s"id $id: got $cum, expected ${exp(id)} (shards=$targetShards)")
    }
  }

  test("single modal key with sparse ids — the skew case partition-by-key serializes") {
    val rows = (0 until 5000).map(i => (0L, i.toLong * 1000003L + 17L, (i % 7 + 1).toLong))
    check(rows, targetShards = 64)
  }

  test("mixed keys (incl. negative), random values") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 3000).map(i => ((rnd.nextInt(11) - 5).toLong, i.toLong, rnd.nextInt(100).toLong))
    check(rows, targetShards = 16)
  }

  test("degenerate shard counts still telescope correctly") {
    val rows = (0 until 500).map(i => ((i % 3).toLong, i.toLong, 1L))
    check(rows, targetShards = 1)    // one shard: pure partition-by-key
    check(rows, targetShards = 4096) // more shards than rows
  }

  test("ids spanning the full Long range — the 64-bit-hash-id regime where raw max-min wraps") {
    val rnd = new scala.util.Random(7)
    val ids = (Seq(Long.MinValue, Long.MaxValue, -1L, 0L, 1L) ++
      (0 until 500).map(_ => rnd.nextLong())).distinct
    val rows = ids.zipWithIndex.map { case (id, i) => ((i % 4).toLong, id, (i % 9 + 1).toLong) }
    check(rows, targetShards = 32)
  }

  test("single row and empty frame") {
    check(Seq((7L, 1L, 42L)), targetShards = 8)
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Long)].toDF("k", "id", "v")
    assert(PrefixSum.runningTotal(empty, "k", "id", "v", "cum").count() == 0L)
  }

  test("plan: within-shard window is partitioned, only the key-totals window is not") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (0L, i.toLong, 1L)).toDF("k", "id", "v")
    val plan = PrefixSum.runningTotal(df, "k", "id", "v", "cum", 32)
      .queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window [")).toList
    assert(windows.size >= 3, s"expected 3 window levels:\n$plan")
    val unpartitioned = windows.filterNot(_.matches(".*\\], \\[.*\\], \\[.*"))
    assert(unpartitioned.size == 1,
      s"exactly one unpartitioned (key-totals) window allowed:\n${windows.mkString("\n")}")
    assert(windows.exists(_.matches(".*\\], \\[k#[0-9]+L?, ps_shard#[0-9]+L?\\], \\[.*")),
      s"within-shard window must be partitioned by (k, ps_shard):\n${windows.mkString("\n")}")
  }
}
