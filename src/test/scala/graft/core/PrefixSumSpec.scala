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

  test("full-Long id span with degenerate shard counts (the DIV-overflow regression)") {
    // range ≈ 2^64 with targetShards ≤ 2 overflowed the old
    // IntegralDivide width to NULL, collapsing ps_w to 1 and silently
    // dropping rows at the shard-offset join
    val ids = Seq(Long.MinValue, Long.MaxValue, -1L, 0L, 1L, 42L)
    val rows = ids.zipWithIndex.map { case (id, i) => ((i % 2).toLong, id, (i + 1).toLong) }
    check(rows, targetShards = 1)
    check(rows, targetShards = 2)
    // keyedRank with an IDENTITY proxy (full-Long span reaches the
    // width computation undivided, unlike checkRank's DIV-7 proxy)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = rows.toDF("k", "ord", "id")
    for (ts <- Seq(1, 2)) {
      val got = PrefixSum.keyedRank(df, "k", col("ord"), Seq(col("ord"), col("id")), "rn", ts)
        .collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[Long]("id")) -> r.getAs[Long]("rn")).toMap
      val exp = rankReference(rows)
      assert(got.size == rows.size, s"rows dropped at shards=$ts: ${got.size}/${rows.size}")
      got.foreach { case (kid, rn) =>
        assert(rn == exp(kid), s"$kid: got $rn, expected ${exp(kid)} (shards=$ts)")
      }
    }
  }

  test("single row and empty frame") {
    check(Seq((7L, 1L, 42L)), targetShards = 8)
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Long)].toDF("k", "id", "v")
    assert(PrefixSum.runningTotal(empty, "k", "id", "v", "cum").count() == 0L)
  }

  // ------------------------------------------------------------ keyedRank

  private def rankReference(rows: Seq[(Long, Long, Long)]): Map[(Long, Long), Long] =
    rows.groupBy(_._1).flatMap { case (k, rs) =>
      rs.sortBy(r => (r._2, r._3)).zipWithIndex
        .map { case ((_, _, id), i) => (k, id) -> (i + 1L) }
    }

  private def checkRank(rows: Seq[(Long, Long, Long)], targetShards: Int): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val df = rows.toDF("k", "ord", "id")
    // deliberately COARSE proxy (ord DIV 7) so proxy collisions across
    // distinct ord values exercise the ties-settle-in-shard contract
    val got = PrefixSum.keyedRank(df, "k", expr("ord DIV 7"),
        Seq(col("ord"), col("id")), "rn", targetShards)
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("id")) -> r.getAs[Long]("rn")).toMap
    val exp = rankReference(rows)
    assert(got.size == rows.size, s"row count ${got.size} != ${rows.size}")
    got.foreach { case (kid, rn) =>
      assert(rn == exp(kid), s"$kid: got $rn, expected ${exp(kid)} (shards=$targetShards)")
    }
  }

  test("keyedRank: modal key with heavy order-value ties equals the plain per-key sort") {
    val rows = (0 until 4000).map(i => (0L, (i % 97).toLong, i.toLong))
    check3Keys(rows)
  }

  private def check3Keys(rows: Seq[(Long, Long, Long)]): Unit = {
    checkRank(rows, targetShards = 64)
    checkRank(rows, targetShards = 1)    // one shard: pure partition-by-key
    checkRank(rows, targetShards = 4096) // more shards than rows
  }

  test("keyedRank: mixed keys, negative order values spanning a wide range") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 3000).map(i =>
      ((rnd.nextInt(3)).toLong, rnd.nextLong() % 1000000007L, i.toLong))
    check3Keys(rows)
  }

  test("keyedRank: order proxies spanning the full Long range") {
    val rnd = new scala.util.Random(29)
    val ords = Seq(Long.MinValue, Long.MaxValue, -1L, 0L, 1L) ++
      (0 until 500).map(_ => rnd.nextLong())
    val rows = ords.zipWithIndex.map { case (o, i) => ((i % 2).toLong, o, i.toLong) }
    checkRank(rows, targetShards = 32)
  }

  test("keyedRank plan: no window partitions the full frame by the key alone") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (0 until 1000).map(i => (0L, (i % 5).toLong, i.toLong)).toDF("k", "ord", "id")
    val plan = PrefixSum.keyedRank(df, "k", col("ord"), Seq(col("ord"), col("id")), "rn", 32)
      .queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window [")).toList
    assert(windows.size >= 2, s"expected within-shard + shard-offset windows:\n$plan")
    // the full frame's window must carry the shard in its partition spec;
    // a [k#N] partition alone is the modal-key serialization this exists to kill
    assert(!windows.exists(_.matches(".*\\], \\[k#[0-9]+L?\\], \\[.*")),
      s"window partitioned by key alone:\n${windows.mkString("\n")}")
    assert(windows.exists(_.matches(".*\\], \\[k#[0-9]+L?, ps_shard#[0-9]+L?\\], \\[.*")),
      s"within-shard window must be partitioned by (k, ps_shard):\n${windows.mkString("\n")}")
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
