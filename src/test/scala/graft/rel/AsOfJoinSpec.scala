package graft.rel

import java.sql.Timestamp
import graft.SparkTestBase

/** Corner cases of the as-of operator the synthetic events table never
  * hits: no-prior-match nulls, inclusive equal-ts, tie-break among
  * same-ts right rows, key isolation. */
class AsOfJoinSpec extends SparkTestBase {

  private def t(s: Int) = new Timestamp(1700000000000L + s * 1000L)

  test("matches the latest right row at or before each probe, per key") {
    import spark.implicits._
    val right = Seq((1L, t(10), 100L), (1L, t(20), 101L), (2L, t(15), 200L))
      .toDF("k", "ts", "rid")
    val left = Seq((1L, t(5), "a"), (1L, t(20), "b"), (1L, t(25), "c"), (2L, t(14), "d"))
      .toDF("k", "ts", "tag")
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", Seq("rid"))
      .collect().map(r => (r.getString(2), Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(got("a").isEmpty)        // no right row at or before t(5)
    assert(got("b").contains(101L)) // equal ts is inclusive (>= semantics)
    assert(got("c").contains(101L))
    assert(got("d").isEmpty)        // key 2's right row is later; key 1 rows invisible
  }

  test("tieBreak picks the last same-ts right row; values stay from one row") {
    import spark.implicits._
    val right = Seq((1L, t(10), 5L, "five"), (1L, t(10), 9L, "nine"), (1L, t(10), 7L, "seven"))
      .toDF("k", "ts", "rid", "name")
    val left = Seq((1L, t(11), "probe")).toDF("k", "ts", "tag")
    val row = AsOfJoin.backward(left, right, Seq("k"), "ts",
      valueCols = Seq("rid", "name"), tieBreak = Seq("rid")).head()
    assert(row.getAs[Long]("asof_rid") == 9L)
    assert(row.getAs[String]("asof_name") == "nine") // same winning row, not a column mix
  }

  test("matches a naive per-probe scan on a dense random-ish fixture") {
    import spark.implicits._
    // deterministic pseudo-random layout: probes and builds interleaved
    val rights = for (k <- 1 to 4; i <- 0 until 25)
      yield (k.toLong, t(i * 11 + (k * 3) % 7), k * 1000L + i)
    val lefts = for (k <- 1 to 4; i <- 0 until 25)
      yield (k.toLong, t(i * 13 + (k * 5) % 11), s"p$k-$i")
    val naive = lefts.map { case (k, ts, tag) =>
      val cands = rights.filter(r => r._1 == k && !r._2.after(ts))
      tag -> (if (cands.isEmpty) None
              else Some(cands.maxBy(r => (r._2.getTime, r._3))._3))
    }.toMap
    val got = AsOfJoin.backward(
        lefts.toDF("k", "ts", "tag"), rights.toDF("k", "ts", "rid"),
        Seq("k"), "ts", Seq("rid"), tieBreak = Seq("rid"))
      .collect().map(r => (r.getString(2), Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(got == naive)
  }

  test("matched timestamp is carried as asof_<ts>") {
    import spark.implicits._
    val right = Seq((1L, t(10), 100L)).toDF("k", "ts", "rid")
    val left = Seq((1L, t(30), "x")).toDF("k", "ts", "tag")
    val row = AsOfJoin.backward(left, right, Seq("k"), "ts", Seq("rid")).head()
    assert(row.getAs[Timestamp]("asof_ts") == t(10))
  }

  // MODAL-key fixture: 2 keys over 600 probes / 300 builds, sparse
  // build stretches so carries must cross several empty time shards;
  // equal-ts and tie-break cases planted; targetShards = 8 forces
  // multi-shard layout even at fixture size
  private def modalFixture = {
    import spark.implicits._
    val rights = for (k <- 0 to 1; i <- 0 until 150 if i % 5 == 0 || i < 3)
      yield (k.toLong, t(i * 7 + k), k * 1000L + i)
    val dupTs = Seq((0L, t(14), 9000L), (0L, t(14), 9001L)) // tie at one ts
    val lefts = for (k <- 0 to 1; i <- 0 until 300)
      yield (k.toLong, t(i * 4 + k), s"p$k-$i")
    ((rights ++ dupTs).toDF("k", "ts", "rid"), lefts.toDF("k", "ts", "tag"))
  }

  test("backwardSharded equals backward on the modal-key fixture (carries cross shards)") {
    val (right, left) = modalFixture
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.mkString("|")).sorted.toSeq
    val plain = AsOfJoin.backward(left, right, Seq("k"), "ts", Seq("rid"), tieBreak = Seq("rid"))
    val shard = AsOfJoin.backwardSharded(left, right, Seq("k"), "ts", Seq("rid"),
      tieBreak = Seq("rid"), targetShards = 8)
    assert(shard.columns.toSeq == plain.columns.toSeq)
    assert(canon(shard) == canon(plain))
    graft.core.ScratchCache.drain()
  }

  test("backwardSharded plan: no window partitions the full union by the modal key alone") {
    val (right, left) = modalFixture
    val plan = AsOfJoin.backwardSharded(left, right, Seq("k"), "ts", Seq("rid"),
        tieBreak = Seq("rid"), targetShards = 8)
      .queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window [")).toList
    assert(windows.size >= 2, s"expected within-shard + carry windows:\n$plan")
    // a [k#N] partition spec alone is the modal-key serialization this
    // shape exists to kill; the carry window partitions by __ak_k over
    // the bounded (key, shard) frame
    assert(!windows.exists(_.matches(".*\\], \\[k#[0-9]+L?\\], \\[.*")),
      s"window partitioned by the key alone:\n${windows.mkString("\n")}")
    assert(windows.exists(w => w.contains("k#") && w.contains("__shard#")),
      s"within-shard window must partition by (k, __shard):\n${windows.mkString("\n")}")
    graft.core.ScratchCache.drain()
  }

  test("backwardAuto dispatches: sharded for the modal fixture, plain for per-entity keys") {
    import spark.implicits._
    val (right, left) = modalFixture
    val modalPlan = AsOfJoin.backwardAuto(left, right, Seq("k"), "ts", Seq("rid"),
        tieBreak = Seq("rid"), maxAvgRowsPerKey = 100)
      .queryExecution.executedPlan.toString
    assert(modalPlan.contains("__shard"), "modal keys must take the sharded shape")
    graft.core.ScratchCache.drain()
    // high-cardinality: one row per key on each side
    val r2 = (0 until 200).map(i => (i.toLong, t(i), i.toLong)).toDF("k", "ts", "rid")
    val l2 = (0 until 200).map(i => (i.toLong, t(i + 1), s"p$i")).toDF("k", "ts", "tag")
    val entityPlan = AsOfJoin.backwardAuto(l2, r2, Seq("k"), "ts", Seq("rid"),
        maxAvgRowsPerKey = 100)
      .queryExecution.executedPlan.toString
    assert(!entityPlan.contains("__shard"), "per-entity keys must take the plain window")
  }

  test("backwardAuto on the catalog shapes: q127's constant key shards, q39's per-user key doesn't") {
    import spark.implicits._
    // q127's shape: ONE constant key over the whole union, with the
    // catalog's maxAvgRowsPerKey = 256 budget — ≥400 union rows/key at
    // every SF, so the probe must dispatch to backwardSharded
    val errs = (0 until 210).map(i => (0L, t(i * 3), i.toLong)).toDF("stream", "ts", "error_id")
    val purch = (0 until 210).map(i => (0L, t(i * 2 + 1), s"o$i")).toDF("stream", "ts", "purchase_id")
    val constPlan = AsOfJoin.backwardAuto(purch, errs, Seq("stream"), "ts",
        Seq("error_id"), maxAvgRowsPerKey = 256, targetShards = 64)
      .queryExecution.executedPlan.toString
    assert(constPlan.contains("__shard"), "q127's constant key must take the sharded shape")
    graft.core.ScratchCache.drain()
    // q39's shape: per-user keys, default 65536 rows/key budget — the
    // probe must keep the plain one-exchange window
    val clicks = (0 until 500).map(i => ((i % 100).toLong, t(i), i.toLong)).toDF("user_id", "ts", "click_id")
    val buys = (0 until 500).map(i => ((i % 100).toLong, t(i + 1), s"p$i")).toDF("user_id", "ts", "purchase_id")
    val userPlan = AsOfJoin.backwardAuto(buys, clicks, Seq("user_id"), "ts", Seq("click_id"))
      .queryExecution.executedPlan.toString
    assert(!userPlan.contains("__shard"), "q39's per-user key must take the plain window")
  }
}
