package graft.rel

import java.sql.Timestamp
import graft.SparkTestBase

/** Bucket-boundary correctness of the range join: pairs straddling a
  * bucket edge, exact-δ inclusivity, strict ordering, key isolation,
  * and equivalence with the naive quadratic join on a dense fixture. */
class RangeJoinSpec extends SparkTestBase {

  private def t(s: Long) = new Timestamp(1700000000000L + s * 1000L)

  private def pairs(rows: Seq[(Long, Timestamp, Long)], delta: Long) = {
    import spark.implicits._
    RangeJoin.pairsWithin(rows.toDF("k", "ts", "id"), "k", "ts", "id", delta)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("finds pairs across bucket boundaries, honors strict < and inclusive delta") {
    // delta=60: buckets are [0,60), [60,120)... pair (59, 61) straddles
    val got = pairs(Seq((1L, t(59), 1L), (1L, t(61), 2L), (1L, t(119), 3L),
      (1L, t(121), 4L), (2L, t(60), 9L)), 60L)
    assert(got.contains((1L, 1L, 2L)))  // boundary straddle
    assert(got.contains((1L, 2L, 3L)))  // within one bucket
    assert(got.contains((1L, 1L, 3L)))  // exactly delta apart: inclusive
    assert(got.contains((1L, 3L, 4L)))
    assert(!got.contains((1L, 1L, 4L))) // 62s > delta
    assert(!got.exists { case (k, _, _) => k == 2L }) // lone event, no pair
    assert(!got.exists { case (_, a, b) => a == b })  // strict: no self pairs
  }

  test("matches the naive quadratic join on a dense fixture") {
    val rows = for (k <- 1L to 3L; i <- 0L until 40L)
      yield (k, t(i * 7 + k), k * 1000 + i)
    val naive = (for {
      (k1, ts1, id1) <- rows; (k2, ts2, id2) <- rows
      if k1 == k2 && ts2.getTime > ts1.getTime &&
        ts2.getTime - ts1.getTime <= 30000L
    } yield (k1, id1, id2)).toSet
    assert(pairs(rows, 30L) == naive && naive.nonEmpty)
  }
}
