package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q195 dedup-threshold savings: a planted pair frame replays the
  * sweep arithmetic by hand (keep-lowest drop attribution, zero-row
  * thresholds coalesced, exact ppm of corpus tokens), the fixture run
  * pins monotonicity + docs≤pairs, and the 700000 row is proven a
  * SUBSET of q44's legacy round(·,4) gate (floor-div ppm is the exact
  * rational comparison; round admits J ≥ 0.69995). */
class DedupSavingsSpec extends SparkTestBase {

  test("q195: planted pairs — hand replay of every column") {
    import spark.implicits._
    // doc 2's best neighbor: J .96 (pair 1-2); doc 3's: J .99 (pair 1-3)
    val pairs = Seq((1L, 2L, 960000L), (1L, 3L, 990000L), (2L, 3L, 710000L))
      .toDF("doc_a", "doc_b", "j_ppm")
    val toks = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("doc_id", "n_toks")
    val out = DedupQueries.savingsFromPairs(pairs, toks).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.keySet == DedupQueries.SavingsThresholds.toSet)
    // corpus = 60 toks
    assert(out(700000L) == ((3L, 2L, 50L, 50L * 1000000L / 60L)), out(700000L))
    assert(out(900000L) == ((2L, 2L, 50L, 833333L)), out(900000L))
    assert(out(950000L) == ((2L, 2L, 50L, 833333L)), out(950000L))
    // at 970000 only pair 1-3 qualifies; only doc 3 is dropped
    assert(out(970000L) == ((1L, 1L, 30L, 30L * 1000000L / 60L)), out(970000L))
    // above every pair: all-zero row must still be present
    assert(out(985000L) == ((1L, 1L, 30L, 500000L)), out(985000L))
  }

  test("q195: thresholds above every pair coalesce to explicit zero rows") {
    import spark.implicits._
    val pairs = Seq((1L, 2L, 710000L)).toDF("doc_a", "doc_b", "j_ppm")
    val toks = Seq((1L, 5L), (2L, 5L)).toDF("doc_id", "n_toks")
    val out = DedupQueries.savingsFromPairs(pairs, toks).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(700000L) == ((1L, 1L, 5L, 500000L)))
    Seq(900000L, 950000L, 970000L, 985000L).foreach { t =>
      assert(out(t) == ((0L, 0L, 0L, 0L)), s"threshold $t must be a zero row, got ${out(t)}")
    }
  }

  test("q195 on the fixture: monotone sweep, docs <= pairs, q44-subset at 0.7") {
    val dir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet")))
    val rows = graft.SparkEntry.queries("q195_dedup_savings")(spark, dir).collect()
    assert(rows.length == DedupQueries.SavingsThresholds.size)
    val sorted = rows.sortBy(_.getLong(0))
    sorted.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getLong(1) >= hi.getLong(1), "n_pairs must not increase with threshold")
      assert(lo.getLong(2) >= hi.getLong(2), "n_docs must not increase with threshold")
      assert(lo.getLong(3) >= hi.getLong(3), "n_toks must not increase with threshold")
    }
    sorted.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "each dropped doc needs >= 1 qualifying pair")
    }
    assert(sorted.head.getLong(1) > 0L, "the sweep must be non-vacuous on the fixture")
    // exact-rational >= 0.7 is a subset of q44's round(J, 4) >= 0.7 gate
    val verified = DedupQueries.verifiedPairs(spark, dir).count()
    assert(sorted.head.getLong(1) <= verified,
      s"ppm-exact 700000 pairs (${sorted.head.getLong(1)}) must not exceed q44's rounded gate ($verified)")
  }
}
