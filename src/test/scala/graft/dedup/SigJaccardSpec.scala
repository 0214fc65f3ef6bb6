package graft.dedup

import graft.SparkTestBase

/** q106's signature-Jaccard estimator: exact-duplicate pairs estimate
  * Ĵ = 1 with zero error, every row satisfies the estimator's integer
  * contracts, and the result is partition-invariant. */
class SigJaccardSpec extends SparkTestBase {

  private val base =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
  // one token changed -> high but sub-1.0 Jaccard near-dup
  private val nearDup =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo zulu"

  private def fixture = {
    import spark.implicits._
    Seq(
      1L -> base,
      2L -> base,    // exact dup of 1
      3L -> nearDup, // near-dup of 1/2
      4L -> "unrelated words entirely different content nothing shared here at all today",
    ).toDF("doc_id", "text")
  }

  private def run(df: org.apache.spark.sql.DataFrame) =
    DedupQueries.sigJaccardFrom(DedupQueries.withShinglesOf(df))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap // (doc_a, doc_b) -> (sig_matches, est_ppm, exact_ppm, err_ppm)

  test("an exact duplicate pair matches all 8 signature slots with zero error") {
    val got = run(fixture)
    assert(got.contains((1L, 2L)), s"exact dup pair not banded: ${got.keySet}")
    assert(got((1L, 2L)) == ((8L, 1000000L, 1000000L, 0L)), got((1L, 2L)))
  }

  test("near-dup pairs band together and every row honors the integer contracts") {
    val got = run(fixture)
    assert(got.keySet.exists(p => p == ((1L, 3L)) || p == ((2L, 3L))),
      s"near-dup pair not banded: ${got.keySet}")
    got.foreach { case (pair, (m, est, exact, err)) =>
      assert(m >= 0 && m <= 8, s"$pair sig_matches out of range: $m")
      assert(est == m * 1000000L / 8, s"$pair est_ppm inconsistent")
      assert(exact >= 0 && exact <= 1000000L, s"$pair exact_ppm out of range")
      assert(err == math.abs(est - exact), s"$pair err_ppm inconsistent")
    }
    // the unrelated doc shares no shingle with anything: it may band
    // only against itself, never appear in a cross pair
    got.keySet.foreach { case (a, b) =>
      assert(!(a == 4L ^ b == 4L), s"unrelated doc paired: ($a, $b)")
    }
  }

  test("estimate and exact are partition-invariant") {
    val one = run(fixture.repartition(1))
    val many = run(fixture.repartition(7))
    assert(one == many)
  }

  test("plan: nothing shuffles onto the pair frame — sigs ride the bands, sets broadcast") {
    val plan = DedupQueries.sigJaccardFrom(DedupQueries.withShinglesOf(fixture))
      .queryExecution.executedPlan.toString
    // the ONLY sort-merge join allowed is the band self-join that
    // GENERATES pairs; the signature vectors arrive attached to band
    // rows and the calibration-only set joins are pinned broadcast
    val smj = "SortMergeJoin".r.findAllIn(plan).size
    assert(smj <= 1, s"$smj sort-merge joins — something joined onto the pair frame:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"set joins must be broadcast:\n$plan")
  }
}
