package graft.dedup

import graft.SparkTestBase

/** q45's within-label cosine verification is blocked by label, so one
  * dominant label would fan out n²/2 pairs — the classic skewed
  * quadratic join. The label-block cap (DedupQueries.MaxLabelBlock=256,
  * the label analog of Banding.MaxBandBucket) truncates each block to
  * its lowest vec_ids, bounding per-label pair work at cap²/2 no matter
  * how skewed the labels get. Never fires on the synthetic corpus
  * (oracle output unchanged), so its semantics are pinned here on a
  * mega-label fixture.
  */
class LabelBlockCapSpec extends SparkTestBase {

  private val cap = DedupQueries.MaxLabelBlock

  // 600 sampled vectors (vec_id % 7 == 0 survives q45's sample filter)
  // in ONE label — uncapped this is C(600,2) = 179,700 pairs. Plus a
  // 3-vector normal label that must be verified in full. All vectors
  // identical => cosine 1.0 => every generated pair passes the filter,
  // so the output count IS the pair fan-out.
  private lazy val emb = {
    import spark.implicits._
    val v = Array(1.0f, 0.5f, 2.0f, 0.25f)
    val big = (0 until 600).map(i => (i * 7L, "big", v))
    val small = Seq((100001L * 7, "small", v), (100002L * 7, "small", v), (100003L * 7, "small", v))
    (big ++ small).toDF("vec_id", "label", "embedding")
  }

  test("mega-label block is truncated to MaxLabelBlock lowest vec_ids") {
    val pairs = DedupQueries.embedCosinePairsOf(emb)
    val bigPairs = pairs.filter(pairs("label") === "big")
    val n = bigPairs.count()
    assert(n == cap.toLong * (cap - 1) / 2,
      s"expected C($cap,2) capped pairs, got $n (uncapped would be ${600L * 599 / 2})")
    // deterministic truncation: the cap keeps the LOWEST vec_ids
    val maxId = bigPairs.agg(org.apache.spark.sql.functions.max("vec_b")).head().getLong(0)
    assert(maxId == (cap - 1) * 7L, s"cap must keep lowest vec_ids; max participant was $maxId")
  }

  test("labels under the cap are verified in full") {
    val pairs = DedupQueries.embedCosinePairsOf(emb)
    assert(pairs.filter(pairs("label") === "small").count() == 3L) // C(3,2)
  }

  test("cap selection is partition-count invariant (row_number ties broken by vec_id, not layout)") {
    def pairsOf(parts: Int) = DedupQueries.embedCosinePairsOf(emb.repartition(parts))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairsOf(1) == pairsOf(13),
      "the truncated block (and so the pair set) must not depend on physical partitioning")
  }
}
