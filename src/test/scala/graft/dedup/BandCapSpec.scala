package graft.dedup

import graft.SparkTestBase

/** The LSH band-skew guard (Banding.MaxBandBucket=64) never fires on
  * the synthetic corpus, so its semantics are pinned here for ALL THREE
  * band joins in the library (md5-portable q42 path and both xxhash64
  * production paths): an over-cap bucket is TRUNCATED to its cap lowest
  * ids — bounded C(cap,2) pair fan-out instead of the uncapped n²/2,
  * but (unlike dropping the bucket outright) the cluster stays visible
  * through its kept members. Ordinary near-dup pairs outside the
  * cluster are untouched. */
class BandCapSpec extends SparkTestBase {

  private val Cap = Banding.MaxBandBucket // 64
  private val CapPairs = Cap.toLong * (Cap - 1) / 2 // 2016

  // 70 identical docs: every band bucket has 70 ids > cap — each must
  // truncate to the 64 LOWEST ids (identical docs ⇒ identical band
  // keys ⇒ the same kept set in every band ⇒ exactly C(64,2) distinct
  // pairs, none touching ids 65–70).
  // One identical pair (bucket size 2), must survive untouched.
  private lazy val template = (1 to 40).map(i => s"w$i").mkString(" ")
  private lazy val docs = {
    import spark.implicits._
    val spam = (1L to 70L).map(i => i -> template)
    val pairDocs = Seq(
      1000L -> (1 to 40).map(i => s"z$i").mkString(" "),
      1001L -> (1 to 40).map(i => s"z$i").mkString(" "))
    (spam ++ pairDocs).toDF("doc_id", "text")
  }

  private def check(pairs: Set[(Long, Long)], path: String): Unit = {
    assert(pairs.contains((1000L, 1001L)), s"[$path] normal pair must band: ${pairs.size} pairs")
    val spamPairs = pairs.filter { case (a, b) => a <= 70L && b <= 70L }
    assert(spamPairs.size == CapPairs,
      s"[$path] mega-bucket must truncate to C($Cap,2)=$CapPairs pairs, got ${spamPairs.size}")
    assert(!pairs.exists { case (a, b) => (a > Cap && a <= 70L) || (b > Cap && b <= 70L) },
      s"[$path] truncated ids ${Cap + 1}–70 must not appear in any pair")
  }

  test("md5 path (q42): mega-bucket truncated to cap lowest ids; normal pairs survive") {
    val pairs = DedupQueries.lshPairsFrom(DedupQueries.withShinglesOf(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    check(pairs, "lshPairsFrom")
  }

  test("production MinHash64.candidatePairs applies the same truncation") {
    val pairs = MinHash64.candidatePairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    check(pairs, "MinHash64")
  }

  test("production SimHash64.nearDupPairs applies the same truncation") {
    val pairs = SimHash64.nearDupPairs(docs, "doc_id", "text", maxHamming = 7, bands = 8)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    check(pairs, "SimHash64")
  }
}
