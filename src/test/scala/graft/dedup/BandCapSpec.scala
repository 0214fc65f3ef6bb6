package graft.dedup

import graft.SparkTestBase

/** The LSH band-skew cap (Banding.MaxBandBucket=64) never fires on the
  * synthetic corpus, so its semantics are pinned here for ALL THREE
  * band joins in the library (md5-portable q42 path and both xxhash64
  * production paths): a mega-cluster of identical docs is excluded from
  * pair generation (exact dedup's job — its n²/2 fan-out on one hot
  * band key is the scale hazard), while ordinary near-dup pairs outside
  * the cluster still band together. */
class BandCapSpec extends SparkTestBase {

  // 70 identical docs: every band bucket > 64, must be excluded.
  // One identical pair (bucket size 2), must survive.
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
    assert(pairs.contains((1000L, 1001L)), s"[$path] normal pair must band: $pairs")
    assert(!pairs.exists { case (a, b) => a <= 70L || b <= 70L },
      s"[$path] mega-cluster (bucket 70 > cap 64) must be excluded: $pairs")
  }

  test("md5 path (q42): mega-bucket excluded; normal near-dup pairs survive") {
    val pairs = DedupQueries.lshPairsFrom(DedupQueries.withShinglesOf(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    check(pairs, "lshPairsFrom")
  }

  test("production MinHash64.candidatePairs applies the same cap") {
    val pairs = MinHash64.candidatePairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    check(pairs, "MinHash64")
  }

  test("production SimHash64.nearDupPairs applies the same cap") {
    val pairs = SimHash64.nearDupPairs(docs, "doc_id", "text", maxHamming = 7, bands = 8)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    check(pairs, "SimHash64")
  }
}
