package graft.dedup

import graft.SparkTestBase

/** The LSH band-skew cap (MaxBandBucket=64) never fires on the
  * synthetic corpus, so its semantics are pinned here: a mega-cluster
  * of identical docs is excluded from pair generation (exact dedup's
  * job — its n²/2 fan-out is the scale hazard), while ordinary
  * near-dup pairs outside the cluster still band together. */
class BandCapSpec extends SparkTestBase {

  test("mega-bucket excluded; normal near-dup pairs survive") {
    import spark.implicits._
    val template = (1 to 40).map(i => s"w$i").mkString(" ")
    val spam = (1L to 70L).map(i => i -> template) // 70 identical docs: every band bucket > 64
    val pairDocs = Seq(
      1000L -> (1 to 40).map(i => s"z$i").mkString(" "),
      1001L -> (1 to 40).map(i => s"z$i").mkString(" ")) // identical pair, bucket size 2
    val docs = (spam ++ pairDocs).toDF("doc_id", "text")
    val pairs = DedupQueries.lshPairsFrom(DedupQueries.withShinglesOf(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1000L, 1001L)), s"normal pair must band: $pairs")
    assert(!pairs.exists { case (a, b) => a <= 70L || b <= 70L },
      s"mega-cluster (bucket 70 > cap 64) must be excluded: $pairs")
  }
}
