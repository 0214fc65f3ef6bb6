package graft.dedup

import graft.SparkTestBase

/** q100's quality-priority canonicalization: its doc→cluster mapping
  * must be exactly q75's, every cluster must elect exactly one
  * canonical, and the canonical must be the (score DESC, doc_id ASC)
  * argmax — i.e. keep-BEST, which differs from q46/q75's keep-lowest
  * whenever a higher-id doc scores higher. */
class CanonicalSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet"))

  test("q100 agrees with q75's clusters and elects the quality argmax") {
    assume(ready)
    val q75 = DedupQueries.queries("q75_dedup_clusters")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val got = DedupQueries.queries("q100_canonical_docs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    // same doc → (cluster, csize) mapping as q75
    assert(got.map(t => (t._1, t._2, t._3)).toSet == q75.toSet,
      "q100's clustering diverges from q75")

    val byCluster = got.groupBy(_._2)
    byCluster.foreach { case (cluster, members) =>
      val canonicals = members.filter(_._5 == 1L)
      assert(canonicals.length == 1, s"cluster $cluster has ${canonicals.length} canonicals")
      val best = members.minBy { case (id, _, _, score, _) => (-score, id) }
      assert(canonicals.head._1 == best._1,
        s"cluster $cluster canonical ${canonicals.head._1} is not the argmax ${best._1}")
    }
  }

  test("keep-best elects a non-lowest id when a higher-id doc scores higher") {
    assume(ready)
    val got = DedupQueries.queries("q100_canonical_docs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    val multi = got.groupBy(_._2).filter(_._2.length > 1)
    assume(multi.nonEmpty, "corpus has no multi-doc clusters at this sf")
    // the policy must actually bind somewhere: in every multi-doc
    // cluster where the min-id doc is NOT the score argmax, the
    // canonical must differ from keep-lowest's choice
    val binding = multi.filter { case (_, ms) =>
      val argmax = ms.minBy { case (id, _, score, _) => (-score, id) }._1
      argmax != ms.map(_._1).min
    }
    // without at least one such cluster this test proves nothing —
    // cancel loudly rather than pass vacuously
    assume(binding.nonEmpty,
      s"no multi-doc cluster where keep-best diverges from keep-lowest (of ${multi.size} clusters)")
    binding.foreach { case (cluster, ms) =>
      val canonical = ms.find(_._4 == 1L).get._1
      assert(canonical != ms.map(_._1).min,
        s"cluster $cluster: canonical fell back to keep-lowest")
    }
  }
}
