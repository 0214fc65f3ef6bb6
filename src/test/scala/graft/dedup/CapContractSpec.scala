package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The cap CONTRACT, swept across cap values — BandCapSpec pins the
  * fixed-cap truncation semantics; this spec pins how results MOVE
  * when the cap moves, so a future [[Banding.MaxBandBucket]] change
  * cannot silently shift the five cap-consuming oracles (q42/q46/q94/
  * q98/q124 — each scaladoc-references the guard):
  *
  *  1. MONOTONICITY: the candidate-pair set at a smaller cap is a
  *     subset of the set at a larger cap — raising the cap only ADDS
  *     pairs, never rewrites them.
  *  2. RECALL FLOOR: at every cap, ALL pairs among each bucket's cap
  *     lowest ids survive (exactly C(min(cluster, cap), 2) inside an
  *     identical-doc cluster), and ordinary sub-cap near-dup pairs are
  *     untouched by the cap entirely.
  *  3. NOT BINDING AT TEST SF: on the real corpus the default cap
  *     truncates nothing — the oracle-checked outputs do not depend on
  *     the cap value at verification scale, which is what licenses
  *     raising it at 100 TB without re-deriving the oracles.
  */
class CapContractSpec extends SparkTestBase {

  /** SkewUp's two documents hazards, miniaturized: a 70-doc identical
    * spam cluster, a 40-doc template cluster (shared base, one unique
    * token each), one ordinary near-identical pair, two singletons. */
  private lazy val docs = {
    import spark.implicits._
    val spamBase = (1 to 40).map(i => s"w$i").mkString(" ")
    val tplBase = (1 to 40).map(i => s"tmb$i").mkString(" ")
    val spam = (1L to 70L).map(i => i -> spamBase)
    val tpl = (101L to 140L).map(i => i -> s"$tplBase uniq$i")
    val rest = Seq(
      1000L -> (1 to 40).map(i => s"z$i").mkString(" "),
      1001L -> (1 to 40).map(i => s"z$i").mkString(" "),
      2000L -> (1 to 40).map(i => s"s$i").mkString(" "),
      2001L -> (1 to 40).map(i => s"t$i").mkString(" "))
    (spam ++ tpl ++ rest).toDF("doc_id", "text")
  }

  private def pairsAt(bands: DataFrame, cap: Int): Set[(Long, Long)] = {
    val b = Banding.capBuckets(bands, "band_key", "doc_id", cap)
    b.as("a").join(b.as("b"),
        col("a.band_no") === col("b.band_no") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def choose2(n: Long): Long = n * (n - 1) / 2

  test("sweep 16/64/256: pair sets are monotone and each cap keeps its full recall floor") {
    val bands = DedupQueries.bandRowsOf(
      DedupQueries.sigsOf(DedupQueries.withShinglesOf(docs))).persist()
    try {
      val byCap = Seq(16, 64, 256).map(c => c -> pairsAt(bands, c)).toMap
      // 1. monotone growth
      assert(byCap(16).subsetOf(byCap(64)),
        s"cap 16 pairs must be a subset of cap 64 (16\\64: ${(byCap(16) -- byCap(64)).take(5)})")
      assert(byCap(64).subsetOf(byCap(256)),
        s"cap 64 pairs must be a subset of cap 256 (64\\256: ${(byCap(64) -- byCap(256)).take(5)})")
      // 2. recall floor per cap
      for ((cap, pairs) <- byCap) {
        val spamKept = math.min(70L, cap.toLong)
        val spamPairs = pairs.filter { case (a, b) => a <= 70L && b <= 70L }
        assert(spamPairs == (for {
            a <- 1L to spamKept; b <- (a + 1) to spamKept
          } yield (a, b)).toSet,
          s"[cap $cap] spam cluster must keep exactly C($spamKept,2)=${choose2(spamKept)} " +
            s"lowest-id pairs, got ${spamPairs.size}")
        assert(pairs.contains((1000L, 1001L)),
          s"[cap $cap] the ordinary near-dup pair must always survive")
        assert(!pairs.exists { case (a, b) => Set(a, b).intersect(Set(2000L, 2001L)).nonEmpty },
          s"[cap $cap] unrelated singletons must never pair")
      }
      // the 40-doc template cluster is UNDER caps 64 and 256: its pair
      // set must be complete and IDENTICAL at both (sub-cap content is
      // cap-invariant — the property that keeps oracles stable); at
      // cap 16 it truncates, which the monotone-subset check covers
      val tplAt = byCap.map { case (c, ps) =>
        c -> ps.filter { case (a, b) => a >= 101L && b <= 140L && a <= 140L } }
      val tplFull = (for { a <- 101L to 140L; b <- (a + 1) to 140L } yield (a, b)).toSet
      assert(tplAt(64) == tplFull && tplAt(256) == tplFull,
        s"sub-cap template cluster must keep all C(40,2)=${choose2(40)} pairs at caps >= 64: " +
          s"64->${tplAt(64).size}, 256->${tplAt(256).size}")
    } finally { bands.unpersist(); graft.core.ScratchCache.drain() }
  }

  test("default cap is not binding on the real corpus at verification SF") {
    val dir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet")))
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val bands = DedupQueries.bandRowsOf(
      DedupQueries.sigsOf(DedupQueries.withShinglesOf(docs))).persist()
    try {
      val total = bands.count()
      val kept = Banding.capBuckets(bands, "band_key", "doc_id").count()
      assert(kept == total,
        s"cap ${Banding.MaxBandBucket} truncated ${total - kept} of $total band rows at " +
          "verification SF — oracle outputs now DEPEND on the cap value")
    } finally { bands.unpersist(); graft.core.ScratchCache.drain() }
  }
}
