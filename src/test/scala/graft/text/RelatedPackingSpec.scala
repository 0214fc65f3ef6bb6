package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q198 related-document packing: planted domains pin the prefix-sum
  * contiguity, context-boundary arithmetic, domain coherence (a
  * context never mixes domains — structural, by key), derived
  * subshard scaling, and that the hash-derived subshard key actually
  * SPREADS ids the synthetic graph makes congruent (the doc_id %
  * n_sub failure mode). */
class RelatedPackingSpec extends SparkTestBase {

  private def frame(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "domain", "n_toks")
  }

  test("q198: offsets are exclusive prefix sums; ctx = offset DIV budget") {
    // one small domain, n_sub = 1 regardless of hash spread
    val rows = Seq((1L, "a.com", 30L), (2L, "a.com", 40L), (3L, "a.com", 50L))
    val out = TextQueries.relatedPackingOf(frame(rows)).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out(1L) == ((0L, 30L, 0L, 0L)))
    assert(out(2L) == ((0L, 40L, 30L, 0L)))
    assert(out(3L) == ((0L, 50L, 70L, 1L)), "70 DIV 64 = 1 — second context")
  }

  test("q198: subshard count derives from domain mass and the key spreads congruent ids") {
    // ids all congruent mod 14 — the synthesized-domain structure that
    // makes doc_id % n_sub constant; 600 toks over target 256 -> n_sub 3
    val rows = (0 until 12).map(i => (14L * i + 2L, "big.com", 50L)) :+ (9999L, "tiny.com", 10L)
    val out = TextQueries.relatedPackingOf(frame(rows)).collect()
    val bySub = out.filter(_.getString(1) == "big.com").groupBy(_.getLong(2))
    assert(bySub.keySet == Set(0L, 1L, 2L), s"600/256 -> 3 subshards, got ${bySub.keySet}")
    assert(bySub.values.forall(_.nonEmpty),
      "the md5 subshard key must spread ids a modulo key would collapse")
    assert(out.filter(_.getString(1) == "tiny.com").forall(_.getLong(2) == 0L))
    // within each subshard, offsets replay as exclusive prefix sums in id order
    bySub.values.foreach { g =>
      val sorted = g.sortBy(_.getLong(0))
      var run = 0L
      sorted.foreach { r =>
        assert(r.getLong(4) == run, s"offset must be the exclusive prefix sum: $r")
        assert(r.getLong(5) == run / TextQueries.RelatedCtxBudget)
        run += r.getLong(3)
      }
    }
  }

  test("q198: doubling a domain's corpus doubles its subshards (q80's scaling contract)") {
    val once = (0 until 8).map(i => (i.toLong, "d.com", 64L))
    val twice = (0 until 16).map(i => (i.toLong, "d.com", 64L))
    def subs(rows: Seq[(Long, String, Long)]) =
      TextQueries.relatedPackingOf(frame(rows)).select(col("sub")).distinct().count()
    assert(subs(once) == 2L, "512/256")
    assert(subs(twice) == 4L, "1024/256")
  }

  test("q198 on the fixture: coherence + full coverage of tokenized docs") {
    val dir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet")))
    val out = graft.SparkEntry.queries("q198_related_packing")(spark, dir).collect()
    assert(out.nonEmpty)
    // every tokenized doc appears exactly once
    val n = graft.core.Tables.documents(spark, dir)
      .selectExpr(s"${TextQueries.toksExpr} AS toks").filter("size(toks) >= 1").count()
    assert(out.length.toLong == n)
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    // context splitting is non-vacuous on the fixture
    assert(out.exists(_.getLong(5) > 0L), "at least one domain must span 2+ contexts")
  }
}
