package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q194 corpus funnel: planted docs pin the first-fail PRECEDENCE
  * chain (eval beats dup beats decontam beats lang beats quality),
  * that the exact-dup verdict set is exactly the md5-carved replica
  * set, that the funnel's admitted set is consistent with the
  * standalone q81 decontamination query, and that verdict counts tile
  * base + replicas exactly. */
class FunnelSpec extends SparkTestBase {

  // ids 4, 9, 17 are inside the funneldup carve (md5 first hex in
  // {0,1}); 1, 2, 3 are outside — precomputed from the md5 definition.
  private def docs(rows: Seq[(Long, String, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
  }

  test("q194: precedence — eval > dup > contaminated > lang > quality") {
    val fixture = Seq(
      (50L, "alpha beta gamma delta", "en", "s1"), // eval holdout
      (1L, "alpha beta gamma delta epsilon", "en", "s1"), // shares shingle with eval
      (4L, "uno dos tres cuatro cinco", "zh", "s2"), // carved -> replica; original zh
      (2L, "foo bar baz qux", "en", "s2")) // clean; verdict decided by score sign
    val out = DedupQueries.funnelVerdictsOf(docs(fixture)).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out.size == 5, s"4 originals + 1 replica: $out")
    assert(out(50L) == "eval_holdout")
    assert(out(1L) == "contaminated")
    assert(out(4L + DedupQueries.FunnelDupOffset) == "exact_dup",
      "the replica must be claimed by dedup even though its lang is zh")
    assert(out(4L) == "lang_filtered",
      "the ORIGINAL survives keep-lowest and falls to the lang gate")
    // id 2: no planted structural fate — its verdict must agree with the
    // sign of the SAME classifier score the funnel computes (q96's)
    val score = docs(fixture).filter(col("doc_id") === 2L)
      .select(expr("filter(split(text, '\\\\s+'), t -> t != '')").as("toks"))
      .select(coalesce(expr(graft.text.TextQueries.scoreExpr), lit(0L)))
      .collect().head.getLong(0)
    assert(out(2L) == (if (score > 0L) "admitted" else "low_quality"),
      s"score $score vs verdict ${out(2L)}")
  }

  test("q194: replica ids never collide with the eval carve") {
    assert(DedupQueries.FunnelDupOffset % 50L == 0L,
      "offset must preserve doc_id % 50 or replicas would masquerade as eval docs")
  }

  test("q194: dup verdicts are exactly the planted carve; admitted agrees with q81") {
    val dir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet")))
    val base = graft.core.Tables.documents(spark, dir)
    val verdicts = DedupQueries.funnelVerdictsOf(base).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    val carved = base
      .filter(col("doc_id") % 50 =!= 0 && expr(DedupQueries.FunnelDupSel))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val dupIds = verdicts.collect { case (id, "exact_dup") => id }.toSet
    assert(dupIds == carved.map(_ + DedupQueries.FunnelDupOffset),
      "keep-lowest must claim exactly the planted replicas")
    assert(dupIds.nonEmpty, "the dedup stage must be non-vacuous")
    // tiling: every base doc + every replica gets exactly one verdict
    val nBase = base.count()
    assert(verdicts.size == nBase + carved.size)
    // the funnel's admitted docs must be a subset of q81's decontaminated
    // survivors (q81 = train minus contaminated, before lang/quality)
    val q81Ids = graft.SparkEntry.queries("q81_decontaminate")(spark, dir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val admitted = verdicts.collect { case (id, "admitted") => id }.toSet
    assert(admitted.subsetOf(q81Ids),
      "an admitted doc cannot be one q81 would have dropped as contaminated")
    // non-vacuity of the split the oracle hash can't name branch-by-branch
    val vs = verdicts.values.toSet
    assert(vs.contains("eval_holdout") && vs.contains("contaminated"))
  }
}
