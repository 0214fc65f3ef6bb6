package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Adversarial-skew stress suite: the 100 TB story of the dedup/ANN/
  * text operators rests on caps and broadcasts; this spec runs the
  * affected catalog queries against a fixture BUILT to break them
  * ([[SkewUp]]: an over-cap identical-doc cluster, an over-cap
  * template cluster, an under-cap cluster as the control, stopword-
  * saturated docs, one dominant embedding label) and asserts the
  * guards hold — structurally (pair counts, participants, plan
  * shapes), not by hoping the runtime stays low.
  *
  * Fixture sizes are spec-scale (seconds); `SkewUp.main` writes the
  * same distributions at sf0.1 scale for the bench numbers in
  * BENCH_SKEW.md.
  */
class SkewStressSpec extends SparkTestBase {

  private val src = "/root/testdata/sf0.01"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$src/documents.parquet"))

  private val SpamN = 120  // identical docs, > MaxBandBucket=64: buckets truncate
  private val TplN = 100   // near-identical template docs, > cap: buckets truncate
  private val StopN = 50   // near-identical docs, < cap: the control — must pair in full
  private val DomN = 2000  // dominant-label vectors (~286 survive q45's %7 sample, > MaxLabelBlock=256)

  private var built = false
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-skew-spec").toString
    SkewUp.write(spark, src, d, SpamN, TplN, StopN, DomN)
    built = true
    d
  }

  override protected def afterAll(): Unit = {
    if (built) org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    super.afterAll()
  }

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)
  private def between(id: Column, lo: Long, hi: Long) = id >= lo && id < hi
  private val (spamLo, spamHi) = (2000000L, 2000000L + SpamN)
  private val (tplLo, tplHi) = (3000000L, 3000000L + TplN)
  private val stopLo = 4000000L

  test("q42/q44: over-cap clusters are truncated to bounded pairs; under-cap clusters pair in full") {
    assume(ready)
    val cap = 64 // Banding.MaxBandBucket
    val capPairs = cap.toLong * (cap - 1) / 2 // 2016: worst case per bucket
    val pairs = run("q42_dedup_lsh_pairs").cache()
    val spamSpam = pairs.filter(between(col("doc_a"), spamLo, spamHi) &&
      between(col("doc_b"), spamLo, spamHi)).count()
    val spamTruncated = pairs.filter(
      between(col("doc_a"), spamLo + cap, spamHi) || between(col("doc_b"), spamLo + cap, spamHi)).count()
    val tplTpl = pairs.filter(between(col("doc_a"), tplLo, tplHi) &&
      between(col("doc_b"), tplLo, tplHi)).count()
    val stopStop = pairs.filter(col("doc_a") >= stopLo && col("doc_b") >= stopLo).count()
    val total = pairs.count()
    pairs.unpersist()
    // uncapped, the three clusters alone would fan out
    // C(120,2)+C(100,2)+C(50,2) = 13,315 pairs; bucket truncation bounds
    // each over-cap bucket to C(cap,2) pairs among its cap LOWEST ids
    // (graceful degradation — the cluster stays visible, unlike the old
    // drop-the-bucket semantics) and keeps the under-cap control intact
    assert(spamSpam == capPairs,
      s"identical $SpamN-doc cluster must truncate to C($cap,2)=$capPairs pairs, got $spamSpam")
    assert(spamTruncated == 0L,
      s"ids beyond the $cap lowest must not appear in pairs: $spamTruncated")
    // per band the template cluster's main bucket (~90% of its docs)
    // truncates to exactly cap rows → ≥ C(cap,2) pairs from one band,
    // ≤ one truncated bucket per band in total
    assert(tplTpl >= capPairs && tplTpl <= 4 * capPairs,
      s"template $TplN-doc cluster must band truncated/bounded: $tplTpl pairs")
    assert(stopStop == StopN.toLong * (StopN - 1) / 2,
      s"under-cap $StopN-doc cluster must band in full, got $stopStop")
    assert(total < 6000, s"pair fan-out not bounded: $total")
    // verification work is confined to the banded candidates
    assert(run("q44_dedup_jaccard_verify").count() == total,
      "q44 must score exactly the banded candidate pairs")
    graft.core.ScratchCache.drain()
  }

  test("q45: dominant embedding label is truncated to the label-block cap") {
    assume(ready)
    val cap = 256L // DedupQueries.MaxLabelBlock
    val dom = run("q45_dedup_embed_cosine").filter(col("label") === 9999).cache()
    val participants = dom.select(col("vec_a").as("v"))
      .union(dom.select(col("vec_b"))).distinct().count()
    val domPairs = dom.count()
    dom.unpersist()
    assert(participants <= cap,
      s"label block not capped: $participants participants (~${DomN / 7} sampled uncapped)")
    assert(domPairs <= cap * (cap - 1) / 2, s"dominant-label pair count $domPairs exceeds cap^2/2")
    assert(domPairs > 0, "capped block must still be verified")
    graft.core.ScratchCache.drain()
  }

  test("q46: truncated spam cluster collapses to canonical + truncation remainder") {
    assume(ready)
    val cap = 64 // Banding.MaxBandBucket
    val out = run("q46_dedup_pipeline").cache()
    val spamSurvivors = out.filter(col("source") === "spam").count()
    val rows = out.count()
    out.unpersist()
    // bucket truncation keeps the cap lowest spam ids in every band;
    // verified pairs among them drop all but the canonical lowest, so
    // survivors = 1 canonical + (SpamN − cap) truncated-away ids — the
    // remainder is exact dedup's job (q40) / a later pass's, and is the
    // documented price of bounding one hot band key's fan-out
    assert(spamSurvivors == 1L + (SpamN - cap),
      s"expected 1 canonical + ${SpamN - cap} truncation remainder, got $spamSurvivors")
    assert(rows > 0)
    graft.core.ScratchCache.drain()
  }

  test("q98: hot shingles are capped — over-cap spam docs beyond the cap never pair") {
    assume(ready)
    val cap = 64 // Banding.MaxBandBucket
    val pairs = run("q98_containment_dedup").cache()
    // every shingle of the 120 identical spam docs is held by all of
    // them → the inverted index keeps the cap lowest ids per shingle,
    // so no spam doc beyond spamLo+cap can appear in any pair
    val beyondCap = pairs.filter(
      between(col("doc_a"), spamLo + cap, spamHi) || between(col("doc_b"), spamLo + cap, spamHi)).count()
    val spamSpam = pairs.filter(between(col("doc_a"), spamLo, spamHi) &&
      between(col("doc_b"), spamLo, spamHi)).count()
    pairs.unpersist()
    assert(beyondCap == 0L, s"$beyondCap pairs involve spam docs the cap should have truncated")
    assert(spamSpam > 0L && spamSpam <= cap.toLong * (cap - 1) / 2,
      s"spam-spam pair count $spamSpam outside (0, cap^2/2]")
    graft.core.ScratchCache.drain()
  }

  test("q106: signature-Jaccard calibration stays band-capped under over-cap spam") {
    assume(ready)
    val cap = 64 // Banding.MaxBandBucket
    val est = run("q106_sig_jaccard_est").cache()
    // the spam cluster's identical docs agree on all 8 signature slots
    // (est = exact = 1.0) but only the cap lowest ids may ever pair
    val beyondCap = est.filter(
      between(col("doc_a"), spamLo + cap, spamHi) || between(col("doc_b"), spamLo + cap, spamHi)).count()
    val spamRows = est.filter(between(col("doc_a"), spamLo, spamHi) &&
      between(col("doc_b"), spamLo, spamHi)).cache()
    val offCalibration = spamRows
      .filter(col("sig_matches") =!= 8L || col("est_ppm") =!= 1000000L ||
        col("exact_ppm") =!= 1000000L || col("err_ppm") =!= 0L).count()
    val spamN = spamRows.count()
    spamRows.unpersist(); est.unpersist()
    assert(beyondCap == 0L, s"$beyondCap calibration rows involve docs the band cap should truncate")
    assert(spamN > 0L && spamN <= cap.toLong * (cap - 1) / 2,
      s"spam-spam calibration row count $spamN outside (0, cap^2/2]")
    assert(offCalibration == 0L,
      s"$offCalibration identical-doc pairs not at est=exact=1.0 — estimator broken on the easiest case")
    graft.core.ScratchCache.drain()
  }

  test("q100: one canonical per cluster under over-cap spam/template skew") {
    assume(ready)
    val out = run("q100_canonical_docs").cache()
    val perCluster = out.groupBy(col("cluster_id"))
      .agg(sum(col("is_canonical")).as("n_canon"))
      .filter(col("n_canon") =!= 1L).count()
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    val rows = out.count()
    out.unpersist()
    assert(perCluster == 0L, s"$perCluster clusters without exactly one canonical")
    assert(rows == docs, s"q100 must emit one row per doc ($rows vs $docs)")
    graft.core.ScratchCache.drain()
  }

  test("q68: df stays broadcast under stopword saturation (no shuffle join on the hot term)") {
    assume(ready)
    val df = run("q68_tfidf_topterms")
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"df join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"hot-term shuffle join crept in:\n$plan")
    graft.core.ScratchCache.drain()
  }

  test("q74: probe side stays broadcast with a flooded bucket region; top-k intact") {
    assume(ready)
    val df = run("q74_sim_topk_lsh_multitable")
    assert(df.count() == 10L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"probe join must broadcast:\n$plan")
    graft.core.ScratchCache.drain()
  }

  test("q111: over-cap spam cluster cleans to empty; accounting holds for every doc; dup set joins broadcast") {
    assume(ready)
    val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e" // md5("")
    val out = run("q111_line_dedup").cache()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(length(trim(col("text"))) > 0).count()
    val rows = out.count()
    // 120 identical spam docs: every segment recurs in all of them →
    // the whole cluster cleans to the empty string. No pairwise join
    // anywhere in q111, so skew can only show up as a hot aggregate
    // key — which truncates nothing and drops nothing.
    val spamWrong = out.filter(between(col("doc_id"), spamLo, spamHi) &&
      (col("drop_ppm") =!= 1000000L || col("clean_md5") =!= emptyMd5 || col("kept_toks") =!= 0L))
      .count()
    val badAccounting = out.filter(col("kept_toks") > col("n_toks") ||
      col("n_dup_segs") > col("n_segs")).count()
    out.unpersist()
    assert(rows == docs, s"one row per non-empty doc ($rows vs $docs)")
    assert(spamWrong == 0L, s"$spamWrong spam docs not fully cleaned")
    assert(badAccounting == 0L, s"$badAccounting docs with impossible accounting")
    val plan = run("q111_line_dedup").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dup-set join must broadcast:\n$plan")
    graft.core.ScratchCache.drain()
  }

  test("q112: bucket-stats frame stays fixed-width (≤256) under any corpus skew; weights join broadcast") {
    assume(ready)
    val out = run("q112_dsir_weights")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(length(trim(col("text"))) > 0).count()
    assert(out.count() == docs, "one row per tokenized doc at any skew")
    // the importance model is ≤ 256 bucket rows no matter how the
    // corpus is distributed — that frame, not the corpus, is what the
    // per-doc join consumes, and it must ride broadcast
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"weight join must broadcast:\n$plan")
    graft.core.ScratchCache.drain()
  }

  test("q114: PQ serve stays fixed-width under dominant-label skew (10 rows, codes-only first pass)") {
    assume(ready)
    val out = run("q114_sim_pq_adc").cache()
    val rows = out.count()
    // the ADC table is ≤ PqSub × PqK rows and the shortlist is a
    // constant 64 regardless of how the 2000-vector dominant label
    // floods the space — the serve cannot widen with skew
    assert(rows == 10L, s"top-k must stay exactly 10, got $rows")
    out.unpersist()
    graft.core.ScratchCache.drain()
  }

  test("q80: per-shard packing width stays bounded under the bulk chunk volume") {
    assume(ready)
    val target = 8192L // TextQueries.TargetShardTokens
    val widths = run("q80_sequence_packing")
      .groupBy(col("shard")).agg(sum(col("n_chunk_tokens")).as("toks"))
      .collect().map(_.getLong(1))
    assert(widths.max <= 2 * target,
      s"shard width ${widths.max} exceeds 2x target $target across ${widths.length} shards")
    graft.core.ScratchCache.drain()
  }

  test("q98/q44/q45 output-normalized scaling: time growth is explained by output growth") {
    assume(ready)
    // BENCH_SF1's q98 ratio (7.7x time at 10x data) needs an output-
    // normalized explanation, pinned here at spec scale: ScaleUp grows
    // the corpus as NEAR-DUPLICATES (shared shingles, per-replica
    // suffix), so containment/verify PAIRS grow superlinearly in the
    // replica factor while per-pair cost stays cap-bounded. The claim:
    // output rows grow at least linearly (cross-replica pairs), and
    // wall-clock grows no faster than 2x the output growth — i.e.
    // time-per-output-row stays ~flat; a breach means the plan itself
    // degraded, not the workload.
    val dst = java.nio.file.Files.createTempDirectory("graft-scale-spec").toString
    ScaleUp.write(spark, src, dst, 4)
    try {
      def timedRows(name: String, dir: String): (Long, Double) = {
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, dir).count()
        graft.core.ScratchCache.drain()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      for (name <- Seq("q98_containment_dedup", "q44_dedup_jaccard_verify", "q45_dedup_embed_cosine")) {
        timedRows(name, src) // warm both paths: JIT + codegen + parquet footers
        timedRows(name, dst)
        val (rows1, t1) = timedRows(name, src)
        val (rows4, t4) = timedRows(name, dst)
        assert(rows1 > 0, s"$name: empty baseline output")
        assert(rows4 > rows1, s"$name: output did not grow under 4x near-dup replication")
        val rowRatio = rows4.toDouble / rows1
        val timeRatio = t4 / t1
        // the real claim: time grows no faster than 2x output growth.
        // The only escape is SHORT ABSOLUTE RUNTIMES (t4 < 5 s), where
        // fixed per-query overhead (planning, task launch) dominates
        // and a ratio on seconds-scale numbers is mostly noise — NOT a
        // blanket max(rowRatio, 4) floor, which would tolerate 8x time
        // growth on flat output.
        assert(timeRatio <= 2 * rowRatio || t4 < 5.0,
          s"$name: time grew ${f"$timeRatio%.1f"}x but output only ${f"$rowRatio%.1f"}x " +
            f"(t1=$t1%.2fs rows1=$rows1, t4=$t4%.2fs rows4=$rows4) — sec/row degraded")
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dst))
  }

  test("q124: the structurally-identical spam+template cluster stays band-capped, hamming 0") {
    assume(ready)
    // aHash is a STRUCTURE hash: "tpl1 tpl2 …" and "tmb1 tmb2 …" have
    // identical char-class layouts (letter vs digit/space at every
    // byte position), hence identical 64-bit fingerprints — the spam
    // and template clusters merge into ONE 220-doc structural cluster
    // sharing every band bucket, and the cap keeps the 64 lowest ords
    // (spam's lower ids shadow the template rows — the shingle-based
    // queries keep the clusters apart, which is exactly the exact-vs-
    // perceptual contrast q108/q124 exist to span). The guard claim:
    // participants ≤ cap, fan-out ≤ C(cap,2), all matches exact.
    val cap = graft.dedup.Banding.MaxBandBucket.toLong
    val rows = run("q124_frame_neardup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    def inCluster(id: Long) =
      (id >= spamLo && id < spamHi) || (id >= tplLo && id < tplHi)
    val cl = rows.filter { case (a, b, _, _, _) => inCluster(a) && inCluster(b) }
    val participants = cl.flatMap { case (a, b, _, _, _) => Seq(a, b) }.distinct.length
    assert(participants >= 2, "structural cluster produced no pairs")
    assert(participants <= cap,
      s"$participants media in pairs — the $cap-row band cap did not bind")
    assert(cl.length <= cap * (cap - 1) / 2,
      s"${cl.length} pairs exceed C($cap,2) — fan-out unbounded")
    assert(cl.forall { case (_, _, _, nNear, minH) => minH == 0L && nNear == 0L },
      s"structure-identical frames must score hamming 0: ${cl.take(3).toSeq}")
    graft.core.ScratchCache.drain()
  }

  test("q137/q149 grouped-quantile core survives a ~10^6-group key with exact answers") {
    // the per-group-histogram memory claim (CATALOG q149): the sketch
    // is |groups|·≤256 rows, every window partitions by group, and the
    // exact calibration ranks only covering-bucket slices — so a group
    // key six orders of magnitude above q149's modal 5-value key must
    // complete with bounded task memory, and the answers stay EXACT.
    // A per-group sort-based form would be fine here (groups are tiny)
    // but dies on modal keys; the sketch form must be safe at BOTH
    // extremes — this pins the many-groups end.
    import spark.implicits._
    val nGroups = 1000000L
    val perGroup = 3L
    // group g holds c = 100 + 7g + 13k for k = 0,1,2 — per-group
    // medians and maxima are closed-form, so correctness is checkable
    // without a driver-side million-group sort
    val cents = spark.range(nGroups * perGroup)
      .select($"id".as("o_orderkey"),
        ($"id" % nGroups).cast("string").as("g"),
        expr(s"100L + (id % $nGroups) * 7L + (id DIV $nGroups) * 13L").as("c"))
    val out = graft.layout.LayoutQueries.groupedQuantileCore(cents)
    assert(out.count() == nGroups * 3L,
      "every group must emit exactly its 3 quantile rows")
    // n=3 per group: p50 rank 2, p90/p99 rank 3 — exact values closed-form
    val bad = out
      .withColumn("gl", $"priority".cast("long"))
      .filter(
        ($"qppm" === 500000L && $"exact_cents" =!= lit(113L) + $"gl" * 7L) ||
        ($"qppm" =!= 500000L && $"exact_cents" =!= lit(126L) + $"gl" * 7L))
      .count()
    assert(bad == 0L, s"$bad grouped-quantile rows have wrong exact ranks")
  }
}
