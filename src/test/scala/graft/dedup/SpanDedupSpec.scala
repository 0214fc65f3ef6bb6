package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q86's winnowed span fingerprinting: the winnowing guarantee (any
  * common run of ≥ SpanLen + WinnowW − 1 = 29 tokens shares a
  * fingerprint at ANY offsets — the property a strided sample lacks),
  * the containment semantics, and the band-truncation guard on viral
  * boilerplate spans. Runs the catalog query against synthetic parquet
  * dirs so the whole doc→pair path is exercised. */
class SpanDedupSpec extends SparkTestBase {

  // SpanLen=20, WinnowW=10 (DedupQueries constants)
  private def toks(prefix: String, n: Int, from: Int = 0) =
    (from until from + n).map(i => s"$prefix$i").mkString(" ")

  private def writeDocs(d: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
  }

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-span-spec").toString
    val shared29 = toks("c", 29) // = SpanLen + WinnowW − 1: guarantee applies
    writeDocs(d, Seq(
      // 1,2: identical 40-token docs — identical fingerprint sets
      (1L, toks("a", 40)),
      (2L, toks("a", 40)),
      // 3: the 29-token guaranteed run at offset 7 — NOT congruent to
      //    doc 4's offset 0 mod any stride; only content-defined
      //    selection can align them
      (3L, s"${toks("u", 7)} $shared29 ${toks("v", 8)}"),
      (4L, s"$shared29 ${toks("w", 15)}"),
      // 5: 19 tokens — below SpanLen, emits nothing
      (5L, toks("e", 19)),
      // 6: unrelated
      (6L, toks("z", 44)),
    ))
    d
  }

  override protected def afterAll(): Unit = {
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    super.afterAll()
  }

  private def pairs(d: String) =
    DedupQueries.queries("q86_span_dedup")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("identical docs share their full fingerprint set; short/unrelated docs emit nothing shared") {
    val p = pairs(dir)
    assert(p.contains((1L, 2L)), s"identical docs must pair: $p")
    // 40 tokens → 21 window hashes → 12 winnow windows → 1..12 distinct fps
    assert(p((1L, 2L)) >= 1L && p((1L, 2L)) <= 12L,
      s"identical 40-token docs share their whole winnowed set, got ${p((1L, 2L))}")
    assert(!p.keys.exists { case (a, b) => a == 5L || b == 5L },
      "a doc below SpanLen tokens must not fingerprint")
    assert(!p.keys.exists { case (a, b) => a == 6L || b == 6L },
      "unrelated docs must not pair")
  }

  test("winnowing guarantee: a 29-token common run pairs even at incongruent offsets") {
    val p = pairs(dir)
    assert(p.contains((3L, 4L)),
      s"offset-7 vs offset-0 common run must be caught (content-defined selection): $p")
  }

  test("viral boilerplate span: over-cap fingerprint buckets truncate to the cap lowest ids") {
    val cap = Banding.MaxBandBucket
    val d = java.nio.file.Files.createTempDirectory("graft-span-viral").toString
    try {
      // 80 docs with IDENTICAL text: every fingerprint bucket holds all
      // 80 ids, so each truncates to the same cap lowest — exactly
      // C(cap,2) pairs, none touching ids beyond the cap. (With unique
      // tails the tail-adjacent winnow windows select doc-specific
      // fingerprints whose buckets stay under the cap — those pairs
      // are legitimate and bounded per-bucket, but not exact to pin.)
      writeDocs(d, (1L to 80L).map(i => (i, toks("s", 40))))
      val p = pairs(d).keySet
      assert(p.size == cap.toLong * (cap - 1) / 2,
        s"80-doc span buckets must truncate to C($cap,2) pairs, got ${p.size}")
      assert(!p.exists { case (a, b) => a > cap || b > cap },
        "ids beyond the cap lowest must not appear")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
  }
}
