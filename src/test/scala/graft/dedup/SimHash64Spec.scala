package graft.dedup

import graft.SparkTestBase

/** Correctness evidence for the xxhash64 SimHash path (no DuckDB
  * oracle — xxhash64 is Spark-native): determinism, the
  * near-dup-means-near-signature property, and band recall. */
class SimHash64Spec extends SparkTestBase {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("signatures are deterministic and zero for empty docs") {
    val d = docs(1L -> "the quick brown fox", 2L -> "the quick brown fox",
      3L -> "", 4L -> "   ")
    val sigs = SimHash64.signatures(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L)) // identical text, identical signature
    assert(sigs(3L) == 0L && sigs(4L) == 0L) // no tokens, no votes
    val again = SimHash64.signatures(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs == again) // run-to-run deterministic
  }

  test("signatures are partition-count invariant (bit votes are commutative sums)") {
    val d = docs((1L to 50L).map(i =>
      i -> (1 to 20).map(j => s"w${(i * 5 + j) % 29}").mkString(" ")): _*)
    def sigs(df: org.apache.spark.sql.DataFrame) =
      SimHash64.signatures(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(d.repartition(1)) == sigs(d.repartition(7)))
  }

  test("near-duplicates have small Hamming distance; unrelated text large") {
    import org.apache.spark.sql.functions._
    val base = (1 to 40).map(i => s"token$i").mkString(" ")
    val oneEdit = ((1 to 39).map(i => s"token$i") :+ "CHANGED").mkString(" ")
    val unrelated = (1 to 40).map(i => s"other$i").mkString(" ")
    val sigs = SimHash64.signatures(
      docs(1L -> base, 2L -> oneEdit, 3L -> unrelated), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(dist(sigs(1L), sigs(2L)) < dist(sigs(1L), sigs(3L)),
      s"near-dup must be closer than unrelated: ${dist(sigs(1L), sigs(2L))} vs ${dist(sigs(1L), sigs(3L))}")
    assert(dist(sigs(1L), sigs(2L)) <= 16) // one token of 40 changed
  }

  test("8-band pigeonhole guarantee: banded pairs at maxHamming=7 EQUAL the brute-force pair set") {
    // a corpus dense in near-duplicates: 30 variants of one base doc,
    // each with a few tokens swapped, plus unrelated noise docs —
    // signature Hamming distances spread across 0..~30
    val base = (1 to 50).map(i => s"w$i")
    val d = docs(
      (1L to 30L).map(i =>
        i -> base.zipWithIndex.map { case (t, j) =>
          if (j % 30 < i - 1) s"v${i}_$j" else t
        }.mkString(" ")) ++
        (31L to 40L).map(i => i -> (1 to 50).map(j => s"n${i}_$j").mkString(" ")): _*)
    val sigs = SimHash64.signatures(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 7
    } yield (a, b)).toSet
    assert(expected.nonEmpty, "fixture must produce some pairs within distance 7")
    val banded = SimHash64.nearDupPairs(d, "doc_id", "text", maxHamming = 7, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == expected,
      s"missed=${expected -- banded} extra=${banded -- expected}")
  }

  test("recall envelope: ceiling math, corpus-driven band choice, warning trigger") {
    // 8-bit bands at cap 64: ceiling = 64·2^8 = 16 384 docs
    assert(SimHash64.envelopeCeiling(bands = 8, bucketCap = 64) == 16384L)
    // 16-bit bands: 64·2^16 ≈ 4.2 M
    assert(SimHash64.envelopeCeiling(bands = 4, bucketCap = 64) == 64L * 65536)
    // corpus-driven choice: highest guaranteed distance whose envelope covers n
    assert(SimHash64.bandsForCorpus(256L) == 32)      // tiny corpus: even 2-bit bands hold (64·2²=256)
    assert(SimHash64.bandsForCorpus(500L) == 16)      // 500 > 256: drop to 4-bit bands (64·2⁴=1024)
    assert(SimHash64.bandsForCorpus(16384L) == 8)     // exactly at the 8-bit ceiling
    assert(SimHash64.bandsForCorpus(50000L) == 4)     // sf1-scale: 16-bit bands, guarantee ≤ 3
    assert(SimHash64.bandsForCorpus(10000000L) == 2)  // 10 M: 32-bit bands
    // warning fires only past the ceiling, and names the remedy
    assert(SimHash64.envelopeWarning(16384L, bands = 8, bucketCap = 64).isEmpty)
    val w = SimHash64.envelopeWarning(50000L, bands = 8, bucketCap = 64)
    assert(w.isDefined && w.get.contains("bands=4"), s"warning must suggest the in-envelope band count: $w")
  }

  test("parameter combinations that would silently under-recall are rejected") {
    val d = docs(1L -> "a b c")
    val ex = intercept[IllegalArgumentException] {
      SimHash64.nearDupPairs(d, "doc_id", "text", maxHamming = 12, bands = 4)
    }
    assert(ex.getMessage.contains("maxHamming"))
    intercept[IllegalArgumentException] {
      SimHash64.nearDupPairs(d, "doc_id", "text", maxHamming = 2, bands = 5)
    }
  }

  test("nearDupPairs finds exact and near duplicates via band join, not all-pairs") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val d = docs(
      1L -> base,
      2L -> base,                                           // exact dup: dist 0
      3L -> base.replace("w30", "edited"),                  // near dup
      4L -> (1 to 60).map(i => s"z$i").mkString(" "))       // unrelated
    val pairs = SimHash64.nearDupPairs(d, "doc_id", "text", maxHamming = 6, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs.exists { case (a, b, dist) => a == 1L && b == 2L && dist == 0 })
    assert(pairs.exists { case (a, b, _) => a == 1L && b == 3L } ||
      pairs.exists { case (a, b, _) => a == 2L && b == 3L })
    assert(!pairs.exists { case (a, b, _) => b == 4L || a == 4L })
  }
}
