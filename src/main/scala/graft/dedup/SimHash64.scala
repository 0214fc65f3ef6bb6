package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Production 64-bit SimHash path (the fast twin of q43's md5-portable
  * SimHash-32).
  *
  * Hashing is `xxhash64` — Spark-native, codegen'd, one hash per token
  * occurrence — which is ~an order of magnitude cheaper than md5 but
  * NOT cross-engine portable (DuckDB has no xxhash64), so this path is
  * validated by unit/property tests and a rows-only catalog entry
  * (q47) instead of the DuckDB oracle; `DedupQueries.q43` is the
  * oracle-checkable algorithm twin.
  *
  * Scale shape (same as the reference-free dedup family): signature =
  * one explode + one codegen hash-aggregate (linear, partial+final);
  * candidate pairs via 4×16-bit band equi-join — never an all-pairs
  * product; verification = `bit_count(a XOR b)` on the banded
  * candidates only.
  */
object SimHash64 {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Corpus ceiling of the banded recall contract: with `bands` bands
    * of w = 64/bands bits, chance collisions fill the 2^w buckets at
    * ~n/2^w docs each, so once n exceeds bucketCap·2^w the skew cap
    * starts truncating ORDINARY buckets and recall silently degrades.
    * (8-bit bands at cap 64 → 16 384 docs; 16-bit → ~4.2 M.) */
  def envelopeCeiling(bands: Int, bucketCap: Int): Long =
    bucketCap.toLong << (64 / bands)

  /** The largest band count (= highest guaranteed maxHamming of
    * bands−1) whose [[envelopeCeiling]] still covers a corpus of `n`
    * docs. Larger corpora force WIDER bands (fewer chance collisions
    * per bucket) and therefore a lower guaranteed distance — the
    * pigeonhole trade the fixed 64-bit signature imposes. */
  def bandsForCorpus(n: Long, bucketCap: Int = Banding.MaxBandBucket): Int =
    Seq(32, 16, 8, 4, 2).find(b => envelopeCeiling(b, bucketCap) >= n).getOrElse(2)

  /** The envelope violation message for a corpus of `n` docs, or None
    * while inside the contract. Pure — unit-testable without log
    * capture; [[nearDupPairs]] emits it. */
  def envelopeWarning(n: Long, bands: Int, bucketCap: Int): Option[String] = {
    val ceiling = envelopeCeiling(bands, bucketCap)
    if (n <= ceiling) None
    else Some(
      s"SimHash64.nearDupPairs: corpus of $n docs exceeds the recall envelope of " +
        s"$bands×${64 / bands}-bit bands at bucketCap=$bucketCap (ceiling $ceiling): " +
        s"chance collisions now fill average buckets past the cap, so band truncation " +
        s"hides ordinary docs and the maxHamming≤${bands - 1} recall guarantee no " +
        s"longer holds. Raise bucketCap (candidate volume grows ~bucketCap·n) or " +
        s"use bands=${bandsForCorpus(n, bucketCap)} (guaranteed maxHamming " +
        s"${bandsForCorpus(n, bucketCap) - 1}) for this corpus size.")
  }

  /** Per-document 64-bit SimHash over `\s+` tokens of `textCol`.
    * Zero-token documents get signature 0 (no votes → all bits 0). */
  def signatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val votes = docs
      .select(col(idCol),
        explode(expr(s"filter(split($textCol, '\\\\s+'), t -> t != '')")).as("t"))
      .select(col(idCol), xxhash64(col("t")).as("h"))
    val bitSums = (0 until 64).map { j =>
      sum(when(expr(s"((h >> $j) & 1L) = 1L"), 1).otherwise(-1)).as(s"b_$j")
    }
    val assembled = (0 until 64).map(j =>
      when(col(s"b_$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ bitwiseOR _)
    val hashed = votes.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol), assembled.as("simhash64"))
    docs.select(col(idCol))
      .join(hashed, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("simhash64"), lit(0L)).as("simhash64"))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** BANDED near-dup pairs with Hamming distance ≤ `maxHamming`:
    * the 64-bit signature is cut into `bands` equal bands, any shared
    * band makes a candidate, then the exact bit_count filter. By
    * pigeonhole every pair with distance ≤ bands − 1 is GUARANTEED a
    * candidate (fewer differing bits than bands ⇒ some band is
    * untouched); pairs between `bands` and `maxHamming` are found only
    * when a band happens to match (the standard banded S-curve), so
    * the full-recall contract is `maxHamming ≤ bands − 1` — enforced
    * here rather than documented away: callers wanting a higher
    * guaranteed threshold raise the band count (8 bands of 8 bits ⇒
    * complete through distance 7, SimHash64Spec pins it against a
    * brute-force oracle).
    *
    * OPERATING ENVELOPE — the contract has a corpus ceiling. A w-bit
    * band (w = 64/bands) has only 2^w values, so buckets fill with
    * CHANCE collisions at ~n/2^w docs per bucket on top of true dup
    * clusters. The [[Banding]] skew cap (`bucketCap`, the guard that
    * keeps a template-spam cluster from fanning out n²/2 pairs on one
    * hot key) therefore starts swallowing ordinary buckets once
    * n ≳ bucketCap · 2^w — ~16K docs for 8-bit bands, ~4M for 16-bit
    * at the default cap of 64 — and recall silently degrades. Pick
    * parameters by BOTH threshold and corpus: for n beyond the
    * envelope either raise `bucketCap` (candidate volume grows as
    * ~bucketCap·n — the price pigeonhole charges for a guaranteed
    * high threshold; at w bits it is Θ(n²/2^w) uncapped) or widen the
    * bands and accept a lower guaranteed distance. The md5/minhash
    * band path (q42) has no such ceiling: its band keys are 128-bit
    * digests, where buckets only form from genuinely equal
    * signatures. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int, bands: Int = 4,
                   bucketCap: Int = Banding.MaxBandBucket): DataFrame = {
    require(bands >= 2 && 64 % bands == 0,
      s"bands must divide 64 (got $bands)")
    require(maxHamming <= bands - 1,
      s"maxHamming=$maxHamming exceeds the banded recall guarantee of bands-1=${bands - 1}; " +
        "raise `bands` instead of silently under-recalling")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    // Envelope check: one count over the id column (cheap next to the
    // signature scan). A violated envelope is NOT an error — callers
    // may accept partial recall — but it must never be silent: the
    // rows-only catalog entry (q47) has no oracle to expose it.
    envelopeWarning(docs.select(col(idCol)).count(), bands, bucketCap).foreach { msg =>
      log.warn(msg); System.err.println(s"[graft] WARN $msg")
    }
    val sigs = signatures(docs, idCol, textCol)
    val banded = Banding.capBuckets(
      sigs.select(col(idCol).as("id"), col("simhash64"),
        posexplode(array((0 until bands).map(b =>
          shiftright(col("simhash64"), width * b).bitwiseAND(lit(mask))): _*))
          .as(Seq("band_no", "band_val"))), "band_val", "id", bucketCap)
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band_no") === col("b.band_no") &&
        col("a.band_val") === col("b.band_val") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming(col("a.simhash64"), col("b.simhash64")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxHamming)
  }
}
