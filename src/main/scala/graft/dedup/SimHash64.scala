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
    * brute-force oracle). More bands cost a proportionally larger
    * band exchange and more chance collisions per band (8-bit bands
    * collide at ~1/256) — the usual recall/cost dial. Equi-join on
    * (band_no, band_val) with the [[Banding]] skew cap: the 100 TB
    * shape — a template-spam cluster of n identical signatures would
    * otherwise fan out n²/2 pairs on one hot band key. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int, bands: Int = 4): DataFrame = {
    require(bands >= 2 && 64 % bands == 0,
      s"bands must divide 64 (got $bands)")
    require(maxHamming <= bands - 1,
      s"maxHamming=$maxHamming exceeds the banded recall guarantee of bands-1=${bands - 1}; " +
        "raise `bands` instead of silently under-recalling")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val sigs = signatures(docs, idCol, textCol)
    val banded = Banding.capBuckets(
      sigs.select(col(idCol).as("id"), col("simhash64"),
        posexplode(array((0 until bands).map(b =>
          shiftright(col("simhash64"), width * b).bitwiseAND(lit(mask))): _*))
          .as(Seq("band_no", "band_val"))), "band_val")
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
