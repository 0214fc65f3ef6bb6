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

  /** BANDED near-dup pairs with Hamming distance ≤ `maxHamming` —
    * recall-bounded, not exhaustive: 4 bands of 16 bits each, any
    * shared band makes a candidate, then the exact bit_count filter.
    * By pigeonhole every pair with distance ≤ 3 (bands − 1) is
    * GUARANTEED a candidate; pairs at distance 4..maxHamming are found
    * only when some 16-bit band happens to match (the standard banded
    * S-curve). Callers needing full recall at a higher threshold must
    * raise the band count, not just `maxHamming`. Equi-join on
    * (band_no, band_val) with the [[Banding]] skew cap: the 100 TB
    * shape — a template-spam cluster of n identical signatures would
    * otherwise fan out n²/2 pairs on one hot band key. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int): DataFrame = {
    val sigs = signatures(docs, idCol, textCol)
    val bands = Banding.capBuckets(
      sigs.select(col(idCol).as("id"), col("simhash64"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("simhash64"), 16 * b).bitwiseAND(lit(0xffffL))): _*))
          .as(Seq("band_no", "band_val"))), "band_val")
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b, col("a.band_no") === col("b.band_no") &&
        col("a.band_val") === col("b.band_val") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming(col("a.simhash64"), col("b.simhash64")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxHamming)
  }
}
