package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared LSH band-bucket skew guard.
  *
  * A band bucket of n docs fans out to n²/2 candidate pairs in the band
  * self-join. Mega-buckets come from exact-duplicate / template-spam
  * clusters; at 100 TB one hot (band_no, band_key) key would stall the
  * whole join (a 10⁶-doc boilerplate cluster → 5·10¹¹ pairs on ONE
  * shuffle key). Buckets are therefore TRUNCATED to their
  * [[MaxBandBucket]] lowest ids before pair generation — bounded
  * C(cap,2) fan-out per bucket instead of n²/2, and (unlike dropping
  * the whole bucket, the previous semantics) a cluster that creeps one
  * doc over the cap degrades gracefully: pairs among its cap lowest
  * ids survive rather than the entire cluster going invisible. The
  * docs a truncation does hide are near-dups of the KEPT members, so
  * the canonical-representative chain (q46's keep-lowest, q75's
  * min-label clusters) still collapses them transitively in later
  * passes; and the clusters big enough to truncate at all are exactly
  * the template/exact-dup spam that q40's hash-groupBy already
  * collapses wholesale.
  *
  * This is the same guard shape as q45's per-label block cap
  * (row_number ≤ cap) — one truncation semantics for every skew guard
  * in the library. Applied identically in the md5-portable path
  * ([[DedupQueries.lshPairsFrom]], mirrored in its DuckDB twin via
  * QUALIFY row_number) and the xxhash64 production paths
  * ([[SimHash64.nearDupPairs]], [[MinHash64.candidatePairs]]); pinned
  * by BandCapSpec for all three, and the cap CONTRACT — monotone pair
  * growth with the cap, per-cap lowest-id recall floor, cap not
  * binding at verification SF — is swept across 16/64/256 by
  * CapContractSpec, so a [[MaxBandBucket]] change cannot silently
  * shift the cap-consuming oracles (q42/q46/q94/q98/q124).
  */
object Banding {

  /** Far above any bucket size the synthetic corpus produces, so the
    * oracle-checked outputs are unchanged — both engines apply the
    * same cap. */
  val MaxBandBucket = 64

  /** Truncate each (band_no, `keyCol`) bucket of `bands` to its `cap`
    * rows with the lowest `ordCol` (deterministic: `ordCol` is the
    * unique doc id). One window over the band key — the same shuffle
    * the pair join needs anyway, so the guard adds no extra exchange
    * at scale; the ORDER BY adds a sort within each (small) bucket
    * partition.
    *
    * Cap sizing is a function of the band-key SPACE: buckets fill both
    * with true duplicate clusters (what the cap is for) and with
    * chance collisions at a rate of ~n/|key space|. md5/minhash band
    * keys live in 2¹²⁸ — chance collisions never matter. Fixed-width
    * w-bit bands (SimHash) have only 2^w values, so once
    * n ≳ cap · 2^w the AVERAGE bucket breaches the cap and truncation
    * starts hiding ordinary docs, not spam — callers in that regime
    * must raise `cap` (candidate cost grows ~cap·n) or widen the
    * bands; see [[SimHash64.nearDupPairs]] for the envelope math. */
  def capBuckets(bands: DataFrame, keyCol: String, ordCol: String,
                 cap: Int = MaxBandBucket): DataFrame =
    bands
      .withColumn("__brank",
        row_number().over(
          Window.partitionBy(col("band_no"), col(keyCol)).orderBy(col(ordCol))))
      .filter(col("__brank") <= cap)
      .drop("__brank")
}
