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
  * shuffle key). Buckets above [[MaxBandBucket]] are therefore excluded
  * from pair generation — those clusters are exactly the ones exact
  * dedup (q40's hash-groupBy) already collapses, so dropping them loses
  * no information the pipeline needs.
  *
  * Applied identically in the md5-portable path
  * ([[DedupQueries.lshPairsFrom]], mirrored in its DuckDB twin) and the
  * xxhash64 production paths ([[SimHash64.nearDupPairs]],
  * [[MinHash64.candidatePairs]]); pinned by BandCapSpec for all three.
  */
object Banding {

  /** Far above any bucket size the synthetic corpus produces, so the
    * oracle-checked outputs are unchanged — both engines apply the
    * same cap. */
  val MaxBandBucket = 64

  /** Drop rows of `bands` whose (band_no, `keyCol`) bucket exceeds
    * `cap`. One window count over the band key — the same shuffle the
    * pair join needs anyway, so the guard adds no extra exchange shape
    * at scale.
    *
    * Cap sizing is a function of the band-key SPACE: buckets fill both
    * with true duplicate clusters (what the cap is for) and with
    * chance collisions at a rate of ~n/|key space|. md5/minhash band
    * keys live in 2¹²⁸ — chance collisions never matter. Fixed-width
    * w-bit bands (SimHash) have only 2^w values, so once
    * n ≳ cap · 2^w the AVERAGE bucket breaches the cap and capping
    * starts deleting ordinary docs, not spam — callers in that regime
    * must raise `cap` (candidate cost grows ~cap·n) or widen the
    * bands; see [[SimHash64.nearDupPairs]] for the envelope math. */
  def capBuckets(bands: DataFrame, keyCol: String,
                 cap: Int = MaxBandBucket): DataFrame =
    bands
      .withColumn("__bsz",
        count(lit(1)).over(Window.partitionBy(col("band_no"), col(keyCol))))
      .filter(col("__bsz") <= cap)
      .drop("__bsz")
}
