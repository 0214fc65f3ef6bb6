package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Production MinHash path (the fast twin of q41/q42's md5-portable
  * pipeline), mirroring [[SimHash64]]'s split between oracle-checkable
  * and production hashing.
  *
  * Per-seed hashes are `xxhash64(seed, shingle)` — Spark-native,
  * codegen'd — which is far cheaper than md5 at 100 TB but has no
  * DuckDB twin, so this path is evidence-backed by MinHash64Spec
  * (determinism, signature-agreement ∝ Jaccard, guaranteed band
  * recall for exact duplicates) rather than the oracle.
  *
  * Shape: shingles are EXPLODED once and all k mins aggregate in a
  * single partial+final hash-aggregate pass — not k interpreted
  * `transform` lambdas over an array column. One linear scan, one
  * narrow aggregate; banding pairs via equi-join exactly like q42.
  */
object MinHash64 {

  /** Word 3-gram shingles (docs with <3 tokens degrade to the whole
    * text as a single shingle, so every doc has a signature).
    * `toks` is materialized as a column FIRST: inlining the
    * filter(split(...)) expression into the transform lambda makes
    * every `toks[i]` access re-split the text — O(tokens²) splits per
    * document (measured 5× slower at sf0.1). */
  private def shingleRows(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col(idCol), col(textCol).as("__text"),
        expr(s"ws_tokens($textCol)").as("toks"))
      .select(col(idCol),
        explode(expr(
          "CASE WHEN size(toks) >= 3 THEN word_ngrams(toks, 3) " +
            "ELSE array(__text) END")).as("shingle"))
    }

  /** k-column MinHash signature: sig_j = min over shingles of
    * xxhash64(j, shingle). */
  def signatures(docs: DataFrame, idCol: String, textCol: String, k: Int = 8): DataFrame = {
    val mins = (0 until k).map(j => min(xxhash64(lit(j), col("shingle"))).as(s"sig_$j"))
    shingleRows(docs, idCol, textCol)
      .groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
  }

  /** LSH band candidate pairs over [[signatures]]: k/rowsPerBand bands;
    * docs sharing any band become a candidate. Identical docs have
    * identical signatures, so every exact-duplicate pair is guaranteed
    * a candidate (up to the [[Banding]] skew cap — mega-clusters of
    * identical docs are excluded because exact dedup already collapses
    * them and their n²/2 fan-out on one band key is the 100 TB
    * scale-killer); near-dups are caught with the standard S-curve
    * probability. Equi-join on (band_no, band_key) — never all-pairs. */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    require(k % rowsPerBand == 0, "k must be a multiple of rowsPerBand")
    val sigs = signatures(docs, idCol, textCol, k)
    val bands = Banding.capBuckets(
      sigs.select(col(idCol).as("id"),
        posexplode(array((0 until k / rowsPerBand).map { b =>
          xxhash64((0 until rowsPerBand).map(r => col(s"sig_${b * rowsPerBand + r}")): _*)
        }: _*)).as(Seq("band_no", "band_key"))), "band_key", "id")
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b, col("a.band_no") === col("b.band_no") &&
        col("a.band_key") === col("b.band_key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }
}
