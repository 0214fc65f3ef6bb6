package graft.sim

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Gates [[SimilarityQueries.xmTopK]] — the promoted dominant point
  * (tables=4, planesBoost=2) of the cross-modal recall/cost frontier:
  *
  *  1. PATH EQUIVALENCE: forced broadcast, forced shuffle, and the
  *     auto dispatch produce the identical frame (q236's contract,
  *     inherited by the multi-table form).
  *  2. DOMINANCE, measured not narrated: recall@10 ≥ 0.94 against the
  *     exact scan AND strictly above the q236 default's recall, at a
  *     strictly SMALLER scanned candidate set — both axes of the
  *     frontier claim on the same fixture the sweep measured. The
  *     candidate generator and the exact ground truth are the SHARED
  *     production helpers ([[SimilarityQueries.xmCandidatePairs]] /
  *     [[SimilarityQueries.xmExactTop10]]), so the measurement can
  *     never drift from the shipped probe shape.
  */
class XmTopKSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.01"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/embeddings.parquet"))

  private def keyed(df: DataFrame): Seq[(Long, Long, Long)] =
    df.select(col("media_id").cast("long"), col("rk"), col("vec_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  /** Per-media retrieved set. */
  private def sets(rows: Seq[(Long, Long, Long)]): Map[Long, Set[Long]] =
    rows.groupBy(_._1).map { case (m, rs) => m -> rs.map(_._3).toSet }

  private def recall(approx: Map[Long, Set[Long]], exact: Map[Long, Set[Long]]): Double = {
    val per = exact.toSeq.map { case (m, ex) =>
      approx.getOrElse(m, Set.empty).intersect(ex).size.toDouble / ex.size }
    per.sum / per.size
  }

  test("forced broadcast, forced shuffle, and auto dispatch are byte-identical") {
    assume(fixture)
    val b = keyed(SimilarityQueries.xmTopK(spark, dir, forcePath = Some("broadcast")))
    val sh = keyed(SimilarityQueries.xmTopK(spark, dir, forcePath = Some("shuffle")))
    val auto = keyed(SimilarityQueries.xmTopK(spark, dir))
    assert(b == sh, "broadcast and shuffle paths must agree row-for-row")
    assert(auto == b, "auto dispatch must resolve to the same frame")
  }

  test("the promoted point dominates the default on both frontier axes") {
    assume(fixture)
    val exact = sets(keyed(SimilarityQueries.xmExactTop10(spark, dir)))
    val promoted = recall(sets(keyed(SimilarityQueries.xmTopK(spark, dir))), exact)
    val default = recall(sets(keyed(SimilarityQueries.q236Plan(spark, dir))), exact)
    // derive the operating point exactly as xmTopK/q236Plan do
    // (xmPlanes + boost, xmTables) instead of hardcoding 6/4 — if the
    // fixture size ever moves the adaptive counts, the candidate
    // measurement moves with the frames it certifies (r19 ADVICE)
    val corpus = graft.core.Tables.embeddings(spark, dir).count()
    val basePlanes = SimilarityQueries.xmPlanes(corpus)
    val boosted = math.min(12, basePlanes + 2)
    val candPromoted = SimilarityQueries.xmCandidatePairs(
      spark, dir, boosted, SimilarityQueries.xmTables(boosted)).count()
    val candDefault = SimilarityQueries.xmCandidatePairs(spark, dir, basePlanes, 1).count()
    info(f"recall@10: promoted=$promoted%.3f default=$default%.3f; " +
      f"candidates: promoted=$candPromoted default=$candDefault")
    assert(promoted >= 0.94, f"promoted recall $promoted%.3f under the 0.94 floor")
    assert(promoted > default, "promotion must raise recall over the q236 default")
    assert(candPromoted < candDefault,
      s"promotion must also SHRINK the scanned candidate set: $candPromoted vs $candDefault")
  }
}
