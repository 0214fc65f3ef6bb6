package graft.sim

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q90's semantic dedup semantics: near-identical vectors land in one
  * cell and all but the lowest id are pruned; a degenerate mega-cell
  * is bounded by the cell cap (keep-lowest truncation, same guard
  * family as q45/q46). */
class SemDedupSpec extends SparkTestBase {

  private def writeEmb(d: String, rows: Seq[(Long, Seq[Float], Int)]): Unit = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
  }

  private def survivors(d: String): Set[Long] =
    SimilarityQueries.queries("q90_semdedup")(spark, d)
      .collect().map(_.getLong(0)).toSet

  test("near-copies of a vector are pruned down to the lowest id") {
    val d = java.nio.file.Files.createTempDirectory("graft-semdedup").toString
    try {
      def vec(seed: Int) = (0 until 64).map(i => math.sin(i * 0.37 + seed * 2.1).toFloat)
      val base = vec(0)
      def nudge(eps: Float) = base.zipWithIndex.map { case (x, i) => if (i % 7 == 0) x + eps else x }
      // 0..15: diverse seed vectors (0 is `base`); 16..18: near-copies of 0
      writeEmb(d, (0L to 15L).map(i => (i, if (i == 0) base else vec(i.toInt), 0)) ++
        Seq((16L, nudge(0.01f), 0), (17L, nudge(0.02f), 0), (18L, nudge(-0.01f), 0)))
      val s = survivors(d)
      assert(s.contains(0L), "the lowest id of the near-dup group must survive")
      assert(!s.contains(16L) && !s.contains(17L) && !s.contains(18L),
        s"near-copies (cos ≈ 1) must be pruned: $s")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
  }

  test("degenerate mega-cell is bounded by the cell cap") {
    val d = java.nio.file.Files.createTempDirectory("graft-semdedup-cap").toString
    try {
      val cap = 256 // SemDedupCellCap
      val u = (0 until 64).map(i => math.cos(i * 0.51).toFloat)
      // 300 identical vectors: one cell, capped at 256 — pairs exist only
      // among the cap lowest, so survivors = 1 canonical + the 44 ids the
      // truncation left unexamined (a later pass / exact dedup's job)
      writeEmb(d, (0L until 300L).map(i => (i, u, 0)))
      val s = survivors(d)
      assert(s.size == 1 + (300 - cap), s"expected ${1 + (300 - cap)} survivors, got ${s.size}")
      assert(s.min == 0L, "canonical lowest id must survive")
      assert(s.filter(_ > 0).forall(_ >= cap.toLong), s"ids 1..${cap - 1} must be pruned")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
  }
}
