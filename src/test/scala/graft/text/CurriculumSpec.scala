package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins q203's phase assignment against a JVM replay of the global
  * (score desc, doc_id) prefix sum and threshold cuts — the sharded
  * PrefixSum decomposition must agree with the naive single-sequence
  * cumsum exactly — plus the contracts a hash can't name: phases tile
  * the corpus, boundaries respect the exact 20/50 token thresholds,
  * and quality is monotone non-increasing across phases. */
class CurriculumSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/documents.parquet"))

  test("q203 phases equal the naive cumsum replay; tile, thresholds, monotone") {
    assume(fixture)
    import graft.core.Tables
    // the engine's own per-doc scores (same expressions the query uses)
    val scored = Tables.documents(spark, dir)
      .selectExpr("doc_id", "source",
        "filter(split(text, '\\\\s+'), t -> t != '') AS toks")
      .filter(size(col("toks")) >= 1)
      .selectExpr("doc_id", "source", "CAST(size(toks) AS BIGINT) AS n_toks",
        TextQueries.scoreExpr + " AS score")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val total = scored.map(_._3).sum
    val t1 = total * 20 / 100; val t2 = total * 50 / 100
    var cum = 0L
    val expected = scored.sortBy { case (id, _, _, sc) => (-sc, id) }
      .map { case (_, src, nt, sc) =>
        cum += nt
        val ph = if (cum <= t1) 1L else if (cum <= t2) 2L else 3L
        (ph, src, nt, sc)
      }
      .groupBy(x => (x._1, x._2)).view
      .mapValues(g => (g.length.toLong, g.map(_._3).sum, g.map(_._4).min, g.map(_._4).max))
      .toMap
    val got = TextQueries.queries("q203_curriculum_phases")(spark, dir)
      .collect().map(r => ((r.getAs[Long]("phase"), r.getAs[String]("source")),
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("min_score"), r.getAs[Long]("max_score")))).toMap
    assert(got == expected, s"phase replay mismatch:\n got=$got\n exp=$expected")
    // all three phases live; tiling
    val phases = got.keys.map(_._1).toSet
    assert(phases == Set(1L, 2L, 3L), s"phases present: $phases")
    assert(got.values.map(_._2).sum == total, "phase token masses must tile the corpus")
    // quality monotone non-increasing across phase boundaries (equal
    // scores may straddle — ordering breaks ties by doc_id)
    def minS(p: Long) = got.collect { case ((`p`, _), v) => v._3 }.min
    def maxS(p: Long) = got.collect { case ((`p`, _), v) => v._4 }.max
    assert(minS(1L) >= maxS(2L), s"phase1 min ${minS(1L)} < phase2 max ${maxS(2L)}")
    assert(minS(2L) >= maxS(3L), s"phase2 min ${minS(2L)} < phase3 max ${maxS(3L)}")
  }
}
