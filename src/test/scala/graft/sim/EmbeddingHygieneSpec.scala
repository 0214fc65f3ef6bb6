package graft.sim

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q186 hygiene audit: the driver corpus is clean (no NaN, no zero
  * vectors, one dimension), so this spec plants every pathology the
  * gate exists to catch — a zero vector, a NaN-poisoned vector, a
  * mixed-dimension batch — and pins that NaN vectors are EXCLUDED
  * from the norm stats instead of riding engine-specific NaN
  * ordering. */
class EmbeddingHygieneSpec extends SparkTestBase {

  private def emb(rows: Seq[(Long, Seq[Float], Int)]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  test("q186: planted zero / NaN / mixed-dim pathologies are counted exactly") {
    val rows = Seq(
      // label 1: clean pair, norms 1.0 and 4.0
      (1L, Seq(1.0f, 0.0f), 1),
      (2L, Seq(0.0f, 2.0f), 1),
      // label 2: a zero vector and a NaN vector next to a clean one
      (3L, Seq(0.0f, 0.0f), 2),
      (4L, Seq(Float.NaN, 1.0f), 2),
      (5L, Seq(3.0f, 0.0f), 2),
      // label 3: mixed dimensions (2 and 3)
      (6L, Seq(1.0f, 1.0f), 3),
      (7L, Seq(1.0f, 1.0f, 1.0f), 3))
    val out = SimilarityQueries.embeddingHygieneOf(emb(rows)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(out(1L) == ((2L, 2L, 2L, 0L, 0L, 1000L, 4000L)), out(1L))
    // label 2: norms stats come from the zero and the 9.0 vec only —
    // the NaN vector is excluded, not sorted
    assert(out(2L) == ((3L, 2L, 2L, 1L, 1L, 0L, 9000L)), out(2L))
    assert(out(3L)._2 == 2L && out(3L)._3 == 3L, "mixed dims must surface")
  }

  test("q186: an all-NaN label yields null-free counts and no norm stats") {
    val rows = Seq((1L, Seq(Float.NaN), 9), (2L, Seq(Float.NaN, Float.NaN), 9))
    val r = SimilarityQueries.embeddingHygieneOf(emb(rows)).collect()(0)
    assert(r.getLong(1) == 2L && r.getLong(4) == 0L && r.getLong(5) == 2L)
    assert(r.isNullAt(6) && r.isNullAt(7), "norm stats must be NULL when every vector is poisoned")
  }

  test("q186 catalog plan: map-side vector arithmetic, one label exchange, no payload shuffle") {
    val dir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/embeddings.parquet")))
    val p = graft.SparkEntry.queries("q186_embedding_hygiene")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    // the aggregate's exchange carries per-vector scalars, not arrays:
    // no exchange/aggregate line may mention the vector column
    p.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .foreach(l => assert(!l.contains("embedding#") && !l.contains("v#"), l))
  }
}
