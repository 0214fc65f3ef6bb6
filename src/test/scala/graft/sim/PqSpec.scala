package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** q114's spherical product quantization: code completeness (every
  * vector compresses to exactly PqSub codes in [0, PqK)), ADC ranks
  * planted same-prototype vectors at the top with the exact full-match
  * score, and recall@10 against the brute-force oracle on real data
  * stays above the measured floor. */
class PqSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/embeddings.parquet"))

  test("every vector compresses to exactly PqSub codes, each within the codebook") {
    assume(ready)
    graft.functions.GraftFunctions.register(spark)
    val books = SimilarityQueries.pqCodebooks(spark, dir)
    val codes = SimilarityQueries.pqCodes(spark, dir, books)
    assert(codes.columns.toSeq == Seq("vec_id", "m", "code"), "codes carry no payload")
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val perVec = codes.groupBy("vec_id").count().collect()
    assert(perVec.length == n)
    assert(perVec.forall(_.getLong(1) == SimilarityQueries.PqSub.toLong))
    val rng = codes.agg(min("code"), max("code")).collect().head
    assert(rng.getLong(0) >= 0L && rng.getLong(1) < SimilarityQueries.PqK.toLong)
  }

  test("ADC gives planted same-prototype vectors the exact full-match score") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // three dense 64-dim prototypes with distinct per-subspace patterns
    def proto(k: Int): Seq[Float] = (0 until 64).map { d =>
      k match {
        case 0 => 1f
        case 1 => if (d % 2 == 0) 1f else -1f
        case _ => if (d < 32) 1f else -1f
      }
    }
    val rows = (0 to 5).map(i => (i.toLong, proto(0), 0)) ++
      (6 to 10).map(i => (i.toLong, proto(1), 1)) ++
      (11 to 15).map(i => (i.toLong, proto(2), 2))
    val tmp = java.nio.file.Files.createTempDirectory("pq").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val books = SimilarityQueries.pqCodebooks(spark, tmp)
    val got = SimilarityQueries.pqAdcScores(spark, tmp, 0L, books)
      .filter($"n_sub" === SimilarityQueries.PqSub)
      .orderBy($"adc_q6".desc, $"vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // vec 0 is prototype 0; its five exact clones share its codes, so
    // their ADC scores are identical (≈ 1e6 — the µ-scale self dot of
    // a unit vector) and strictly above every cross-prototype vector
    assert(got.take(5).map(_._1).toSet == (1L to 5L).toSet, s"top-5: ${got.take(5).toSeq}")
    val cloneScore = got.head._2
    assert(math.abs(cloneScore - 1000000L) <= 1000L, s"µ-scale self dot: $cloneScore")
    assert(got.take(5).forall(_._2 == cloneScore), s"clones identical: ${got.take(5).toSeq}")
    assert(got.drop(5).forall(_._2 < cloneScore), s"separation: ${got.toSeq}")
  }

  test("PQ-ADC recall@10 vs brute force stays above the measured floor") {
    assume(ready)
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0d; var na = 0d; var nb = 0d; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val books = SimilarityQueries.pqCodebooks(spark, dir)
    val queries = Seq(0L, 7L, 23L, 101L, 211L)
    val recalls = queries.map { qid =>
      val truth = vecs.filter(_._1 != qid)
        .map { case (id, v) => id -> cos(vecs(qid), v) }
        .toSeq.sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
      // the q114 two-stage: ADC shortlist from codes, exact re-rank
      val shortlist = SimilarityQueries.pqAdcScores(spark, dir, qid, books)
        .filter($"n_sub" === SimilarityQueries.PqSub)
        .orderBy($"adc_q6".desc, $"vec_id")
        .limit(SimilarityQueries.PqShortlist)
        .collect().map(_.getLong(0))
      val approx = shortlist
        .map(id => id -> cos(vecs(qid), vecs(id)))
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
      truth.intersect(approx).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    info(f"PQ shortlist+re-rank recall@10 over ${queries.size} queries: $mean%.2f (${recalls.mkString(", ")})")
    assert(mean >= 0.7, f"recall floor: measured $mean%.2f")
  }
}
