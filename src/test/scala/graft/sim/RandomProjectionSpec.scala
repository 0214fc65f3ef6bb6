package graft.sim

import graft.SparkTestBase

/** q87's random projection, cross-checked against an independent
  * driver-side recomputation from the raw parquet: same md5-derived
  * sign matrix, same per-term BIGINT quantization, same exact integer
  * sums. Also pins the JL-ish geometry sanity the operator exists for:
  * sign-projection preserves relative closeness for near-identical
  * vectors. */
class RandomProjectionSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/embeddings.parquet"))

  // independent reimplementation (not shared code) of the sign rule
  private def sign(j: Int, d: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"rp|$j|$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
    if (Integer.parseInt(hex.substring(0, 1), 16) < 8) 1L else -1L
  }

  test("q87 output equals the driver-side brute-force projection") {
    assume(ready)
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .toMap
    val expected = raw.map { case (id, emb) =>
      id -> (0 until 16).map { j =>
        emb.indices.map { d =>
          math.floor(emb(d).toDouble * sign(j, d) * 100000d + 0.5d).toLong
        }.sum
      }.toVector
    }
    val got = SimilarityQueries.queries("q87_random_projection")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (1 to 16).map(r.getLong).toVector)
      .toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, p) =>
      assert(p == expected(id), s"vec $id: $p != ${expected(id)}")
    }
  }

  test("sign matrix is balanced enough to carry signal (not degenerate)") {
    val flat = for (j <- 0 until 16; d <- 0 until 64) yield sign(j, d)
    val plus = flat.count(_ == 1L)
    assert(plus > 400 && plus < 624, s"±1 balance off: $plus/1024 positive")
  }

  test("projection preserves closeness: a near-copy projects nearer than an unrelated vector") {
    // controlled fixture: v2 = v1 perturbed in 2 of 64 coords, v3
    // unrelated. Projection is linear, so p(v1)−p(v2) = p(v1−v2) — a
    // 2-sparse input difference can move at most 2 quantized units per
    // output coordinate per perturbed coord, while v1−v3 is dense.
    import org.apache.spark.sql.functions._
    val d = java.nio.file.Files.createTempDirectory("graft-rp-spec").toString
    try {
      import spark.implicits._
      def vec(f: Int => Float) = (0 until 64).map(f)
      val base = vec(i => math.sin(i * 0.7).toFloat)
      val near = base.updated(3, base(3) + 0.05f).updated(40, base(40) - 0.05f)
      val far = vec(i => math.cos(i * 1.3 + 2).toFloat)
      Seq((1L, base), (2L, near), (3L, far))
        .toDF("vec_id", "embedding")
        .withColumn("label", lit(0))
        .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
      val p = SimilarityQueries.queries("q87_random_projection")(spark, d)
        .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong).toVector).toMap
      def l2(a: Vector[Long], b: Vector[Long]) =
        math.sqrt(a.zip(b).map { case (x, y) => val dd = (x - y).toDouble; dd * dd }.sum)
      assert(l2(p(1L), p(2L)) < l2(p(1L), p(3L)),
        s"near-copy must project closer: ${l2(p(1L), p(2L))} vs ${l2(p(1L), p(3L))}")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
  }
}
