package graft.sim

import graft.SparkTestBase

/** q175's exact-integer distance pipeline, replayed driver-side with
  * BigInt (no 38-digit cap, no engine arithmetic shared), plus the
  * map-side group-limit plan contract that makes the top-3 window
  * safe under a flooded label. */
class EmbedOutlierSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/embeddings.parquet"))

  test("q175 equals the BigInt recomputation; queue ordered; scaling floors exact") {
    assume(ready)
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getSeq[Float](2).map(x => math.floor(x.toDouble * 1000000d + 0.5d).toLong)))
    val byLabel = vecs.groupBy(_._2)
    val expected = byLabel.toSeq.flatMap { case (label, vs) =>
      val n = vs.length.toLong
      val cent = vs.map(_._3).toSeq.transpose.map(_.sum)
      val d = vs.map { case (id, _, q) =>
        val dsq = q.zip(cent).map { case (x, c) =>
          val t = BigInt(n * x - c); t * t
        }.sum
        (id, dsq)
      }
      val sdsq = d.map(_._2).sum
      val meanU = (sdsq / n / (n * n) / 1000000).toLong
      d.sortBy { case (id, dsq) => (-dsq, id) }.take(3).zipWithIndex.map {
        case ((id, dsq), i) =>
          (label, n, meanU, (i + 1).toLong, id, (dsq / (n * n) / 1000000).toLong)
      }
    }.sortBy(r => (r._1, r._4))
    val got = SimilarityQueries.queries("q175_embed_outliers")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // queue contract: ranks strictly ordered by distance within label
    got.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._4)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._6 >= b._6, "queue must be farthest-first")
        case _ =>
      }
      // the queue head must genuinely exceed the label mean — the
      // review queue surfaces tail vectors, not noise around the mean
      assert(sorted.head._6 > sorted.head._3,
        s"label ${sorted.head._1}: farthest vector not beyond the mean")
    }
  }

  test("q175 flooded label: a 20k-member label must not wrap the mean (DIV-order overflow regression)") {
    // the skew fixture's dominant label produced Σdsq ∼ n³, and
    // `sdsq DIV n` as the FIRST division left a quotient beyond int64
    // — Spark's IntegralDivide wrapped it negative. Dividing by n²
    // first keeps every intermediate inside int64; this fixture
    // replays that exact failure shape in-process.
    import spark.implicits._
    val n = 20000
    val flood = (0 until n).map { i =>
      // spread around a fixed base so distances are genuinely nonzero
      (i.toLong, 7, Array.tabulate(64)(d => 0.3f + ((i + d) % 17) * 0.01f))
    }
    val small = (0 until 5).map { i =>
      (100000L + i, 8, Array.tabulate(64)(d => -0.2f + ((i * d) % 5) * 0.02f))
    }
    val emb = (flood ++ small).toDF("vec_id", "label", "embedding")
    val out = SimilarityQueries.q175Of(spark, emb).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(5)))
    assert(out.nonEmpty)
    out.foreach { case (label, mean, rank, dsq) =>
      assert(mean >= 0L, s"label $label mean wrapped negative: $mean")
      assert(dsq >= 0L, s"label $label dsq wrapped negative: $dsq")
      if (rank == 1L)
        assert(dsq >= mean, s"label $label queue head below the mean")
    }
    assert(out.count(_._1 == 7L) == 3 && out.count(_._1 == 8L) == 3)
  }

  test("q175 plan pre-truncates flooded labels map-side (WindowGroupLimit)") {
    assume(ready)
    val p = SimilarityQueries.queries("q175_embed_outliers")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
  }
}
