package graft.sim

import graft.SparkTestBase
import graft.multimodal.Multimodal

/** Certifies q236 cross-modal retrieval against the brute-force
  * cross-modal baseline (the AnnRecallSpec discipline): the ground
  * truth is an independent JVM replay — decode-fleet features via
  * FakeDecoder on the collected payloads, the 64→8 text-side fold,
  * exhaustive cosine top-10 — and the measurements pin recall@10 of
  * the bucketed index, the pruning it buys, and score fidelity. All
  * deterministic (md5-stream hyperplanes, synthetic payloads), so the
  * measured values are pinned exactly. */
class CrossModalRecallSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.01"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/embeddings.parquet"))

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  test("q236 recall@10 vs brute force, pruning, and score fidelity") {
    assume(fixture)
    // text side: fold 64 -> 8 exactly like the engine (left-to-right)
    val docs = graft.core.Tables.embeddings(spark, dir).collect().map { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble)
      val dv = Array.tabulate(8)(d => (0 until 8).map(j => v(d + 8 * j)).sum)
      r.getAs[Long]("vec_id") -> dv
    }.filter { case (_, dv) => math.sqrt(dv.map(x => x * x).sum) > 0 }
    // media side: the decode fleet's features on the query carve
    val queries = Multimodal.syntheticMedia(
        graft.core.Tables.documents(spark, dir)
          .filter(org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.lit(97)) === 0))
      .collect().map { r =>
        val (_, _, _, feat) = Multimodal.FakeDecoder.decode(r.getAs[Array[Byte]]("media"))
        r.getLong(0) -> feat
      }
    assert(queries.length >= 5, s"query carve too small: ${queries.length}")

    // brute-force cross-modal baseline: exhaustive top-10 per query
    val truth: Map[Long, Seq[Long]] = queries.map { case (mid, qv) =>
      mid -> docs.map { case (vid, dv) => (vid, cosine(dv, qv)) }
        .sortBy { case (vid, c) => (-c, vid) }.take(10).map(_._1).toSeq
    }.toMap

    val got = graft.SparkEntry.queries("q236_crossmodal_topk")(spark, dir)
      .collect().map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("rk"), r.getAs[Double]("cos_q4")))
    val byQuery = got.groupBy(_._1)
    assert(byQuery.keySet == truth.keySet, "every query medium must retrieve")
    byQuery.foreach { case (mid, rows) =>
      assert(rows.length == 10 && rows.map(_._3).sorted.toSeq == (1L to 10L),
        s"query $mid must return a full ranked top-10")
    }

    // score fidelity: every retrieved pair's cos matches the JVM replay
    val qvOf = queries.toMap
    val dvOf = docs.toMap
    got.foreach { case (mid, vid, _, cq4) =>
      val expect = math.rint(cosine(dvOf(vid), qvOf(mid)) * 10000) / 10000
      assert(math.abs(cq4 - expect) < 1e-9, s"($mid,$vid): $cq4 != $expect")
    }

    // recall@10 of the bucketed index vs exhaustive search — measured
    // 50/60 = 0.833 on this fixture (4 planes, Hamming-1 probes, 16
    // buckets over 500 docs) while scanning 35% of the corpus;
    // deterministic, so pinned at the measured floor. The levers (more
    // probes, q74's multi-table union) are documented on the query.
    val hits = truth.map { case (mid, top) =>
      byQuery(mid).map(_._2).toSet.intersect(top.toSet).size
    }.sum
    val recall = hits.toDouble / (truth.size * 10)
    info(f"cross-modal recall@10 = $recall%.3f ($hits/${truth.size * 10})")
    assert(recall >= 0.83, f"recall regressed below the stamped floor: $recall%.3f")

    // the index must genuinely prune: the top-10 window ran over a
    // strict subset of the corpus (5 of 16 buckets per query)
    val candTotal = queries.map { case (mid, qv) =>
      // replay the bucket assignment with the engine's plane signs
      def bucket(v: Array[Double]): Int =
        (0 until 4).map { p =>
          val dot = (0 until 8).map(d => v(d) * SimilarityQueries.planeSign(90 + p, d)).sum
          if (dot > 0) 1 << p else 0
        }.sum
      val probes = Set(bucket(qv)) ++ (0 until 4).map(p => bucket(qv) ^ (1 << p))
      docs.count { case (_, dv) => probes.contains(bucket(dv)) }
    }.sum
    val frac = candTotal.toDouble / (queries.length * docs.length)
    info(f"candidate fraction = $frac%.3f") // measured 0.352
    assert(frac < 0.4, f"index pruning regressed: $frac%.3f")
  }

  test("adaptive plane policy: every oracle-checked SF resolves to the pinned 4 planes") {
    // the DuckDB twin and this spec's replay hard-code 4 planes; the
    // policy must return 4 at every fixture size the oracle runs
    // (sf0.001/0.01/0.1 = 50/500/5000, 10x replica 20k, skew 22k) and
    // grow cells-constant beyond (100x replica 200k -> 7 planes;
    // capped at 12)
    for (n <- Seq(50L, 500L, 5000L, 20000L, 22000L))
      assert(SimilarityQueries.xmPlanes(n) == 4, s"n=$n")
    assert(SimilarityQueries.xmPlanes(200000L) == 7)
    assert(SimilarityQueries.xmPlanes(2000000L) == 10)
    assert(SimilarityQueries.xmPlanes(Long.MaxValue / 2) == 12)
  }
}
