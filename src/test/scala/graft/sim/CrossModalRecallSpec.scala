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

  /** text side: fold 64 -> 8 exactly like the engine (left-to-right) */
  private lazy val docs = graft.core.Tables.embeddings(spark, dir).collect().map { r =>
    val v = r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble)
    val dv = Array.tabulate(8)(d => (0 until 8).map(j => v(d + 8 * j)).sum)
    r.getAs[Long]("vec_id") -> dv
  }.filter { case (_, dv) => math.sqrt(dv.map(x => x * x).sum) > 0 }

  /** media side: the decode fleet's features on the query carve */
  private lazy val queries = Multimodal.syntheticMedia(
      graft.core.Tables.documents(spark, dir)
        .filter(org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.lit(97)) === 0))
    .collect().map { r =>
      val (_, _, _, feat) = Multimodal.FakeDecoder.decode(r.getAs[Array[Byte]]("media"))
      r.getLong(0) -> feat
    }

  /** brute-force cross-modal baseline: exhaustive top-10 per query */
  private lazy val truth: Map[Long, Seq[Long]] = queries.map { case (mid, qv) =>
    mid -> docs.map { case (vid, dv) => (vid, cosine(dv, qv)) }
      .sortBy { case (vid, c) => (-c, vid) }.take(10).map(_._1).toSeq
  }.toMap

  test("q236 recall@10 vs brute force, pruning, and score fidelity") {
    assume(fixture)
    assert(queries.length >= 5, s"query carve too small: ${queries.length}")

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

  test("dispatch equivalence: the shuffled path is byte-identical to the broadcast path") {
    assume(fixture)
    // the auto dispatch (fleet ≪ cap at sf0.01) must pick broadcast;
    // the forced shuffled path — what a 10⁷-query fleet would get —
    // must compute the IDENTICAL frame, row order included, so the
    // hash gate certifies both physical plans at once
    def rows(path: Option[String]) =
      SimilarityQueries.q236Plan(spark, dir, path).collect().map(_.toSeq).toSeq
    val bcast = rows(Some("broadcast"))
    val shuf = rows(Some("shuffle"))
    val auto = rows(None)
    assert(bcast == auto, "auto dispatch must resolve to broadcast at this fleet size")
    assert(shuf == bcast,
      s"paths diverged: first diff ${shuf.zip(bcast).find(p => p._1 != p._2)}")
    graft.core.ScratchCache.drain()
  }

  test("recall/cost frontier: multi-table × plane sweep (the q74 levers applied to the cross-modal index)") {
    assume(fixture)
    // JVM replay of the candidate generator at each (planes, tables)
    // operating point: table t uses the disjoint md5-stream plane ids
    // 90 + t*planes + p (t=0 ≡ the production single-table index), a
    // query probes its own bucket + one Hamming-1 neighbor per plane
    // in EVERY table, candidates are the union. Candidates are scored
    // exactly downstream, so candidate coverage of the brute-force
    // top-10 IS recall@10. Deterministic ⇒ the frontier is pinned.
    def bucket(v: Array[Double], planeBase: Int, planes: Int): Int =
      (0 until planes).map { p =>
        val dot = (0 until 8).map(d => v(d) * SimilarityQueries.planeSign(planeBase + p, d)).sum
        if (dot > 0) 1 << p else 0
      }.sum
    val frontier = for (planes <- Seq(4, 5, 6); tables <- Seq(1, 2, 4)) yield {
      val docBuckets = Array.tabulate(tables)(t =>
        docs.map { case (vid, dv) => vid -> bucket(dv, 90 + t * planes, planes) }.toMap)
      val perQuery = queries.map { case (mid, qv) =>
        val cand = (0 until tables).flatMap { t =>
          val qb = bucket(qv, 90 + t * planes, planes)
          val probes = Set(qb) ++ (0 until planes).map(p => qb ^ (1 << p))
          docBuckets(t).collect { case (vid, b) if probes(b) => vid }
        }.toSet
        (cand.size, truth(mid).count(cand))
      }
      val scanned = perQuery.map(_._1).sum.toDouble / (queries.length * docs.length)
      val recall = perQuery.map(_._2).sum.toDouble / (queries.length * 10)
      (planes, tables, recall, scanned)
    }
    frontier.foreach { case (p, t, r, s) =>
      info(f"planes=$p tables=$t recall@10=$r%.3f scanned=$s%.3f")
    }
    // the production point (4 planes, 1 table) is the stamped one
    val prod = frontier.find(f => f._1 == 4 && f._2 == 1).get
    assert(prod._3 >= 0.83 && prod._4 < 0.4, prod.toString)
    // more tables at fixed planes can only ADD candidates: recall and
    // scanned fraction are both monotone in tables — the recall lever
    // a platform team buys with candidate budget
    for (p <- Seq(4, 5, 6)) {
      val curve = frontier.filter(_._1 == p).sortBy(_._2)
      assert(curve.map(_._3) == curve.map(_._3).sorted, s"recall not monotone at planes=$p: $curve")
      assert(curve.map(_._4) == curve.map(_._4).sorted, s"cost not monotone at planes=$p: $curve")
    }
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
