package graft.graph

import graft.SparkTestBase

/** Pins q214 modularity against a full brute-force JVM replay on
  * sf0.001: LPA labels (LpaSpec's synchronous replay), per-community
  * intra-orientation counts, degree mass, and the exact integer
  * numerator intra·2m − d² are recomputed in plain Scala and compared
  * cell-for-cell; then Newman's Q = Σ q_num / (2m)² is bounded. */
class ModularitySpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/documents.parquet"))

  test("q214 equals the brute-force modularity replay; Q exposes the structureless graph") {
    assume(fixture)
    val ids = graft.core.Tables.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val idSet = ids.toSet
    val und = ids.flatMap { i =>
      Seq(i / 2, i / 3, i % 7).filter(d => d != i && idSet(d))
        .flatMap(d => Seq((i, d), (d, i)))
    }.distinct
    val nbrs = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl: Map[Long, Long] = ids.map(i => i -> i).toMap
    for (_ <- 1 to 4) {
      lbl = ids.map { v =>
        val votes = nbrs.getOrElse(v, Array.empty[Long]).map(lbl)
        if (votes.isEmpty) v -> lbl(v)
        else v -> votes.groupBy(identity).view.mapValues(_.length.toLong)
          .toSeq.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    val twoM = und.length.toLong
    val deg = und.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val expected = lbl.values.toSeq.distinct.map { c =>
      val members = lbl.collect { case (n, l) if l == c => n }.toSet
      val intra = und.count { case (a, b) => members(a) && members(b) }.toLong
      val dsum = members.toSeq.map(n => deg.getOrElse(n, 0L)).sum
      c -> (members.size.toLong, intra, dsum, intra * twoM - dsum * dsum)
    }.toMap
    val got = GraphQueries.queries("q214_modularity")(spark, dir).collect()
    graft.core.ScratchCache.drain()
    got.foreach(r => assert(r.getAs[Long]("two_m") == twoM, "2m mismatch"))
    val gotMap = got.map(r => r.getAs[Long]("community") ->
      (r.getAs[Long]("n_nodes"), r.getAs[Long]("intra_rows"),
        r.getAs[Long]("deg_sum"), r.getAs[Long]("q_num"))).toMap
    assert(gotMap == expected, s"modularity replay mismatch")
    // global invariants: communities tile the nodes, intra orientations
    // never exceed the total, degree mass totals 2m, and Q ≤ 1 by
    // construction. On THIS graph Q is NEGATIVE (≈ −0.053) and sits
    // BELOW even the all-singletons baseline Q₀ = −Σ deg(v)²/(2m)²
    // (≈ −0.006): the div-chain + mod-7-hub generator is near-
    // bipartite with no community structure, so LPA's merged labels
    // carry far more degree mass than intra edges. That worse-than-
    // trivial verdict is EXACTLY what this audit exists to surface —
    // a pipeline reading this table would refuse to use these
    // communities as dedup/topical units. Both facts are pinned so a
    // generator or LPA change that manufactures structure (or loses
    // it) shows up here.
    assert(gotMap.values.map(_._1).sum == ids.length.toLong)
    assert(gotMap.values.map(_._2).sum <= twoM)
    assert(gotMap.values.map(_._3).sum == twoM, "degree mass must total 2m")
    val den = twoM.toDouble * twoM
    val q = gotMap.values.map(_._4).sum.toDouble / den
    val qSingleton = -ids.map(n => { val d = deg.getOrElse(n, 0L); d * d }).sum.toDouble / den
    assert(q <= 1.0, s"Q=$q above 1")
    assert(q < qSingleton, s"Q=$q vs singleton $qSingleton — fixture grew real structure?")
    assert(q < 0.0 && q > -0.1, s"Q=$q moved off the pinned fixture band (≈ −0.053)")
  }
}
