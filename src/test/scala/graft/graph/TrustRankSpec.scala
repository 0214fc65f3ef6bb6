package graft.graph

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q196 TrustRank: a planted seed-chain + link-farm graph is replayed
  * against an exact Long trajectory oracle (8 rounds of the same
  * integer DIV arithmetic), pinning that trust reaches seed-connected
  * pages, that the farm's pages end at exactly zero trust
  * (`no_trust`), and that the pr chain is bit-identical to q133's
  * PageRank on the shared fixture. */
class TrustRankSpec extends SparkTestBase {

  // 1 -> 2 -> 3 (seeded chain); {4, 5} a two-page farm linking 3
  private val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L), (5L, 4L), (4L, 3L), (5L, 3L))
  private val seedSet = Set(1L)
  private val nodeIds = Seq(1L, 2L, 3L, 4L, 5L)

  /** Exact replay of the fused chain with plain Longs. */
  private def replay(iters: Int): Map[Long, (Long, Long)] = {
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var pr = nodeIds.map(_ -> 1000000L).toMap
    var tr = nodeIds.map(n => n -> (if (seedSet(n)) 1000000L else 0L)).toMap
    for (_ <- 1 to iters) {
      val cp = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      val ct = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (s, d) =>
        cp(d) += pr(s) / outdeg(s)
        ct(d) += tr(s) / outdeg(s)
      }
      pr = nodeIds.map(n => n -> (150000L + (85L * cp(n)) / 100L)).toMap
      tr = nodeIds.map(n => n -> ((if (seedSet(n)) 150000L else 0L) + (85L * ct(n)) / 100L)).toMap
    }
    nodeIds.map(n => n -> ((pr(n), tr(n)))).toMap
  }

  test("q196: planted graph matches the exact Long trajectory oracle") {
    import spark.implicits._
    val nodes = nodeIds.map(n => (n, if (seedSet(n)) 1L else 0L)).toDF("page_id", "is_seed")
    val links = edges.toDF("src", "dst")
    val out = GraphQueries.trustRankOf(nodes, links).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(4))).toMap
    val expect = replay(8)
    nodeIds.foreach { n =>
      assert((out(n)._1, out(n)._2) == expect(n),
        s"node $n: engine ${(out(n)._1, out(n)._2)} vs oracle ${expect(n)}")
    }
    assert(out(1L)._3 == "seed")
    assert(out(2L)._2 > 0L && out(3L)._2 > 0L, "trust must flow down the seeded chain")
    assert(out(4L)._3 == "no_trust" && out(5L)._3 == "no_trust",
      "the farm is unreachable from the seed set — exactly zero trust")
    // class of 2 and 3 replays from the totals by the same cross-multiply
    val prTot = BigInt(nodeIds.map(expect(_)._1).sum)
    val trTot = BigInt(nodeIds.map(expect(_)._2).sum)
    Seq(2L, 3L).foreach { n =>
      val (p, t) = expect(n)
      val want =
        if (BigInt(2) * t * prTot < BigInt(p) * trTot) "low_trust" else "trusted"
      assert(out(n)._3 == want, s"node $n class")
    }
  }

  test("q196: seedless graph yields no_trust everywhere, never a division by zero") {
    import spark.implicits._
    val nodes = nodeIds.map(n => (n, 0L)).toDF("page_id", "is_seed")
    val links = edges.toDF("src", "dst")
    val out = GraphQueries.trustRankOf(nodes, links).collect()
    assert(out.forall(_.getString(4) == "no_trust"))
    assert(out.forall(_.getLong(2) == 0L))
  }

  test("q196 on the fixture: pr is bit-identical to q133; all classes live") {
    val dir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet")))
    val pr133 = graft.SparkEntry.queries("q133_pagerank")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = graft.SparkEntry.queries("q196_trustrank")(spark, dir).collect()
    out.foreach { r =>
      assert(r.getLong(1) == pr133(r.getLong(0)),
        s"page ${r.getLong(0)}: fused pr must equal q133's rank")
    }
    val classes = out.map(_.getString(4)).toSet
    assert(classes.contains("seed") && classes.contains("no_trust"),
      s"fixture must exercise the class spread, got $classes")
    out.filter(_.getString(4) == "seed").foreach(r => assert(r.getLong(3) == 1L))
    out.filter(r => r.getString(4) == "no_trust").foreach(r => assert(r.getLong(2) == 0L))
  }
}
