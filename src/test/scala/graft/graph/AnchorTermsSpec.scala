package graft.graph

import graft.SparkTestBase

/** Pins q213 anchor-term aggregation against a full brute-force JVM
  * replay on sf0.001: the 3-token anchor slice, per-(page, term)
  * occurrence counting across inbound links, the (cnt desc, term asc)
  * top-3 tie-break, and the true in-link count are recomputed in plain
  * Scala and compared cell-for-cell. */
class AnchorTermsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/documents.parquet"))

  test("q213 equals the brute-force anchor replay; ranks are dense top-3") {
    assume(fixture)
    val docs = graft.core.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val idSet = docs.keySet
    // synthesized links: i -> i/2, i/3, i%7 (self dropped, deduped)
    val links = docs.keys.toSeq.flatMap { i =>
      Seq(i / 2, i / 3, i % 7).filter(d => d != i && idSet(d)).map(d => (i, d))
    }.distinct
    val anchor = docs.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).take(3).toSeq }
    val byDst = links.groupBy(_._2)
    val expected = byDst.flatMap { case (dst, ls) =>
      val n = ls.size.toLong
      val cnt = ls.flatMap { case (src, _) => anchor(src) }
        .groupBy(identity).map { case (t, o) => t -> o.size.toLong }
      cnt.toSeq.sortBy { case (t, c) => (-c, t) }.take(3).zipWithIndex.map {
        case ((t, c), i) => (dst, i + 1L, t, c, n)
      }
    }.toSet
    val got = GraphQueries.queries("q213_anchor_terms")(spark, dir)
      .collect().map(r => (r.getAs[Long]("page_id"), r.getAs[Long]("rank"),
        r.getAs[String]("term"), r.getAs[Long]("cnt"), r.getAs[Long]("n_inlinks")))
      .toSet
    graft.core.ScratchCache.drain()
    assert(got == expected, s"anchor replay mismatch: ${(got diff expected).take(3)} vs ${(expected diff got).take(3)}")
    // ranks are dense 1..k per page and counts are non-increasing in rank
    val byPage = got.groupBy(_._1)
    byPage.foreach { case (p, rows) =>
      val sorted = rows.toSeq.sortBy(_._2)
      assert(sorted.map(_._2) == (1L to sorted.size.toLong), s"page $p ranks not dense")
      assert(sorted.map(_._4).zip(sorted.map(_._4).tail).forall { case (a, b) => a >= b },
        s"page $p counts not non-increasing in rank")
    }
    // the mod-7 hubs aggregate anchors from ~N/7 in-links — their
    // n_inlinks must dwarf a non-hub's, and they still emit ≤3 terms
    (0L to 6L).filter(byPage.contains).foreach { h =>
      assert(byPage(h).head._5 > 20L, s"hub $h in-link count suspiciously low")
      assert(byPage(h).size <= 3)
    }
  }

  test("q213 plan: the rank<=3 filter runs as WindowGroupLimit — hub-skew safety") {
    assume(fixture)
    val df = GraphQueries.queries("q213_anchor_terms")(spark, dir)
    df.collect()
    graft.core.ScratchCache.drain()
    def nodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      p +: kids.flatMap(nodes)
    }
    // Spark rewrites row_number()<=k into WindowGroupLimitExec: each
    // task forwards at most 3 term rows per dst BEFORE the final
    // window sort — so a hub's anchor vocabulary never serializes
    // through one task unbounded. If this pin breaks, the top-3 is
    // running as a full per-dst window again.
    val names = nodes(df.queryExecution.executedPlan).map(_.getClass.getSimpleName)
    assert(names.exists(_.contains("WindowGroupLimit")),
      s"no WindowGroupLimitExec in q213's executed plan: ${names.distinct.mkString(",")}")
  }
}
