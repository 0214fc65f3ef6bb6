package graft.rel

import graft.SparkTestBase

/** q147's NOT IN three-valued semantics and plan shape: one NULL in
  * the build side empties the result, a NULL probe row never
  * qualifies, and the physical plan is the null-aware anti join (not
  * the plain LeftAnti a NOT EXISTS would get). */
class NullAwareAntiJoinSpec extends SparkTestBase {

  private def viewsOf(probe: Seq[java.lang.Long], build: Seq[java.lang.Long]): Unit = {
    import spark.implicits._
    probe.toDF("k").createOrReplaceTempView("na_probe")
    build.toDF("k").createOrReplaceTempView("na_build")
  }
  private def notIn(): Seq[Long] =
    spark.sql("SELECT k FROM na_probe WHERE k NOT IN (SELECT k FROM na_build) ORDER BY k")
      .collect().map(_.getLong(0)).toSeq

  test("a single NULL in the subquery empties the NOT IN result") {
    viewsOf(Seq(1L, 2L, 3L), Seq(2L, null))
    assert(notIn() == Seq.empty)
  }

  test("null-free build behaves like an anti join; NULL probe rows never qualify") {
    viewsOf(Seq(1L, 2L, 3L), Seq(2L))
    assert(notIn() == Seq(1L, 3L))
    viewsOf(Seq(1L, null, 3L), Seq(2L))
    assert(notIn() == Seq(1L, 3L)) // the NULL probe row is dropped, not kept
  }

  test("q147 plans the null-aware anti join and matches a driver-side recomputation") {
    val dir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/customer.parquet")))
    val df = RelQueries.queries("q147_not_in_null_aware")(spark, dir)
    // Pin the EXECUTED plan node itself, not a substring: the old
    // `contains("LeftAnti") || contains(", true")` assertions were
    // satisfied by the plain LeftAnti plan this spec exists to rule
    // out. The NOT IN must plan as a BroadcastHashJoinExec with
    // joinType LeftAnti AND isNullAwareAntiJoin = true — Spark's
    // single-key null-aware anti-join strategy.
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // AQE wrappers are leaves to TreeNode traversal — descend into the
    // finalized plan and each query stage's wrapped plan explicitly
    def collectPlan(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case _                        => p.children
      }
      p +: (kids ++ p.subqueries).flatMap(collectPlan)
    }
    df.collect() // materialize so AQE finalizes the physical plan
    val joins = collectPlan(df.queryExecution.executedPlan)
      .collect { case j: BroadcastHashJoinExec => j }
    assert(joins.exists(j => j.joinType == LeftAnti && j.isNullAwareAntiJoin),
      s"expected a null-aware LeftAnti BroadcastHashJoinExec, got: " +
        joins.map(j => s"(${j.joinType}, nullAware=${j.isNullAwareAntiJoin})").mkString(", ") +
        s"\n${df.queryExecution.executedPlan}")
    val got = df.collect().map(_.getLong(0)).toSeq
    val custs = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val hot = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_custkey", "o_totalprice").collect()
      .filter(_.getDouble(1) > 300000.0).map(_.getLong(0)).toSet
    assert(got == (custs -- hot).toSeq.sorted)
    assert(got.nonEmpty, "degenerate fixture: every customer has a hot order")
  }
}
