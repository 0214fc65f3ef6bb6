package graft.rel

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** [[SaltedJoin]]: semantics-preservation against the plain join for
  * every supported join type on a skewed fixture, real fan-out of the
  * hot key across salt buckets, and rejection of the join types
  * replication would corrupt. */
class SaltedJoinSpec extends SparkTestBase {

  // 1000 left rows, ~91% on hot key 0 (the i%10==9 branch also yields
  // k=0 when i%100 is in 0..9); the rest land on keys 1..9. rightDf
  // covers keys 0..4 plus a right-only key (99), so left keys 5..9
  // have no right match — exercising the no-match paths of left outer
  // and left_anti — and key 99 is the unmatched replicated right row
  // the disallowed join types would surface
  private def leftDf = {
    import spark.implicits._
    (0 until 1000).map { i =>
      val k = if (i % 10 < 9) 0L else (i % 100 / 10).toLong
      (i.toLong, k, i * 1.5)
    }.toDF("id", "k", "v")
  }
  private def rightDf = {
    import spark.implicits._
    ((0L to 4L) :+ 99L).map(k => (k, s"dim_$k")).toDF("k", "attr")
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("salted join equals the plain join for inner/left/left_semi/left_anti") {
    // "left_outer" and "leftouter" are Spark-canonical spellings the
    // normalizer must accept as left
    for (jt <- Seq("inner", "left", "left_outer", "leftouter", "left_semi", "left_anti")) {
      val plain = leftDf.join(rightDf, Seq("k"), jt)
      val salted = SaltedJoin.join(leftDf, rightDf, Seq("k"), col("id"), 8, jt)
      assert(salted.columns.toSeq == plain.columns.toSeq, s"$jt: columns differ")
      assert(canon(salted) == canon(plain), s"$jt: rows differ")
    }
  }

  test("the hot key fans out across salt buckets; every right key is fully replicated") {
    val salted = SaltedJoin.saltLeft(leftDf, col("id"), 8)
    val hotSalts = salted.filter(col("k") === 0L)
      .select(SaltedJoin.SaltCol).distinct().count()
    assert(hotSalts == 8, s"hot key landed on only $hotSalts of 8 salt buckets")
    val replicated = SaltedJoin.replicateRight(rightDf, 8)
    assert(replicated.count() == rightDf.count() * 8)
    val perKey = replicated.groupBy(col("k"))
      .agg(countDistinct(col(SaltedJoin.SaltCol)).as("n"))
      .collect().map(_.getLong(1)).toSet
    assert(perKey == Set(8L), "every right key must appear once per salt value")
  }

  test("join types that would surface replicated right rows are rejected") {
    for (jt <- Seq("right", "full", "full_outer", "cross"))
      intercept[IllegalArgumentException] {
        SaltedJoin.join(leftDf, rightDf, Seq("k"), col("id"), 8, jt)
      }
  }

  test("q107's salted plan takes the shuffle-join path, not a broadcast") {
    val dir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/events.parquet")))
    val plan = RelQueries.queries("q107_salted_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"merge hint did not pin the shuffle path:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), s"dim was broadcast — skew path not exercised:\n$plan")
  }
}
