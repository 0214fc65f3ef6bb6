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
    intercept[IllegalArgumentException] {
      SaltedJoin.joinAuto(leftDf, rightDf, Seq("k"), col("id"), "full", parallelism = 8)
    }
  }

  test("detectHotKeys finds exactly the ~91% key, with a salt factor matching its share") {
    val hot = SaltedJoin.detectHotKeys(leftDf, Seq("k"), parallelism = 8)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Int](SaltedJoin.SaltNCol)).toMap
    // key 0 holds 910/1000 rows -> ceil(0.91 * 8) = 8 partition-units;
    // every other key holds ~1% (far under the 12.5% average share)
    assert(hot.keySet == Set(0L), s"hot-key set: $hot")
    assert(hot(0L) == 8, s"salt factor for the 91% key should be 8: $hot")
    graft.core.ScratchCache.drain()
  }

  test("detectHotKeys caps the salt factor and returns empty on a uniform frame") {
    import spark.implicits._
    val capped = SaltedJoin.detectHotKeys(leftDf, Seq("k"), parallelism = 1000, maxSalt = 16)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Int](SaltedJoin.SaltNCol)).toMap
    assert(capped(0L) == 16, s"maxSalt must bound the factor: $capped")
    val uniform = (0 until 1000).map(i => (i.toLong, (i % 10).toLong, 0.0)).toDF("id", "k", "v")
    assert(SaltedJoin.detectHotKeys(uniform, Seq("k"), parallelism = 8).count() == 0L,
      "uniform distribution must yield no hot keys")
    graft.core.ScratchCache.drain()
  }

  test("joinAuto equals the plain join for all supported join types (auto-detected keys)") {
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val plain = leftDf.join(rightDf, Seq("k"), jt)
      val salted = SaltedJoin.joinAuto(leftDf, rightDf, Seq("k"), col("id"), jt, parallelism = 8)
      assert(salted.columns.toSeq == plain.columns.toSeq, s"$jt: columns differ")
      assert(canon(salted) == canon(plain), s"$jt: rows differ")
      graft.core.ScratchCache.drain()
    }
  }

  test("joinAuto fans out only the hot key; right replication is confined to it") {
    val hk = SaltedJoin.detectHotKeys(leftDf, Seq("k"), parallelism = 8)
    // left: hot key spreads across its salt_n buckets, cold keys stay at salt 0
    val l = leftDf.join(broadcast(hk), Seq("k"), "left")
      .withColumn(SaltedJoin.SaltCol,
        when(col(SaltedJoin.SaltNCol).isNotNull,
          pmod(xxhash64(col("id")), col(SaltedJoin.SaltNCol).cast("long"))).otherwise(0L))
    assert(l.filter(col("k") === 0L).select(SaltedJoin.SaltCol).distinct().count() == 8,
      "hot key must occupy all 8 salt buckets")
    assert(l.filter(col("k") =!= 0L).select(SaltedJoin.SaltCol).distinct().collect()
      .map(_.getLong(0)).toSet == Set(0L), "cold keys must not be salted")
    // right: only the hot key's dim row replicates
    val r = rightDf.join(broadcast(hk), Seq("k"), "left")
      .withColumn(SaltedJoin.SaltCol,
        explode(expr(s"sequence(0L, CAST(coalesce(${SaltedJoin.SaltNCol}, 1) AS BIGINT) - 1)")))
    val perKey = r.groupBy(col("k")).count().collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(perKey(0L) == 8L && perKey(1L) == 1L,
      s"replication must be confined to the hot key: $perKey")
    graft.core.ScratchCache.drain()
  }

  test("joinWithHotKeys collapses duplicate hot-key rows instead of duplicating matches") {
    import spark.implicits._
    // an artifact with the SAME key listed twice (conflicting salt_n) —
    // e.g. two detectHotKeys outputs naively unioned. Without the
    // guard every k=0 left row would surface once per duplicate.
    val dupHot = Seq((0L, 4), (0L, 8)).toDF("k", SaltedJoin.SaltNCol)
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val plain = leftDf.join(rightDf, Seq("k"), jt)
      val salted = SaltedJoin.joinWithHotKeys(leftDf, rightDf, Seq("k"), col("id"), dupHot, jt)
      assert(salted.count() == plain.count(), s"$jt: duplicate hot-key row changed cardinality")
      assert(canon(salted) == canon(plain), s"$jt: rows differ")
    }
  }

  test("detectHotKeys breaks count ties deterministically on the key columns") {
    import spark.implicits._
    // 12 keys with IDENTICAL counts, all hot (parallelism >> keys);
    // topN = 5 cuts mid-tie — the kept set must be the 5 smallest keys
    // on both of two differently-partitioned runs
    val tied = (0 until 1200).map(i => (i.toLong, (i % 12).toLong, 0.0)).toDF("id", "k", "v")
    def kept(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
      val r = SaltedJoin.detectHotKeys(df, Seq("k"), parallelism = 120, topN = 5)
        .collect().map(_.getAs[Long]("k")).toSeq.sorted
      graft.core.ScratchCache.drain()
      r
    }
    assert(kept(tied) == Seq(0L, 1L, 2L, 3L, 4L), "tie cut must keep the smallest keys")
    assert(kept(tied.repartition(7)) == Seq(0L, 1L, 2L, 3L, 4L),
      "tie cut must be partitioning-invariant")
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
