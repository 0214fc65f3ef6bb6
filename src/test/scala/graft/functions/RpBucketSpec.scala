package graft.functions

import java.security.MessageDigest

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Bit-identity pin for `rp_bucket(v, t, planes, dims)` against the
  * unrolled CASE/dot-chain SQL formulation it replaced (respelled
  * literally here, planeSign formula included, independent of main
  * code). Inputs: the sf0.001 embeddings (real 64-dim float vectors)
  * and adversarial literals (NaN element — Spark orders NaN above
  * everything, so a NaN dot SETS the plane bit; null element / short /
  * null vector — the CASE-over-null semantics make the bucket 0, never
  * NULL; all-zero vector; ±Infinity). */
class RpBucketSpec extends SparkTestBase {
  import spark.implicits._

  private def planeSign(p: Int, d: Int): Int = {
    val h = MessageDigest.getInstance("MD5").digest(s"$p-$d".getBytes("UTF-8"))
    if (((h(0) >> 4) & 0xf) < 8) 1 else -1
  }
  private def unrolled(v: String, t: Int, planes: Int, dims: Int): String =
    (0 until planes).map { p =>
      val dot = (0 until dims).map(d => s"$v[$d] * ${planeSign(t * planes + p, d)}").mkString(" + ")
      s"(CASE WHEN ($dot) > 0D THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")

  test("rp_bucket matches the unrolled expression on corpus vectors, tables 0-3") {
    GraftFunctions.register(spark)
    val e = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    for (t <- 0 until 4) {
      val bad = e.selectExpr(
        s"CAST(${unrolled("v", t, 6, 64)} AS INT) AS old_b",
        s"rp_bucket(v, $t, 6, 64) AS new_b"
      ).filter(!($"old_b" <=> $"new_b")).count()
      assert(bad == 0, s"rp_bucket diverged on $bad vectors at table $t")
    }
  }

  test("rp_bucket matches the unrolled expression on adversarial vectors") {
    GraftFunctions.register(spark)
    val base: Seq[java.lang.Double] =
      (0 until 64).map(d => Double.box((d % 7 - 3).toDouble / (d + 1)))
    val vecs: Seq[Seq[java.lang.Double]] = Seq(
      base,
      base.updated(5, Double.box(Double.NaN)),
      base.updated(63, null: java.lang.Double),
      Seq.fill(64)(Double.box(0.0)),
      base.updated(0, Double.box(Double.PositiveInfinity))
        .updated(1, Double.box(Double.NegativeInfinity)),
      null)
    val df = vecs.toDF("v").selectExpr("CAST(v AS ARRAY<DOUBLE>) AS v")
    val cmp = df.selectExpr(
      s"CAST(${unrolled("v", 0, 6, 64)} AS INT) AS old_b",
      "rp_bucket(v, 0, 6, 64) AS new_b",
      s"CAST(${unrolled("v", 2, 6, 64)} AS INT) AS old_b2",
      "rp_bucket(v, 2, 6, 64) AS new_b2")
    val bad = cmp.filter(!($"old_b" <=> $"new_b") || !($"old_b2" <=> $"new_b2")).count()
    assert(bad == 0, s"rp_bucket diverged on $bad adversarial vectors")
    // the NaN row must SET bits via the NaN-dot planes (regression guard
    // that the test is actually exercising the NaN ordering)
    val nanOld = df.selectExpr(s"CAST(${unrolled("v", 0, 6, 64)} AS INT) AS b")
      .collect()(1).getInt(0)
    assert(nanOld == 63, s"NaN dot must set every plane bit in the SQL form, got $nanOld")
  }

  test("rp_bucket tolerates short vectors (where the unrolled ANSI form would throw)") {
    GraftFunctions.register(spark)
    // Under ANSI mode (Spark 4 default) `v[63]` on a 63-element array
    // RAISES rather than returning null — the unrolled formulation
    // cannot even evaluate. rp_bucket is deliberately lenient: a
    // missing ordinal nulls the dot, CASE-over-null semantics yield 0.
    val short = Seq((0 until 63).map(d => Double.box(d.toDouble)).toSeq).toDF("v")
      .selectExpr("CAST(v AS ARRAY<DOUBLE>) AS v")
    assert(short.selectExpr("rp_bucket(v, 0, 6, 64) AS b").head().getInt(0) == 0)
    intercept[Exception] {
      short.selectExpr(s"CAST(${unrolled("v", 0, 6, 64)} AS INT) AS b").collect()
    }
  }
}
