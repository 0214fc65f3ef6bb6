package graft.text

import java.security.MessageDigest
import graft.SparkTestBase

/** q96's hashing-trick linear classifier: exact driver-side
  * recomputation of every doc's score, and the zero-shuffle plan
  * contract (the whole classifier must stay map-side — the property
  * that makes it free at 100 TB). */
class QualityClassifierSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet"))

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def weight(tok: String): Long = {
    val h = md5hex(s"feat|$tok")
    val hex = "0123456789abcdef"
    (hex.indexOf(h(0)) * 16 + hex.indexOf(h(1)) - 128).toLong
  }

  test("q96 equals the driver-side recomputation") {
    assume(ready)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").filter(_.nonEmpty)))
      .filter(_._2.nonEmpty)
    val expected = docs.map { case (id, toks) =>
      val score = toks.map(weight).sum
      (id, toks.length.toLong, score, if (score > 0) 1L else 0L)
    }.sortBy(_._1).toSeq
    val got = TextQueries.queries("q96_quality_classifier")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // weights are bounded: |score| can never exceed 128 * n_toks
    got.foreach { case (id, n, score, _) =>
      assert(math.abs(score) <= 128L * n, s"doc $id out of weight range")
    }
  }

  test("q170 yield curve equals the brute-force suffix sums; curve monotone, floor row covers the source") {
    assume(ready)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split("\\s+").filter(_.nonEmpty)))
      .filter(_._2.nonEmpty)
      .map { case (src, toks) => (src, toks.length.toLong, toks.map(weight).sum) }
    val mins = docs.map(_._3).min
    val maxs = docs.map(_._3).max
    val w = math.max(1L, (maxs - mins) / 32 + 1)
    val byBucket = docs
      .groupBy(d => (d._1, math.min(31L, (d._3 - mins) / w)))
      .map { case ((src, b), ds) => (src, b, ds.length.toLong, ds.map(_._2).sum) }
    val expected = byBucket.groupBy(_._1).flatMap { case (src, rows) =>
      rows.map { case (_, b, _, _) =>
        val ge = rows.filter(_._2 >= b)
        (src, b, mins + b * w, ge.map(_._3).sum, ge.map(_._4).sum)
      }
    }.toSeq.sortBy(r => (r._1, r._2))
    val got = TextQueries.queries("q170_threshold_yield")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // contract: within each source the curve is strictly cumulative —
    // non-increasing in b, and the lowest present bucket admits every
    // scored doc of that source
    got.groupBy(_._1).foreach { case (src, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Seq(lo, hi) =>
          assert(lo._4 >= hi._4 && lo._5 >= hi._5, s"$src curve not monotone")
        case _ =>
      }
      val srcDocs = docs.filter(_._1 == src)
      assert(sorted.head._4 == srcDocs.length.toLong &&
        sorted.head._5 == srcDocs.map(_._2).sum,
        s"$src floor row must admit the whole source")
    }
  }

  test("q176 calibration diagram equals the brute-force bucket replay; tiles the universe; both verdicts present") {
    assume(ready)
    val allStop = TextQueries.stop.values.flatten.toSet
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect()
      .map(_.getString(0).split("\\s+").filter(_.nonEmpty))
      .filter(_.length >= 2)
      .map { toks =>
        val n = toks.length.toLong
        val chars = toks.map(_.length.toLong).sum
        val pass = n >= 50L && n <= 100000L &&
          chars >= n * 3L && chars <= n * 10L &&
          toks.count(allStop).toLong >= 2L &&
          toks.distinct.length.toLong * 2L >= n
        (toks.map(weight).sum, pass)
      }
    val mins = docs.map(_._1).min
    val maxs = docs.map(_._1).max
    val w = math.max(1L, (maxs - mins) / 32 + 1)
    val expected = docs.groupBy(d => math.min(31L, (d._1 - mins) / w))
      .map { case (b, ds) =>
        val p = ds.count(_._2).toLong
        (b, mins + b * w, ds.length.toLong, p, p * 1000000L / ds.length)
      }.toSeq.sortBy(_._1)
    val got = TextQueries.queries("q176_score_calibration")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    assert(got.map(_._3).sum == docs.length.toLong, "diagram must tile the universe")
    val totPass = got.map(_._4).sum
    assert(totPass > 0 && totPass < docs.length.toLong,
      "fixture must exercise both rule verdicts or the diagram is vacuous")
  }

  test("q96 plan is map-side only: no shuffle before the output sort") {
    assume(ready)
    val p = TextQueries.queries("q96_quality_classifier")(spark, dir)
      .queryExecution.executedPlan.toString
    // the ONLY exchange is the rangepartitioning for the final ORDER BY
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("BroadcastExchange"), p)
  }
}
