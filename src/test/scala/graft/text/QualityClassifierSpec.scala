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

  test("q96 plan is map-side only: no shuffle before the output sort") {
    assume(ready)
    val p = TextQueries.queries("q96_quality_classifier")(spark, dir)
      .queryExecution.executedPlan.toString
    // the ONLY exchange is the rangepartitioning for the final ORDER BY
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("BroadcastExchange"), p)
  }
}
