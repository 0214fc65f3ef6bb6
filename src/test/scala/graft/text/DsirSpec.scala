package graft.text

import java.security.MessageDigest
import graft.SparkTestBase

/** q112's DSIR importance weights: the hashed-bucket log-likelihood
  * ratio equals an exact driver-side recomputation (bucket hashing,
  * add-one smoothing, integer bit-length log2), and the weight table
  * behaves as the importance sampler expects — a bucket appearing
  * ONLY in the target slice gets a strictly positive weight on a
  * fixture built to pin that. */
class DsirSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet"))

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def bucket(t: String): Long =
    java.lang.Long.parseLong(md5hex("dsir|" + t).take(2), 16)

  private def bits(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong

  /** Driver-side mirror of q112 over (doc_id, lang, text) rows. */
  private def recompute(docs: Seq[(Long, String, String)]): Seq[(Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, lang, text) =>
      (id, lang, text.split("\\s+").filter(_.nonEmpty).map(bucket))
    }
    val rCnt = toks.flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tCnt = toks.filter(_._2 == "en").flatMap(_._3)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rTotal = rCnt.values.sum
    val tTotal = toks.filter(_._2 == "en").map(_._3.length.toLong).sum
    val w = rCnt.keys.map { b =>
      b -> (bits((rTotal + 256) / (rCnt(b) + 1)) - bits((tTotal + 256) / (tCnt.getOrElse(b, 0L) + 1)))
    }.toMap
    toks.filter(_._3.nonEmpty).map { case (id, _, bs) =>
      val lr = bs.map(w).sum
      (id, bs.length.toLong, lr, if (lr >= 0) 1L else 0L)
    }.sortBy(_._1)
  }

  test("q112 equals the driver-side recomputation on real data") {
    assume(ready)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val got = TextQueries.queries("q112_dsir_weights")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val expected = recompute(docs)
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
  }

  test("a target-only token raises its carrier's importance above a raw-only twin") {
    // Two structurally identical docs; one carries a token seen only in
    // the en (target) slice, the other a token seen only outside it.
    // DSIR must rank the target-flavored doc strictly higher.
    val filler = (1 to 40).map(i => s"w$i").mkString(" ")
    val rows = Seq(
      (0L, "en", s"$filler targetonlytok"),
      (1L, "de", s"$filler rawonlytok"),
      (2L, "en", filler),
      (3L, "de", filler))
    val expected = recompute(rows)
    import spark.implicits._
    // route the fixture through the same Tables-shaped frame the query
    // reads by writing it as a scratch documents table
    val tmp = java.nio.file.Files.createTempDirectory("dsir").toString
    rows.toDF("doc_id", "lang", "text").withColumn("source", org.apache.spark.sql.functions.lit("src0"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextQueries.queries("q112_dsir_weights")(spark, tmp)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    val byId = got.map(r => r._1 -> r._3).toMap
    assert(byId(0L) > byId(1L),
      s"target-only token must outscore raw-only token: ${byId(0L)} vs ${byId(1L)}")
  }
}
