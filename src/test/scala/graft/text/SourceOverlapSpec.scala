package graft.text

import java.security.MessageDigest
import graft.SparkTestBase

/** q117's cross-source contamination matrix: equals a driver-side
  * recomputation on real data, and the per-segment source cap holds —
  * a segment present in MORE sources than the cap contributes pairs
  * only among the lexicographically lowest [[TextQueries.OverlapSourceCap]]. */
class SourceOverlapSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet"))

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Driver-side mirror of q117 over (source, text) rows. */
  private def recompute(rows: Seq[(String, String)]): Seq[(String, String, Long)] = {
    val k = TextQueries.LineSegToks
    val segSrc = rows.flatMap { case (src, text) =>
      text.split("\\s+").filter(_.nonEmpty).grouped(k)
        .map(seg => md5hex(seg.mkString(" ")) -> src)
    }.distinct
    segSrc.groupBy(_._1).values.toSeq
      .map(_.map(_._2).distinct.sorted.take(TextQueries.OverlapSourceCap))
      .filter(_.size >= 2)
      .flatMap(srcs => for { i <- srcs.indices; j <- i + 1 until srcs.size } yield (srcs(i), srcs(j)))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((a, b), n) => (a, b, n) }
      .sortBy(t => (t._1, t._2))
  }

  test("q117 equals the driver-side recomputation on real data") {
    assume(ready)
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val got = TextQueries.queries("q117_source_overlap")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val expected = recompute(rows)
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
  }

  test("a segment in more sources than the cap pairs only the lowest cap sources") {
    import spark.implicits._
    val cap = TextQueries.OverlapSourceCap
    val nSrc = cap + 4
    // one boilerplate segment shared by ALL 20 sources; each source
    // also carries a unique segment so docs differ
    val rows = (0 until nSrc).map { i =>
      (i.toLong, f"s$i%02d", s"common seg here unique$i filler token")
    }
    val tmp = java.nio.file.Files.createTempDirectory("ovl").toString
    rows.toDF("doc_id", "source", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextQueries.queries("q117_source_overlap")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val expected = recompute(rows.map(r => (r._2, r._3)))
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // the capped boilerplate segment pairs exactly the cap lowest
    // sources: C(cap, 2) pairs, none involving s16..s19
    assert(got.size == cap * (cap - 1) / 2, s"${got.size} pairs")
    val beyond = got.filter(t => t._1 >= f"s$cap%02d" || t._2 >= f"s$cap%02d")
    assert(beyond.isEmpty, s"pairs beyond the cap: $beyond")
  }
}
