package graft.layout

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q180 corpus manifest: the reproducibility contract the oracle hash
  * can't name — the root digest must be invariant to partitioning and
  * row order (that's what makes it a cross-run artifact), sensitive to
  * a single changed character, and equal to an independent brute-force
  * merkle computed outside Spark. */
class ManifestSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet"))
  private def docs = spark.read.parquet(s"$dir/documents.parquet")
    .select("source", "doc_id", "text", "n_chars")

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  private def collectManifest(df: org.apache.spark.sql.DataFrame) =
    LayoutQueries.manifestOf(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))

  test("q180 root digest is invariant to partitioning and row order") {
    assume(ready)
    val base = collectManifest(docs)
    val shuffled = collectManifest(
      docs.repartition(7).sortWithinPartitions(col("n_chars").desc))
    assert(base.sameElements(shuffled),
      "manifest must be a content fingerprint, not a layout checksum")
  }

  test("q180 equals an independent brute-force two-level merkle") {
    assume(ready)
    val rows = docs.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = rows.groupBy(_._1).toSeq.map { case (src, rs) =>
      val leaves = rs.groupBy(t => t._2 % 256).toSeq.map { case (_, b) =>
        md5hex(b.map(t => md5hex(t._3)).sorted.mkString)
      }
      (src, rs.length.toLong, rs.map(_._4).sum, leaves.length.toLong,
        md5hex(leaves.sorted.mkString))
    }.sortBy(_._1)
    assert(collectManifest(docs).toSeq == expected)
  }

  test("q180 root changes on a single-character edit and only for the touched source") {
    assume(ready)
    val base = collectManifest(docs).map(r => r._1 -> r._5).toMap
    val victim = docs.orderBy("doc_id").select("doc_id", "source").head
    val (vid, vsrc) = (victim.getLong(0), victim.getString(1))
    val edited = docs.withColumn("text",
      when(col("doc_id") === vid, concat(lit("X"), expr("substring(text, 2)")))
        .otherwise(col("text")))
    val after = collectManifest(edited).map(r => r._1 -> r._5).toMap
    assert(after(vsrc) != base(vsrc), "touched source root must change")
    assert((after - vsrc) == (base - vsrc), "untouched sources must keep their roots")
  }

  private def idsc(rows: Seq[(String, Long, String)]) = {
    import spark.implicits._
    rows.toDF("source", "doc_id", "text")
  }

  test("q185 splice covers every case: touched bucket, brand-new bucket, brand-new source, untouched leaf") {
    // bucket = doc_id % 256; base has srcA buckets {1, 2} and srcB {5}
    val base = idsc(Seq(
      ("srcA", 1L, "a one"), ("srcA", 257L, "a one again"),  // bucket 1, two docs
      ("srcA", 2L, "a two"),                                  // bucket 2
      ("srcB", 5L, "b five")))
    // delta: modifies srcA bucket 1 (new doc 513), creates srcA bucket
    // 9 (new bucket), and creates srcC (new source); srcA bucket 2 and
    // all of srcB stay untouched
    val delta = idsc(Seq(
      ("srcA", 513L, "a one third"),
      ("srcA", 9L, "a nine"),
      ("srcC", 3L, "c three")))
    val out = LayoutQueries.incrementalManifestOf(base, delta).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(5))).toMap
    assert(out("srcA") == ((3L, 2L, 1L)), out("srcA"))  // buckets {1,2,9}, 2 touched, match
    assert(out("srcB") == ((1L, 0L, 1L)), out("srcB"))  // fully untouched, still matches
    assert(out("srcC") == ((1L, 1L, 1L)), out("srcC"))  // born in the delta
  }

  test("q185 splice equals the full manifest root computed by q180's core") {
    assume(ready)
    val d = docs.select(col("source"), col("doc_id"), col("text"))
    val inc = LayoutQueries.incrementalManifestOf(
        d.filter(pmod(col("doc_id"), lit(7L)) =!= 0L),
        d.filter(pmod(col("doc_id"), lit(7L)) === 0L))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(5)))
    val full = collectManifest(docs).map(r => r._1 -> r._5).toMap
    inc.foreach { case (src, nb, nt, rootInc, ok) =>
      assert(ok == 1L, s"$src roots_match")
      assert(rootInc == full(src), s"$src incremental root != q180 root")
      assert(nt < nb, s"$src splice must leave some leaves untouched ($nt/$nb)")
    }
  }

  test("q180 plan shuffles digests only: two hash exchanges, text pruned before the first") {
    assume(ready)
    val p = graft.SparkEntry.queries("q180_corpus_manifest")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
    // text feeds md5() inside the scan-side project; the exchange rows
    // carry digests, so the aggregate keys/buffers must not mention text
    assert(!p.contains("collect_list(text"), p)
  }
}
