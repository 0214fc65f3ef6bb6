package graft.text

import graft.SparkTestBase

/** q150's merge application, cross-checked against a driver-side
  * recomputation that mirrors the documented contract exactly: merges
  * in rank order, one leftmost non-overlapping global pass each, at
  * symbol boundaries only. Includes the planted consecutive-pair case
  * (`aaaa` + merge `a a` → segments `aa,a,a` in the single pass). */
class BpeEncodeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet"))

  /** The documented single-pass merge application over a token. */
  private def encode(token: String, merges: Seq[String]): Long = {
    val sep = 31.toChar.toString
    var enc = sep + token.map(_.toString).mkString(sep) + sep
    merges.foreach { pair =>
      val Array(a, b) = pair.split(" ")
      enc = enc.replace(s"$sep$a$sep$b$sep", s"$sep$a$b$sep") // JVM replace: leftmost, global
    }
    enc.count(_ == 31.toChar).toLong - 1L
  }

  test("planted corpus: boundary safety and the single-pass consecutive contract") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("bpe").toString
    // 'a a' dominates (aaaa×9, aa×6); then 'b c' (bc×8). 'aaaa' must
    // encode as aa|a|a (single pass), 'abca' stays a|bc|a only if the
    // later 'b c' merge respects the boundary of... (no earlier merge
    // inside it here — it tests pattern-at-boundary matching).
    val text = (Seq.fill(9)("aaaa") ++ Seq.fill(8)("bc") ++ Seq.fill(6)("aa") ++
      Seq.fill(4)("abca")).mkString(" ")
    Seq((1L, text, "en", "s1", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextQueries.queries("q150_bpe_encode")(spark, tmp).collect()
    assert(got.length == 1)
    val r = got.head
    // driver-side recomputation with the same learned merges
    val toks = text.split(" ").toSeq
    val vocab = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pairCnt = scala.collection.mutable.Map.empty[String, Long]
    vocab.foreach { case (t, c) =>
      if (t.length >= 2) t.sliding(2).foreach { p =>
        val k = s"${p(0)} ${p(1)}"
        pairCnt(k) = pairCnt.getOrElse(k, 0L) + c
      }
    }
    val merges = pairCnt.toSeq.sortBy { case (p, c) => (-c, p) }.take(20).map(_._1)
    val expSegs = toks.map(t => encode(t, merges)).sum
    assert(r.getAs[Long]("n_bpe_tokens") == expSegs,
      s"got ${r.getAs[Long]("n_bpe_tokens")} want $expSegs (merges=$merges)")
    assert(r.getAs[Long]("n_chars") == toks.map(_.length.toLong).sum)
    assert(r.getAs[Long]("n_words") == toks.length.toLong)
    // the planted specifics, independently of the recomputation:
    // 'a a' ranks first (9·3 + 6·1 + 4·0 = 33 > 'b c' 12); one pass on
    // 'aaaa' yields 3 segments, on 'aa' 1, on 'abca' ('a a' doesn't
    // apply, 'b c' does) 3, 'bc' 1.
    assert(merges.head == "a a")
    assert(encode("aaaa", merges) == 3L)
    assert(r.getAs[Long]("compression_ppm") ==
      expSegs * 1000000L / toks.map(_.length.toLong).sum)
  }

  test("q150 equals the driver-side recomputation on the fixture corpus") {
    assume(ready)
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split("\\s+").filter(_.nonEmpty).toSeq))
    val vocab = rows.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pairCnt = scala.collection.mutable.Map.empty[String, Long]
    vocab.foreach { case (t, c) =>
      if (t.length >= 2) t.sliding(2).foreach { p =>
        val k = s"${p(0)} ${p(1)}"
        pairCnt(k) = pairCnt.getOrElse(k, 0L) + c
      }
    }
    val merges = pairCnt.toSeq.sortBy { case (p, c) => (-c, p) }.take(20).map(_._1)
    val segOf = vocab.keys.map(t => t -> encode(t, merges)).toMap
    val expected = rows.groupBy(_._1).view.mapValues { rs =>
      val ts = rs.flatMap(_._2)
      (ts.map(_.length.toLong).sum, ts.length.toLong, ts.map(segOf).sum)
    }.toMap
    val got = TextQueries.queries("q150_bpe_encode")(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_chars"), r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens")))
      .toMap
    assert(got == expected, s"got=$got\nwant=$expected")
    // merging must actually compress: fewer BPE tokens than chars
    got.values.foreach { case (ch, _, segs) => assert(segs < ch) }
  }
}
