package graft.text

import graft.SparkTestBase

/** Pins q201 template mining against a full brute-force JVM replay:
  * the planted-template rendering, the DF≥5% vocab, the slot masking,
  * and the cluster roll-up are all recomputed in plain Scala over the
  * sf0.001 fixture and compared cell-for-cell — plus the contracts the
  * replay can't see (vocab broadcast in the plan, slot tokens never
  * surviving into a preview). */
class TemplateMiningSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/documents.parquet"))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def tmplSel(docId: Long) = md5hex(s"tmpl|$docId").head < '4'
  private def render(docId: Long): String = {
    val a = s"topic${docId % 7}"; val b = s"style${docId % 9}"
    (docId % 4) match {
      case 0 => s"please write a short essay about $a for my $b class"
      case 1 => s"translate the following sentence into $a keeping the $b register"
      case 2 => s"summarize the article $a in exactly $b sentences"
      case _ => s"list five facts about $a as $b bullet points"
    }
  }

  test("q201 clusters equal the brute-force replay; slots masked; vocab broadcast") {
    assume(fixture)
    val raw = graft.core.Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // replay the rendering + DF + masking + roll-up in plain Scala
    val docs = raw.map { case (id, src, text) =>
      (id, src, if (tmplSel(id)) render(id) else text)
    }
    val toks = docs.map { case (id, src, t) =>
      (id, src, t, t.split("\\s+").filter(_.nonEmpty)) }
    val nTotal = docs.length.toLong
    val df = toks.flatMap(_._4.distinct).groupBy(identity).view.mapValues(_.length.toLong)
    val vocab = df.filter { case (_, c) => c * 100 >= nTotal * 5 }.keys.toSet
    assert(vocab.size <= 4096, "fixture must stay under the broadcast cap")
    val expected = toks
      .map { case (_, src, t, tk) =>
        (tk.map(w => if (vocab(w)) w else "_").mkString(" "), src, t.length.toLong) }
      .groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).distinct.length.toLong, g.map(_._3).sum))
      .filter(_._2._1 >= 3L).toMap
    val q = TextQueries.queries("q201_template_mining")(spark, dir)
    val got = q.collect().map { r =>
      (r.getAs[String]("preview"), (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_sources"), r.getAs[Long]("n_chars"))) }.toMap
    val expByPreview = expected.map { case (sk, v) => (sk.take(60), v) }
    assert(got == expByPreview,
      s"cluster replay mismatch:\n got=$got\n exp=$expByPreview")
    // all four planted templates must be recovered (non-vacuous carve)
    val frames = Seq("please write a short essay", "translate the following",
      "summarize the article", "list five facts")
    frames.foreach(f => assert(got.keys.exists(_.startsWith(f)),
      s"planted template '$f' not recovered: ${got.keys}"))
    // slot tokens never survive masking into a reported cluster
    got.keys.foreach(p => assert(!p.matches(".*(topic|style)\\d.*"),
      s"slot token leaked into skeleton preview: '$p'"))
    // the vocab rides a broadcast into the map-side skeletonization —
    // the corpus is never shuffled to meet it
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"vocab must broadcast:\n$plan")
  }
}
