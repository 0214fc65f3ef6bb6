package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q182 datasheet: the driver corpus has no exact duplicates, so the
  * dup columns are an oracle-checked zero there — this spec plants
  * real duplicates (including a CROSS-source pair) and a lang tie to
  * pin the non-zero paths and the tie-break the oracle hash can't
  * name. */
class DatasheetSpec extends SparkTestBase {

  private def df(rows: Seq[(String, String, String)]) = {
    import spark.implicits._
    rows.toDF("source", "lang", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  test("q182 core: planted duplicates counted per holding source, cross-source dups count on both sides") {
    val rows = Seq(
      // srcA: 3 docs, two sharing identical text (intra-source dup pair)
      ("srcA", "en", "the same text"),
      ("srcA", "en", "the same text"),
      ("srcA", "de", "ein anderes dokument"),
      // srcB: 2 docs, one duplicating a srcC doc (cross-source dup)
      ("srcB", "fr", "texte partage"),
      ("srcB", "fr", "unique b"),
      // srcC: 1 doc, the other half of the cross-source pair
      ("srcC", "es", "texte partage"))
    val out = TextQueries.datasheetOf(df(rows)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(5), r.getLong(7), r.getLong(8))).toMap
    assert(out("srcA") == ((3L, "en", 2L, 666666L)), out("srcA"))
    assert(out("srcB") == ((2L, "fr", 1L, 500000L)), out("srcB"))
    assert(out("srcC") == ((1L, "es", 1L, 1000000L)), out("srcC"))
  }

  test("q182 core: token totals are whitespace-token sums and lang mode ties break lexicographically") {
    val rows = Seq(
      ("s", "zh", "one two  three"),   // 3 tokens despite double space
      ("s", "de", "vier"),             // tie: de=1, zh=1 → modal 'de'
      ("t", "en", "a b"), ("t", "en", "c"), ("t", "fr", "d e f"))
    val out = TextQueries.datasheetOf(df(rows)).collect()
      .map(r => r.getString(0) -> (r.getLong(4), r.getString(5), r.getLong(6))).toMap
    assert(out("s") == ((4L, "de", 500000L)), out("s"))
    assert(out("t") == ((6L, "en", 666666L)), out("t"))
  }

  test("q182 catalog plan: only digests shuffle for the dup check, text never reaches an exchange") {
    val dir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet")))
    val p = graft.SparkEntry.queries("q182_source_datasheet")(spark, dir)
      .queryExecution.executedPlan.toString
    // the persisted projection already replaced text with md5(text) at
    // the scan, so no exchange key and no aggregate input/output row may
    // carry the raw text column (the plan tree prints the scan below
    // the exchanges — check the operator lines, not the whole subtree)
    val hot = p.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning") || l.contains("HashAggregate"))
    hot.foreach(l => assert(!l.contains("text#"), l))
    // the narrow projection is either inlined (md5 at the scan) or
    // served from the ScratchCache's in-memory relation — both prove
    // the raw text never outlives the first projection
    assert(p.contains("md5(text") || p.contains("InMemoryTableScan"), p)
  }
}
