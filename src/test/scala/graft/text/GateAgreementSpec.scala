package graft.text

import graft.SparkTestBase

/** q146's agreement matrix cross-checked against the four standalone
  * gate queries it summarizes: every pair's four cells must tile the
  * common universe exactly, and each cell count must equal the count
  * derived by joining the standalone q104/q96/q97/q93 keep verdicts
  * doc-by-doc. (On the driver fixture every doc has ≥2 tokens, so
  * q146's shared-universe corpus statistics coincide with the
  * standalone queries' — asserted, not assumed.) */
class GateAgreementSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet"))

  test("q146 cells tile the universe and match the standalone gates") {
    assume(ready)
    // standalone verdicts, keyed by doc_id
    def keeps(q: String, keepIdx: Int): Map[Long, Boolean] =
      TextQueries.queries(q)(spark, dir).collect()
        .map(r => r.getLong(0) -> (r.get(keepIdx) match {
          case b: java.lang.Boolean => b.booleanValue
          case l: java.lang.Long    => l != 0L
        })).toMap
    val gopher = TextQueries.queries("q104_gopher_rules")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("keep"))).toMap
    val classifier = keeps("q96_quality_classifier", 3)
    val surprisal = keeps("q97_token_surprisal", 4)
    val rare = keeps("q93_rare_bigram_rate", 4)
    // the fixture must have no 1-token docs, else the shared-universe
    // corpus statistics would legitimately diverge from the standalone
    // queries' and this cross-check would not be exact
    val nToks = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "size(split(text, '\\\\s+')) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(!nToks.values.exists(_ == 1), "fixture grew 1-token docs; revisit spec")
    val universe = rare.keySet // q93's ≥2-token universe == q146's
    val byName = Map("gopher" -> gopher, "classifier" -> classifier,
      "surprisal" -> surprisal, "rare_bigram" -> rare)
    val got = TextQueries.queries("q146_gate_agreement")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.length == 6)
    got.foreach { case (a, b, both, aOnly, bOnly, neither, ppm) =>
      assert(both + aOnly + bOnly + neither == universe.size.toLong,
        s"($a,$b) cells don't tile the universe")
      val ga = byName(a); val gb = byName(b)
      val expBoth = universe.count(d => ga(d) && gb(d)).toLong
      val expAOnly = universe.count(d => ga(d) && !gb(d)).toLong
      val expBOnly = universe.count(d => !ga(d) && gb(d)).toLong
      assert((both, aOnly, bOnly) == ((expBoth, expAOnly, expBOnly)),
        s"($a,$b): got ($both,$aOnly,$bOnly) want ($expBoth,$expAOnly,$expBOnly)")
      assert(ppm == (both + neither) * 1000000L / universe.size)
    }
  }
}
