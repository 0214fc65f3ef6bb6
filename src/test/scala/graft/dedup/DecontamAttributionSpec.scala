package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q197 decontamination attribution: planted docs pin single-suite
  * attribution, multi-suite DOUBLE counting (attribution, not
  * deduplicated blame), clean-doc absence — and the fixture run pins
  * the consistency contract: the union of attributed docs over all
  * suites is exactly q81's contaminated set. */
class DecontamAttributionSpec extends SparkTestBase {

  private def docs(rows: Seq[(Long, String, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
  }

  test("q197: planted leaks attribute to exactly their suites") {
    // eval ids: 50 -> suite_1, 100 -> suite_2, 150 -> suite_0
    val fixture = Seq(
      (50L, "alpha beta gamma delta", "en", "e"),
      (100L, "uno dos tres cuatro", "en", "e"),
      (150L, "eins zwei drei vier", "en", "e"),
      // train docs
      (1L, "alpha beta gamma epsilon", "en", "s1"), // leaks suite_1 only
      (2L, "alpha beta gamma also uno dos tres here", "en", "s1"), // suites 1 AND 2
      (3L, "completely clean text nothing shared", "en", "s2"))
    val out = DedupQueries.attributionOf(docs(fixture)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // doc1 (4 toks) + doc2 (8 toks) hit suite_1 from s1
    assert(out(("suite_1", "s1")) == ((2L, 12L)), out)
    // doc2 alone hits suite_2
    assert(out(("suite_2", "s1")) == ((1L, 8L)), out)
    // suite_0's planted eval text leaks into no train doc; s2 is clean
    assert(!out.keys.exists(_._1 == "suite_0"), out)
    assert(!out.keys.exists(_._2 == "s2"), out)
    // double counting is the contract: doc2 appears under both suites
    assert(out.values.map(_._1).sum == 3L, "2 suite_1 docs + 1 suite_2 doc")
  }

  test("q197 on the fixture: suite union is exactly q81's contaminated set") {
    val dir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet")))
    val base = graft.core.Tables.documents(spark, dir)
    val hits = DedupQueries.attributionHitsOf(base).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(hits.nonEmpty)
    assert(hits.map(_._1).toSet.subsetOf(Set("suite_0", "suite_1", "suite_2")))
    val attributed = hits.map(_._2).toSet
    val trainIds = base.filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val keptByQ81 = graft.SparkEntry.queries("q81_decontaminate")(spark, dir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val contaminated = trainIds -- keptByQ81
    assert(attributed == contaminated,
      s"suite union (${attributed.size}) must tile q81's contaminated set (${contaminated.size})")
    // the matrix is the hits frame rolled up: doc counts agree per suite
    val matrix = DedupQueries.attributionOf(base).collect()
    val bySuiteMatrix = matrix.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    val bySuiteHits = hits.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(bySuiteMatrix == bySuiteHits.toMap)
  }
}
