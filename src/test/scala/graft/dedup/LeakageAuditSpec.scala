package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q190 leakage audit: planted pairs/assignments pin the counting
  * contract, and the structural guarantee — same-domain near-dup
  * pairs can NEVER straddle splits under the per-domain scheme — is
  * proven against the real q154 assignment on the fixture. */
class LeakageAuditSpec extends SparkTestBase {

  test("q190 core counts pairs per (scheme, sorted split-pair) and flags straddles") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("doc_a", "doc_b")
    val docSplit = Seq((1L, "train"), (2L, "test"), (3L, "val"), (4L, "val"),
      (5L, "train"), (6L, "train")).toDF("doc_id", "split")
    val domSplit = Seq((1L, "train"), (2L, "train"), (3L, "train"), (4L, "train"),
      (5L, "train"), (6L, "train")).toDF("doc_id", "split")
    val out = DedupQueries.leakageAuditOf(pairs, docSplit, domSplit).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("per_doc", "test", "train", 1L, 1L),   // sorted pair, flagged
      ("per_doc", "train", "train", 1L, 0L),
      ("per_doc", "val", "val", 1L, 0L),
      ("per_domain", "train", "train", 3L, 0L)), out.toSeq)
  }

  test("q190 structural guarantee: same-domain verified pairs never straddle under the per-domain scheme") {
    val dir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet")))
    val pairs = DedupQueries.verifiedPairs(spark, dir)
    val assign = UrlCanon.q154(spark, dir).select(col("doc_id"), col("domain"), col("split"))
    val joined = pairs
      .join(assign.select(col("doc_id").as("doc_a"), col("domain").as("dom_a"),
        col("split").as("split_a")), "doc_a")
      .join(assign.select(col("doc_id").as("doc_b"), col("domain").as("dom_b"),
        col("split").as("split_b")), "doc_b")
    val sameDomain = joined.filter(col("dom_a") === col("dom_b"))
    val straddling = sameDomain.filter(col("split_a") =!= col("split_b")).count()
    assert(straddling == 0L,
      "a domain is assigned atomically — same-domain pairs cannot straddle")
    // the audit rows on this fixture agree with a direct recount
    val audited = graft.SparkEntry.queries("q190_split_leakage")(spark, dir).collect()
      .filter(r => r.getString(0) == "per_domain").map(r => r.getLong(3)).sum
    assert(audited == joined.count(), "every verified pair is audited exactly once")
  }
}
