package graft.dedup

import graft.SparkTestBase

/** The q94 incremental contract: a corpus-signature artifact written by
  * run N must let run N+1 ingest a batch WITHOUT re-shingling the
  * corpus, and produce exactly the recompute-both-sides answer —
  * because the artifact stores UNCAPPED band rows and the consumer
  * re-applies the bucket cap over the batch∪corpus union, the two
  * paths share cap semantics bit-for-bit. */
class IncrementalDedupSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet"))

  test("artifact round-trip: incremental result is bit-identical to the recompute path") {
    assume(ready)
    val path = java.nio.file.Files.createTempDirectory("graft-sigstore").toString
    DedupQueries.writeCorpusSignatures(spark, dir, path)
    val direct = DedupQueries.queries("q94_incremental_dedup")(spark, dir)
      .collect().map(_.toSeq).toSeq
    graft.core.ScratchCache.drain()
    val incr = DedupQueries.q94Incremental(spark, dir, path)
      .collect().map(_.toSeq).toSeq
    assert(incr.nonEmpty, "incremental run returned no batch docs")
    assert(incr == direct,
      s"incremental vs direct diverged; first diff: ${
        incr.zip(direct).find { case (a, b) => a != b }}")
  }

  test("the corpus branch reads the parquet artifact, not documents") {
    assume(ready)
    val path = java.nio.file.Files.createTempDirectory("graft-sigstore2").toString
    DedupQueries.writeCorpusSignatures(spark, dir, path)
    graft.core.ScratchCache.drain()
    val plan = DedupQueries.q94Incremental(spark, dir, path)
      .queryExecution.executedPlan.toString
    assert(plan.contains(s"$path/bands"), s"corpus bands not read from artifact:\n$plan")
    assert(plan.contains(s"$path/sets"), s"corpus sets not read from artifact:\n$plan")
    // every documents scan must carry the batch-carve predicate AS A
    // DATA FILTER ON THE SCAN — i.e. only the ~1/8 batch rows ever
    // reach shingling/hashing. The recompute path can't have this
    // (it materializes is_batch as a column and filters per-branch
    // after the shared cache), so its presence on every scan IS the
    // proof that no corpus doc is re-processed.
    val docScanLines = plan.linesIterator.filter(l =>
      l.contains("FileScan parquet") && l.contains("documents.parquet")).toList
    assert(docScanLines.nonEmpty, s"no documents scan found (batch side must read it):\n$plan")
    assert(docScanLines.forall(_.contains("DataFilters: [substring(md5(")),
      s"a documents scan without the batch-carve filter — corpus side re-read documents:\n${
        docScanLines.mkString("\n")}")
  }

  test("artifact stores uncapped bands with the expected schema") {
    assume(ready)
    val path = java.nio.file.Files.createTempDirectory("graft-sigstore3").toString
    DedupQueries.writeCorpusSignatures(spark, dir, path)
    val bands = spark.read.parquet(s"$path/bands")
    val sets = spark.read.parquet(s"$path/sets")
    assert(bands.columns.sorted.toSeq == Seq("band_key", "band_no", "doc_id"))
    assert(sets.columns.sorted.toSeq == Seq("doc_id", "sset"))
    assert(bands.count() > 0 && sets.count() > 0)
    // every corpus doc carries K/2 = 4 band rows (uncapped write)
    val perDoc = bands.groupBy("doc_id").count().select("count").distinct().collect()
    assert(perDoc.map(_.getLong(0)).toSet == Set(4L),
      s"expected exactly 4 band rows per doc: ${perDoc.mkString(",")}")
  }
}
