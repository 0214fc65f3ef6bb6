package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q94's incremental (batch-vs-corpus) dedup invariants: full batch
  * accounting, matches only ever point INTO the corpus, the verdict is
  * consistent with the reported best Jaccard, and a planted
  * cross-split exact duplicate is flagged with Jaccard 1.0. */
class IncrementalDedupSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet"))

  private def batchIds: Set[Long] = {
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"))
      .filter(substring(md5(concat(lit("batch|"), col("doc_id").cast("string"))), 1, 1).isin("0", "1"))
      .collect().map(_.getLong(0)).toSet
  }

  test("q94 accounts for every batch doc and verdicts are consistent") {
    assume(ready)
    val ids = batchIds
    val rows = DedupQueries.queries("q94_incremental_dedup")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getLong(4)))
    assert(rows.map(_._1).toSet == ids, "exactly one row per batch doc")
    rows.foreach { case (id, nCand, mDoc, mJac, isNew) =>
      assert(nCand >= 0)
      assert(mDoc.isDefined == mJac.isDefined, s"doc $id: match doc/jaccard must be paired")
      if (nCand == 0) assert(mDoc.isEmpty, s"doc $id: no candidates but a match")
      else assert(mDoc.isDefined, s"doc $id: candidates but no best match")
      mDoc.foreach(m => assert(!ids.contains(m), s"doc $id: match $m must be a CORPUS doc"))
      val expectNew = mJac.forall(_ < 0.7)
      assert((isNew == 1L) == expectNew, s"doc $id: is_new=$isNew vs jaccard=$mJac")
    }
  }

  test("q94 flags a planted cross-split exact duplicate at jaccard 1.0") {
    assume(ready)
    val ids = batchIds
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // plant: copy one corpus doc's text onto a fresh batch-side id
    val corpusRow = docs.filter(!col("doc_id").isin(ids.toSeq: _*)).orderBy("doc_id").limit(1)
      .collect().head
    // find an unused id that hashes into the batch split
    val used = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val freshId = Iterator.from(1000000).map(_.toLong)
      .find { id =>
        !used.contains(id) && {
          val d = java.security.MessageDigest.getInstance("MD5")
            .digest(s"batch|$id".getBytes("UTF-8"))
          "0123456789abcdef".charAt((d(0) >> 4) & 0xf) <= '1'
        }
      }.get
    val planted = docs.unionByName(
      spark.createDataFrame(java.util.List.of(corpusRow), docs.schema)
        .withColumn("doc_id", lit(freshId)))
    val tmp = java.nio.file.Files.createTempDirectory("graft-incdedup").toString
    planted.write.parquet(s"$tmp/documents.parquet")
    val out = DedupQueries.queries("q94_incremental_dedup")(spark, tmp)
      .filter(col("doc_id") === freshId).collect()
    assert(out.length == 1, "planted batch doc must report")
    val r = out.head
    assert(!r.isNullAt(3) && r.getDouble(3) == 1.0, s"exact dup must verify at 1.0, got $r")
    assert(r.getLong(4) == 0L, "exact dup must not be is_new")
  }
}
