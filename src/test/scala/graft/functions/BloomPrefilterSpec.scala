package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins q130's Bloom pre-filter contract: the codegen'd membership
  * probe has ZERO false negatives against a `stat.bloomFilter`-built
  * sketch (the exactness precondition for prune-then-confirm) and a
  * false-positive rate near the configured fpp. */
class BloomPrefilterSpec extends SparkTestBase {

  test("zero false negatives: every inserted key probes true") {
    import spark.implicits._
    val present = (0 until 20000).map(i => s"shingle $i of doc ${i % 97}")
    val bf = present.toDF("s").stat.bloomFilter("s", 20000L, 0.01)
    val misses = present.toDF("s")
      .filter(!GraftFunctions.bloomMightContain(spark, $"s", bf))
      .count()
    assert(misses == 0L, s"$misses false negatives — Bloom prune would drop true hits")
  }

  test("false positives near the configured fpp, so the confirm join stays small") {
    import spark.implicits._
    val present = (0 until 20000).map(i => s"shingle-$i")
    val bf = present.toDF("s").stat.bloomFilter("s", 20000L, 0.01)
    val hits = (0 until 20000).map(i => s"absent-$i").toDF("s")
      .filter(GraftFunctions.bloomMightContain(spark, $"s", bf))
      .count()
    val rate = hits / 20000.0
    assert(rate < 0.05, s"fp rate $rate far above configured 0.01")
  }

  test("null values are filtered out, not probed") {
    import spark.implicits._
    val bf = Seq("a").toDF("s").stat.bloomFilter("s", 10L, 0.01)
    val out = Seq(Some("a"), None, Some("zzz-definitely-absent-key"))
      .toDF("s")
      .filter(GraftFunctions.bloomMightContain(spark, $"s", bf))
      .collect().map(_.getString(0))
    assert(out.contains("a") && !out.contains(null))
  }

  test("q130 equals q81 row for row (Bloom path is exact)") {
    assume(java.nio.file.Files.exists(
      java.nio.file.Paths.get("/root/testdata/sf0.001/documents.parquet")))
    val dir = "/root/testdata/sf0.001"
    val viaBloom = graft.dedup.DedupQueries.queries("q130_decontaminate_bloom")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val exact = graft.dedup.DedupQueries.queries("q81_decontaminate")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(viaBloom == exact)
    assert(viaBloom.nonEmpty)
  }
}
