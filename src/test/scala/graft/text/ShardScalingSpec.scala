package graft.text

import graft.SparkTestBase

/** q80's packing shard count is derived from corpus size (n_shards =
  * ceil(total_chunk_tokens / target)) rather than a constant: a fixed
  * K pins per-shard window width to corpus/K, which at 100 TB
  * serializes corpus/K tokens through each of K windows. This spec
  * pins the scaling contract: doubling the corpus doubles the shard
  * count, and per-shard token width stays bounded near the target
  * instead of doubling with the data.
  */
class ShardScalingSpec extends SparkTestBase {

  private val target = 512L

  // 64 docs × 100 tokens; stride-24/len-32 chunking yields 128 chunk
  // tokens per doc => 8192 total => exactly 16 shards at target 512.
  private def docs(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, (1 to 100).map(t => s"t$t").mkString(" ")))
      .toDF("doc_id", "text")
  }

  private def shardWidths(nDocs: Int): Map[Long, Long] = {
    import org.apache.spark.sql.functions._
    TextQueries.packChunksOf(docs(nDocs), targetShardTokens = target)
      .groupBy("shard").agg(sum("n_chunk_tokens").as("toks"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("doubling the corpus doubles the shard count, not the shard width") {
    val w1 = shardWidths(64)
    val w2 = shardWidths(128)
    assert(w1.size == 16, s"64 docs x 128 chunk tokens / $target => 16 shards, got ${w1.size}")
    assert(w2.size == 32, s"doubled corpus must double shards, got ${w2.size}")
    // per-shard width stays pinned near the target at BOTH scales —
    // the whole point of deriving the count from the data
    (w1.values ++ w2.values).foreach { toks =>
      assert(toks <= 2 * target, s"per-shard width $toks exceeds 2x target $target")
    }
  }

  test("packing is partition-count invariant (shard count from a global aggregate, bins from keyed windows)") {
    def packed(parts: Int) = TextQueries.packChunksOf(docs(64).repartition(parts), targetShardTokens = target)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(4), r.getLong(5))).toSet
    assert(packed(1) == packed(13),
      "offsets/bins must not depend on physical partitioning")
    graft.core.ScratchCache.drain()
  }
}
