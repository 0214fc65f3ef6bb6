package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running total over a globally ordered frame — the
  * building block for "greedy selection under a budget" (q101) and any
  * other corpus-wide prefix aggregate.
  *
  * A naive `sum(v) OVER (ORDER BY key DESC, id)` moves the WHOLE frame
  * through one partition. Partitioning the window by `key` alone
  * (cum = per-key prefix + broadcast per-key offsets) fixes the common
  * case but leaves a skew hazard: every row sharing the modal key —
  * e.g. millions of empty-ish documents all scoring 0 — still
  * serializes through a single partition. This helper decomposes the
  * sum THREE ways, so no frame bigger than a bounded shard crosses an
  * unpartitioned window:
  *
  *   cum(row) = keyOffset(key)            tiny: one row per distinct key
  *            + shardOffset(key, shard)   ≤ targetShards rows per key
  *            + within(key, shard, id)    window over one id-range shard
  *
  * `shard = (id − minId) DIV ceil(idRange / targetShards)` is monotone
  * in `id`, so per-key shard order equals id order and the three-level
  * sum telescopes to the global running total. The shard-offset join
  * keys on (key, shard) — the same keys the within-shard window just
  * hash-partitioned the big side by, so Catalyst reuses that exchange
  * instead of reshuffling it (pinned in PrefixSumSpec). Only the
  * per-key totals (distinct-key cardinality) cross the one
  * unpartitioned window, and they ride back on a broadcast.
  *
  * The caller should persist `df` — three branches (bounds, shard
  * totals, the sharded frame itself) read it; unpersisted, each is a
  * full input re-scan at corpus scale (q101 feeds its ScratchCache'd
  * scored frame).
  *
  * Rows must be unique by (key, id); `id` is the tiebreak. */
object PrefixSum {

  /** Adds `cumCol` = running sum of `valCol` over rows ordered by
    * (`keyCol` DESC, `idCol` ASC). `keyCol`, `idCol`, `valCol` must be
    * integral; `idCol` unique per key. */
  def runningTotal(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      valCol: String,
      cumCol: String,
      targetShards: Int = 1024): DataFrame = {
    require(targetShards >= 1, s"targetShards must be >= 1, got $targetShards")
    val key: Column = col(keyCol)
    val id: Column = col(idCol)

    // id-range shard: bounds derived from the data (1-row aggregate on
    // a broadcast cross join — no driver collect). Ids are biased into
    // unsigned order as DECIMAL(21,0) — wide enough for the full 2^64
    // span — because 64-bit-hash ids legitimately span most of the
    // Long range, where a raw `max - min` difference wraps negative
    // and silently breaks shard monotonicity.
    val bias = "9223372036854775808" // 2^63: Long.MinValue → 0
    def biased(c: String) = s"(CAST($c AS DECIMAL(21,0)) + $bias)"
    // width via DECIMAL floor-division, NOT `DIV`: IntegralDivide
    // forces a LONG result, and a full-Long id span (range ≈ 2^64)
    // with targetShards ≤ 2 overflows it to NULL — greatest() then
    // skips the NULL, ps_w collapses to 1, and the shard expression
    // itself overflows, silently dropping rows at the offset join
    val bounds = df
      .agg(expr(s"${biased(s"min(`$idCol`)")}").as("ps_min_b"),
        expr(s"${biased(s"max(`$idCol`)")}").as("ps_max_b"))
      .select(col("ps_min_b"),
        greatest(lit(1L).cast("decimal(21,0)"),
          expr(s"CAST(floor((ps_max_b - ps_min_b + $targetShards) / $targetShards) AS DECIMAL(21,0))")).as("ps_w"))
    // persisted: three branches (within-shard window, shard totals,
    // key totals) read the sharded frame — one materialization, not
    // three crossJoin+DIV recomputes (drained by the query runners)
    val sharded = ScratchCache.persist(df.crossJoin(broadcast(bounds))
      .withColumn("ps_shard", expr(s"(${biased(s"`$idCol`")} - ps_min_b) DIV ps_w"))
      .drop("ps_min_b", "ps_w"))

    val wIn = Window.partitionBy(key, col("ps_shard")).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withIn = sharded.withColumn("ps_in", sum(col(valCol)).over(wIn))

    // per-(key, shard) totals → offsets of earlier shards within the key
    val shardTot = sharded.groupBy(key.as("ps_k"), col("ps_shard").as("ps_s"))
      .agg(sum(col(valCol)).as("ps_st"))
    val wShard = Window.partitionBy(col("ps_k")).orderBy(col("ps_s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val shardOff = shardTot
      .withColumn("ps_soff", coalesce(sum(col("ps_st")).over(wShard), lit(0L)))
      .select(col("ps_k"), col("ps_s"), col("ps_soff"))

    // per-key totals → offsets of higher keys; distinct-key-sized
    // frame, the ONLY unpartitioned window, broadcast back.
    // Cardinality bound (r22 audit): one row per DISTINCT key value —
    // callers key on quantized scores/classes (bounded vocabularies),
    // never on row-unique ids, so this frame is orders of magnitude
    // below the input row count by contract.
    val keyTot = shardTot.groupBy(col("ps_k").as("ps_k2")).agg(sum(col("ps_st")).as("ps_kt"))
    val wKey = Window.orderBy(col("ps_k2").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val keyOff = keyTot
      .withColumn("ps_koff", coalesce(sum(col("ps_kt")).over(wKey), lit(0L)))
      .select(col("ps_k2"), col("ps_koff"))

    withIn
      .join(shardOff, key === col("ps_k") && col("ps_shard") === col("ps_s"))
      .join(broadcast(keyOff), key === col("ps_k2"))
      .withColumn(cumCol, (col("ps_koff") + col("ps_soff") + col("ps_in")).cast("long"))
      .drop("ps_shard", "ps_in", "ps_k", "ps_s", "ps_soff", "ps_k2", "ps_koff")
  }

  /** Adds `rnCol` = `row_number() OVER (PARTITION BY keyCol ORDER BY
    * orderCols)` (1-based, long) without ever sorting a full key
    * partition in one task — the fix for MODAL partition keys (a
    * 3-value status column, a boolean flag), where the plain window
    * funnels |frame| / |distinct keys| rows through a single sort at
    * scale no matter how many executors exist.
    *
    * Same decomposition discipline as [[runningTotal]], one level
    * shorter (ranks are per-key, so no cross-key offsets):
    *
    *   rn(row) = shardOffset(key, shard)   rows in earlier shards of this key
    *           + row_number within (key, shard)
    *
    * `ordProxy` must be an integral column MONOTONE in the `orderCols`
    * prefix order (equal orderCols ⇒ equal proxy; a < b in order ⇒
    * proxy(a) ≤ proxy(b)) — e.g. `(price * 100).cast("long")` for a
    * double price. Rows sharing a proxy value land in one shard, where
    * the real `orderCols` sort settles them, so proxy collisions cost
    * skew only, never correctness. The shard-offset window partitions
    * by key over the SHARD-TOTALS frame — at most `targetShards` rows
    * per key partition regardless of data size — and the offset join
    * keys on (key, shard), the exact partitioning the within-shard
    * window just produced, so Catalyst reuses that exchange. No window
    * in the resulting plan partitions the full input by `keyCol`
    * alone (pinned in PrefixSumSpec).
    *
    * PRECONDITION: `keyCol` and `ordProxy` must be NON-NULL — the
    * shard-offset join uses plain equality, so a NULL key or proxy
    * would silently drop the row (a bare window would instead keep
    * NULL keys as their own partition). Callers with nullable keys
    * must coalesce to a sentinel first. */
  def keyedRank(
      df: DataFrame,
      keyCol: String,
      ordProxy: Column,
      orderCols: Seq[Column],
      rnCol: String,
      targetShards: Int = 1024): DataFrame = {
    require(targetShards >= 1, s"targetShards must be >= 1, got $targetShards")
    val key: Column = col(keyCol)

    val bias = "9223372036854775808" // 2^63: Long.MinValue → 0
    val proxied = df.withColumn("ps_ord", ordProxy.cast("long"))
    def biased(c: String) = s"(CAST($c AS DECIMAL(21,0)) + $bias)"
    // DECIMAL floor-division for the width — see [[runningTotal]]'s
    // bounds comment (DIV's Long result overflows on a full-Long span)
    val bounds = proxied
      .agg(expr(biased("min(ps_ord)")).as("ps_min_b"),
        expr(biased("max(ps_ord)")).as("ps_max_b"))
      .select(col("ps_min_b"),
        greatest(lit(1L).cast("decimal(21,0)"),
          expr(s"CAST(floor((ps_max_b - ps_min_b + $targetShards) / $targetShards) AS DECIMAL(21,0))")).as("ps_w"))
    val sharded = ScratchCache.persist(proxied.crossJoin(broadcast(bounds))
      .withColumn("ps_shard", expr(s"(${biased("ps_ord")} - ps_min_b) DIV ps_w"))
      .drop("ps_min_b", "ps_w"))

    val wIn = Window.partitionBy(key, col("ps_shard")).orderBy(orderCols: _*)
    val withIn = sharded.withColumn("ps_rn", row_number().over(wIn).cast("long"))

    val shardTot = sharded.groupBy(key.as("ps_k"), col("ps_shard").as("ps_s"))
      .agg(count(lit(1)).as("ps_ct"))
    val wShard = Window.partitionBy(col("ps_k")).orderBy(col("ps_s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val shardOff = shardTot
      .withColumn("ps_soff", coalesce(sum(col("ps_ct")).over(wShard), lit(0L)))
      .select(col("ps_k"), col("ps_s"), col("ps_soff"))

    withIn
      .join(shardOff, key === col("ps_k") && col("ps_shard") === col("ps_s"))
      .withColumn(rnCol, col("ps_soff") + col("ps_rn"))
      .drop("ps_ord", "ps_shard", "ps_rn", "ps_k", "ps_s", "ps_soff")
  }
}
