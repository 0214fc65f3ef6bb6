package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — an operator Spark has no native primitive for
  * (pandas merge_asof / DuckDB ASOF JOIN / kdb aj): each left (probe)
  * row is matched to the single right (build) row with the largest
  * `tsCol` ≤ the probe's, per key.
  *
  * Implementation is union + window `last(_, ignoreNulls)`, NOT a range
  * join: a `l.ts >= r.ts` join explodes to |left|×|right| rows per key
  * before picking the max, while this shape is ONE hash exchange on
  * `keyCols` and a linear per-partition pass — at 100 TB the difference
  * between running and not finishing. Right rows sort before left rows
  * at equal ts (inclusive `>=` semantics).
  *
  * All carried values travel in a single struct, so the matched columns
  * always come from ONE right row (per-column `last` could mix rows
  * when a value column is legitimately null).
  *
  * Key-cardinality contract: [[backward]]'s window partitions by
  * `keyCols`, so its keys must be high-cardinality (an entity id, as
  * in q39's per-user join). For a MODAL key (a handful of values over
  * a huge frame) that shape serializes a key's whole timeline through
  * one task — [[backwardSharded]] decomposes it on the
  * [[graft.core.PrefixSum.keyedRank]] bucket pattern (time-range
  * shards + a carry-in from earlier shards), and [[backwardAuto]]
  * picks between the two from a one-row cardinality probe.
  */
object AsOfJoin {

  /** Tagged probe∪build union shared by both execution shapes: left
    * rows at __side 1, right rows at __side 0 with their carried
    * values packed into one `__r` struct. */
  private def tagged(left: DataFrame, right: DataFrame,
                     keyCols: Seq[String], tsCol: String,
                     valueCols: Seq[String], tieBreak: Seq[String]): (DataFrame, Seq[String]) = {
    val leftVals = left.columns.toSeq.filterNot(c => keyCols.contains(c) || c == tsCol)
    val packCols = (valueCols ++ tieBreak).distinct
    val packExpr = struct(packCols.map(col) :+ col(tsCol).as("__asof_ts"): _*)
    val packType = right.select(packExpr.as("__r")).schema.head.dataType
    val keyTs = (keyCols :+ tsCol).map(col)
    val lTagged = left.select(keyTs ++ Seq(lit(1).as("__side")) ++
      leftVals.map(col) :+ lit(null).cast(packType).as("__r"): _*)
    val rTagged = right.select(keyTs ++ Seq(lit(0).as("__side")) ++
      leftVals.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
      packExpr.as("__r"): _*)
    (lTagged.unionByName(rTagged), leftVals)
  }

  private def project(matched: DataFrame, keyCols: Seq[String], tsCol: String,
                      valueCols: Seq[String], leftVals: Seq[String]): DataFrame =
    matched.filter(col("__side") === 1)
      .select((keyCols :+ tsCol).map(col) ++ leftVals.map(col) ++
        valueCols.map(c => col(s"__m.$c").as(s"asof_$c")) :+
        col("__m.__asof_ts").as(s"asof_$tsCol"): _*)

  /** @param valueCols right columns carried to matched output rows
    *                  (each becomes `asof_<name>`, null when no right
    *                  row precedes the probe); `asof_<tsCol>` carries
    *                  the matched row's timestamp.
    * @param tieBreak  extra right-side ordering for equal-ts right
    *                  rows, the last winning — make it unique (an
    *                  event id) for deterministic output. */
  def backward(left: DataFrame, right: DataFrame,
               keyCols: Seq[String], tsCol: String,
               valueCols: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {
    val (union, leftVals) = tagged(left, right, keyCols, tsCol, valueCols, tieBreak)
    backwardImpl(union, leftVals, keyCols, tsCol, valueCols, tieBreak)
  }

  private def backwardImpl(union: DataFrame, leftVals: Seq[String],
                           keyCols: Seq[String], tsCol: String,
                           valueCols: Seq[String], tieBreak: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol) +: col("__side") +: tieBreak.map(c => col(s"__r.$c")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    project(union.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w)),
      keyCols, tsCol, valueCols, leftVals)
  }

  /** [[backward]] for MODAL keys — same semantics, no full-key-
    * partition window. The union is cut into `targetShards` time-range
    * shards (the [[graft.core.PrefixSum.keyedRank]] decomposition:
    * shard = monotone function of `tsCol`, so equal timestamps never
    * straddle a boundary and per-key shard order equals time order):
    *
    *   match(row) = lastRight(key, shard, ≤ row)          within-shard window
    *              ∨ carry(key, shard)                     last right row of
    *                                                      earlier shards
    *
    * The within-shard window partitions by (key, shard) — bounded
    * work per task no matter how modal the key. The carry is computed
    * on the (key, shard) frame (≤ targetShards rows per key), and the
    * carry join keys on (key, shard) — the exact partitioning the
    * within-shard window just produced, so Catalyst reuses the
    * exchange. AsOfJoinSpec pins result equality with [[backward]]
    * and that no window partitions the full union by the key alone.
    *
    * `tsCol` must cast losslessly-enough to long for MONOTONE shard
    * assignment (numeric or timestamp; sub-second truncation only
    * coarsens shards, never reorders them). */
  def backwardSharded(left: DataFrame, right: DataFrame,
                      keyCols: Seq[String], tsCol: String,
                      valueCols: Seq[String], tieBreak: Seq[String] = Nil,
                      targetShards: Int = 1024): DataFrame = {
    require(targetShards >= 1, s"targetShards must be >= 1, got $targetShards")
    val (union, leftVals) = tagged(left, right, keyCols, tsCol, valueCols, tieBreak)
    val cached = graft.core.ScratchCache.persist(union)
    val mm = cached.agg(min(col(tsCol).cast("long")), max(col(tsCol).cast("long"))).head()
    shardedImpl(cached, leftVals, keyCols, tsCol, valueCols, tieBreak,
      targetShards, tsBounds(mm, 0), tsBounds(mm, 1))
  }

  /** Null-safe long extraction from a bounds/stats row (empty union →
    * null min/max → 0; the result frame is empty either way). */
  private def tsBounds(row: org.apache.spark.sql.Row, i: Int): Long =
    if (row.isNullAt(i)) 0L else row.getLong(i)

  /** `union` MUST be persisted by the caller — it is read three times
    * below (within-shard window, per-shard last, shard universe), and
    * the caller's 1-row bounds/dispatch action is what materializes the
    * cache. `tsMin`/`tsMax` arrive as DRIVER-SIDE planning statistics
    * (the [[SaltedJoin.detectHotKeys]] discipline) so the shard id is a
    * pure LITERAL expression over `tsCol` — earlier rounds computed the
    * bounds as an aggregate subtree crossJoin-broadcast into every
    * consumer, which cost an extra pass over the union plus a broadcast
    * exchange embedded three times in the final plan (r11 verdict:
    * q127's 1.4× regression traced to exactly this planning overhead).
    * Shard arithmetic stays DECIMAL(21,0): a full-Long ts span
    * overflows 64-bit subtraction, and width is computed in BigInt for
    * the same reason. */
  private def shardedImpl(union: DataFrame, leftVals: Seq[String],
                          keyCols: Seq[String], tsCol: String,
                          valueCols: Seq[String], tieBreak: Seq[String],
                          targetShards: Int, tsMin: Long, tsMax: Long): DataFrame = {
    val width = ((BigInt(tsMax) - BigInt(tsMin) + targetShards) / targetShards).max(BigInt(1))
    val sharded = union.withColumn("__shard",
      expr(s"(CAST(CAST($tsCol AS BIGINT) AS DECIMAL(21,0)) - CAST($tsMin AS DECIMAL(21,0))) DIV $width"))

    val wIn = Window.partitionBy(keyCols.map(col) :+ col("__shard"): _*)
      .orderBy(col(tsCol) +: col("__side") +: tieBreak.map(c => col(s"__r.$c")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withIn = sharded.withColumn("__m_in", last(col("__r"), ignoreNulls = true).over(wIn))

    // per-(key, shard) last right row; keys renamed so the only window
    // partitioned by key alone runs over this bounded shard frame
    val ak = keyCols.map(k => s"__ak_$k")
    val rOrd = struct(col(tsCol) +: tieBreak.map(c => col(s"__r.$c")): _*)
    val shardLast = sharded.filter(col("__side") === 0)
      .groupBy(keyCols.map(col) :+ col("__shard"): _*)
      .agg(max_by(col("__r"), rOrd).as("__sl"))
      .select(keyCols.map(k => col(k).as(s"__ak_$k")) :+ col("__shard").as("__as") :+ col("__sl"): _*)
    val allShards = sharded.select(keyCols.map(col) :+ col("__shard"): _*).distinct()
      .select(keyCols.map(k => col(k).as(s"__ak_$k")) :+ col("__shard").as("__as"): _*)
    val wCarry = Window.partitionBy(ak.map(col): _*).orderBy(col("__as"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = allShards.join(shardLast, ak :+ "__as", "left")
      .withColumn("__carry", last(col("__sl"), ignoreNulls = true).over(wCarry))
      .drop("__sl")

    val joinCond = keyCols.zip(ak).map { case (k, a) => col(k) === col(a) }
      .reduce(_ && _) && col("__shard") === col("__as")
    val matched = withIn.join(carry, joinCond, "left")
      .withColumn("__m", coalesce(col("__m_in"), col("__carry")))
    project(matched, keyCols, tsCol, valueCols, leftVals)
  }

  /** Probe-dispatched as-of: one map-combinable (count, approx distinct
    * keys) aggregate — a 1-row planning statistic, the
    * [[SaltedJoin.detectHotKeys]] discipline — then [[backward]] when
    * keys are plentiful, [[backwardSharded]] when the average key would
    * funnel more than `maxAvgRowsPerKey` union rows through one window
    * task.
    *
    * The probe runs over the PERSISTED tagged union the chosen join
    * shape then consumes, not a separate scan of the two key frames:
    * the probe's action is what materializes the cache, so the dispatch
    * statistic costs one cache read instead of a whole extra pass over
    * both inputs (r11 verdict: that pass made q127 1.4× its r9 time).
    * The same 1-row probe also carries min/max ts, so the sharded
    * branch needs no further bounds pass at all. */
  def backwardAuto(left: DataFrame, right: DataFrame,
                   keyCols: Seq[String], tsCol: String,
                   valueCols: Seq[String], tieBreak: Seq[String] = Nil,
                   maxAvgRowsPerKey: Long = 65536, targetShards: Int = 1024): DataFrame = {
    require(maxAvgRowsPerKey >= 1, s"maxAvgRowsPerKey must be >= 1, got $maxAvgRowsPerKey")
    require(targetShards >= 1, s"targetShards must be >= 1, got $targetShards")
    val (union, leftVals) = tagged(left, right, keyCols, tsCol, valueCols, tieBreak)
    val cached = graft.core.ScratchCache.persist(union)
    val stats = cached
      .agg(count(lit(1)).as("n"),
        approx_count_distinct(struct(keyCols.map(col): _*)).as("d"),
        min(col(tsCol).cast("long")).as("ts_min"),
        max(col(tsCol).cast("long")).as("ts_max"))
      .head()
    val modal = stats.getLong(0) > maxAvgRowsPerKey * math.max(1L, stats.getLong(1))
    if (modal) shardedImpl(cached, leftVals, keyCols, tsCol, valueCols, tieBreak,
      targetShards, tsBounds(stats, 2), tsBounds(stats, 3))
    else backwardImpl(cached, leftVals, keyCols, tsCol, valueCols, tieBreak)
  }
}
