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
  * Key-cardinality caveat: the window partitions by `keyCols`, so the
  * caller's keys must be high-cardinality (an entity id, as in q39's
  * per-user join). For a MODAL key (a handful of values over a huge
  * frame) this shape serializes a key's whole timeline through one
  * task — decompose on [[graft.core.PrefixSum.keyedRank]]'s bucket
  * pattern instead (the q109/q110 treatment).
  */
object AsOfJoin {

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
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol) +: col("__side") +: tieBreak.map(c => col(s"__r.$c")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(keyTs ++ leftVals.map(col) ++
        valueCols.map(c => col(s"__m.$c").as(s"asof_$c")) :+
        col("__m.__asof_ts").as(s"asof_$tsCol"): _*)
  }
}
