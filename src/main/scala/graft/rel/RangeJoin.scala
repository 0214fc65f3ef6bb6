package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized range join. Spark executes a `a.ts BETWEEN b.ts AND
  * b.ts + δ` join as BroadcastNestedLoop or a cartesian + filter —
  * quadratic per key and fatal at scale. The classic fix (Databricks'
  * range-join optimization, here as a library operator): quantize the
  * range dimension into δ-wide buckets, probe each row against its own
  * and its successor bucket (any pair within δ spans at most one
  * boundary), equi-join on the bucket id, then apply the exact
  * predicate. Work = hash join on (key, bucket) with 2× probe fan-out,
  * instead of |A|×|B| per key.
  */
object RangeJoin {

  /** Ordered same-key event pairs within `deltaSeconds` of each other:
    * (a, b) with a.ts < b.ts ≤ a.ts + δ (a strict, so a pair appears
    * once). Output: key, both payload columns `<payloadCol>_a/_b`,
    * both timestamps, and the gap in seconds. */
  def pairsWithin(events: DataFrame, keyCol: String, tsCol: String,
                  payloadCol: String, deltaSeconds: Long): DataFrame = {
    require(deltaSeconds > 0, s"deltaSeconds must be positive, got $deltaSeconds")
    val micros = deltaSeconds * 1000000L
    val bucketed = events.select(
      col(keyCol), col(tsCol), col(payloadCol),
      floor(unix_micros(col(tsCol)) / micros).as("__b"))
    // left probes its own and its successor bucket; right sits in its
    // own. The bucket id is part of the EQUI-join key — that is the
    // whole point: the shuffle hashes (key, bucket), never fanning out
    // beyond the 2× probe duplication.
    val probes = bucketed.select(col(keyCol), col(tsCol).as("ts_a"),
        col(payloadCol).as(s"${payloadCol}_a"),
        explode(array(col("__b"), col("__b") + 1)).as("__b"))
    val build = bucketed.select(col(keyCol), col(tsCol).as("ts_b"),
      col(payloadCol).as(s"${payloadCol}_b"), col("__b"))
    probes.join(build, Seq(keyCol, "__b"))
      .filter(col("ts_b") > col("ts_a") &&
        unix_micros(col("ts_b")) - unix_micros(col("ts_a")) <= micros)
      .select(col(keyCol), col(s"${payloadCol}_a"), col(s"${payloadCol}_b"),
        col("ts_a"), col("ts_b"),
        ((unix_micros(col("ts_b")) - unix_micros(col("ts_a"))) / 1e6).as("gap_s"))
  }
}
