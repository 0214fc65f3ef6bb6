package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the skew tool for BIG-to-BIG joins where one (or
  * a few) join keys dominate the left side and the right side is too
  * large to broadcast but small enough to replicate a handful of times.
  *
  * A plain shuffle join sends every row of a hot key to ONE reducer:
  * at 100 TB a 30%-hot key serializes 30 TB through a single task —
  * the job is as slow as that task, and usually it just OOMs. Salting
  * splits the hot key across `saltBuckets` reducers:
  *
  *   left:  salt = xxhash64(entropy) mod S   (one row stays one row)
  *   right: each row replicated S times, once per salt value
  *   join:  on (keys…, salt) — the hot key now lands on S reducers
  *
  * Cost model: right side grows S×, left shuffle is unchanged, the hot
  * key's reducer work drops S×. Pick S ≈ (hot-key share) × (cluster
  * parallelism), small (8–64); this is the classic alternative when
  * AQE's skew-join mitigation can't help (it only splits MAP-side
  * partitions of sort-merge joins, not a reducer-side hash build).
  *
  * Join-type contract: the LEFT side keeps one row per input row and
  * every right match is present in exactly one salt bucket, so
  * `inner`, `left` (outer), `left_semi` and `left_anti` are
  * semantically IDENTICAL to the unsalted join (SaltedJoinSpec proves
  * all four). `right`/`full`/cross are rejected: an unmatched
  * replicated right row would surface S times.
  *
  * `entropy` must be a deterministic per-row expression of the left
  * frame (its primary key) — deterministic so task retries re-salt
  * identically; spread so the hot key actually fans out. xxhash64 is
  * fine here (no oracle ever sees the salt — it is dropped before
  * output, so cross-engine hash portability is not required).
  */
object SaltedJoin {
  private[rel] val SaltCol = "__graft_salt"

  /** Left frame + salt column in [0, saltBuckets). */
  private[rel] def saltLeft(left: DataFrame, entropy: Column, saltBuckets: Int): DataFrame =
    left.withColumn(SaltCol, pmod(xxhash64(entropy), lit(saltBuckets.toLong)))

  /** Right frame replicated once per salt value. */
  private[rel] def replicateRight(right: DataFrame, saltBuckets: Int): DataFrame =
    right.withColumn(SaltCol, explode(expr(s"sequence(0L, ${saltBuckets - 1}L)")))

  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           entropy: Column, saltBuckets: Int,
           joinType: String = "inner"): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    require(keys.nonEmpty, "salted join needs at least one equi-key")
    val jt = joinType.toLowerCase.replaceAll("[_\\s]", "") match {
      case "inner" => "inner"
      case "left" | "leftouter" => "left"
      case "leftsemi" | "semi" => "left_semi"
      case "leftanti" | "anti" => "left_anti"
      case _ => throw new IllegalArgumentException(
        s"salted join preserves semantics only for inner/left/left_semi/left_anti, got '$joinType'")
    }
    val joined = saltLeft(left, entropy, saltBuckets)
      .join(replicateRight(right, saltBuckets), keys :+ SaltCol, jt)
    joined.drop(SaltCol)
  }
}
