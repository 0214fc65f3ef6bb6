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
  private[rel] val SaltNCol = "__graft_salt_n"

  private def normalize(joinType: String): String =
    joinType.toLowerCase.replaceAll("[_\\s]", "") match {
      case "inner" => "inner"
      case "left" | "leftouter" => "left"
      case "leftsemi" | "semi" => "left_semi"
      case "leftanti" | "anti" => "left_anti"
      case _ => throw new IllegalArgumentException(
        s"salted join preserves semantics only for inner/left/left_semi/left_anti, got '$joinType'")
    }

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
    val jt = normalize(joinType)
    val joined = saltLeft(left, entropy, saltBuckets)
      .join(replicateRight(right, saltBuckets), keys :+ SaltCol, jt)
    joined.drop(SaltCol)
  }

  /** Observed-skew statistics: the hot keys of `left` and a per-key
    * salt count derived from how many average-partition units each
    * occupies — so [[joinAuto]] needs no prior knowledge of the skew.
    *
    * One map-combinable count aggregate over the left frame (output =
    * |distinct keys| rows, the same cardinality any grouped query
    * shuffles), a 1-row total, and a top-`topN` pick by frequency —
    * the bounded, AQE-style planning cost. A key is HOT when its count
    * exceeds one average partition's share (total / parallelism); its
    * salt count is ⌈count / (total / parallelism)⌉ — the number of
    * partition-units it must fan out to — capped at `maxSalt` so the
    * right-side replication factor stays bounded.
    *
    * Returns (keys…, [[SaltNCol]]) for the hot keys only — at most
    * `topN` rows, always broadcastable. Empty frame = no skew. */
  def detectHotKeys(left: DataFrame, keys: Seq[String],
                    parallelism: Int, maxSalt: Int = 64,
                    topN: Int = 100): DataFrame = {
    require(parallelism >= 1 && maxSalt >= 1 && topN >= 1, "positive stats parameters required")
    val spark = left.sparkSession
    val cnt = graft.core.ScratchCache.persist(
      left.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__cnt")))
    // sum over an EMPTY frame is NULL — coalesce before the Long read
    // so an empty batch degrades to "no hot keys", not an NPE
    val total = math.max(1L,
      cnt.agg(coalesce(sum(col("__cnt")), lit(0L))).collect()(0).getLong(0))
    // secondary sort on the keys: the topN cut is otherwise tie-broken
    // by partition order, so two runs over the same data could emit
    // DIFFERENT hot-key artifacts at the count boundary
    cnt.orderBy(col("__cnt").desc +: keys.map(col): _*).limit(topN)
      .withColumn(SaltNCol,
        least(lit(maxSalt.toLong),
          ceil(col("__cnt") * parallelism / lit(total.toDouble))).cast("int"))
      .filter(col(SaltNCol) >= 2) // salt_n = 1 means "an average key" — not hot
      .drop("__cnt")
  }

  /** Stats-driven salted join: detect the left side's hot keys from
    * its OBSERVED key distribution and salt ONLY those, each by its
    * own measured factor — cold keys join unsalted (salt 0, right row
    * replicated once), so the right-side growth is confined to the
    * handful of keys that need it instead of a uniform S× blowup.
    * Same join-type contract and semantics-preservation guarantee as
    * [[join]] (SaltedJoinSpec proves both paths against the plain
    * join on the skewed fixture).
    *
    * `parallelism` defaults to the cluster's scheduler parallelism —
    * the number of reducers a hot key should be able to occupy. */
  def joinAuto(left: DataFrame, right: DataFrame, keys: Seq[String],
               entropy: Column, joinType: String = "inner",
               parallelism: Int = 0, maxSalt: Int = 64,
               topN: Int = 100): DataFrame = {
    val par = if (parallelism >= 1) parallelism
      else left.sparkSession.sparkContext.defaultParallelism
    joinWithHotKeys(left, right, keys, entropy,
      detectHotKeys(left, keys, par, maxSalt, topN), joinType)
  }

  /** [[joinAuto]]'s execution half, callable with a caller-supplied
    * (or artifact-loaded) hot-key frame of (keys…, [[SaltNCol]]). */
  def joinWithHotKeys(left: DataFrame, right: DataFrame, keys: Seq[String],
                      entropy: Column, hotKeys: DataFrame,
                      joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "salted join needs at least one equi-key")
    val jt = normalize(joinType)
    // guard caller/artifact-supplied frames, same threat model twice:
    //  - salt_n <= 0 would give the left side pmod(x, 0) = NULL while
    //    the right side's sequence(0, -1) DESCENDS — silently dropping
    //    every row of that key from an inner join. Treat as "not hot".
    //  - a DUPLICATE key row would duplicate every matching left row
    //    through the left join below. Collapse to one row per key,
    //    deterministically keeping the LARGEST salt_n (the safe side:
    //    over-salting costs replication, under-salting restores skew).
    val hk = broadcast(hotKeys.filter(col(SaltNCol) >= 1)
      .groupBy(keys.map(col): _*).agg(max(col(SaltNCol)).as(SaltNCol)))
    val l = left.join(hk, keys, "left")
      .withColumn(SaltCol,
        when(col(SaltNCol).isNotNull,
          pmod(xxhash64(entropy), col(SaltNCol).cast("long"))).otherwise(0L))
      .drop(SaltNCol)
    val r = right.join(hk, keys, "left")
      .withColumn(SaltCol,
        explode(expr(s"sequence(0L, CAST(coalesce($SaltNCol, 1) AS BIGINT) - 1)")))
      .drop(SaltNCol)
    l.join(r, keys :+ SaltCol, jt).drop(SaltCol)
  }
}
