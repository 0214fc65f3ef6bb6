package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{ScratchCache, Tables}

/** q131 — count-min-sketch heavy hitters with exact calibration: the
  * streaming-sketch answer to "what are the hottest tokens" when the
  * vocabulary itself is too large to hold (the q25-HLL discipline
  * applied to FREQUENCY instead of cardinality). A d×w count-min
  * sketch (d = 4 rows, w = 256 buckets) is built over the token
  * stream; each row j hashes a token to a bucket with an independent
  * md5-derived hash, and est(t) = min_j sketch[j][h_j(t)] ≥ exact(t)
  * always (counts only ever add). The query reports the top-20 tokens
  * by EXACT count next to their sketch estimate and overestimate —
  * the calibration view that tells a pipeline how much sketch error
  * its w buys at its skew, before it trusts the sketch alone.
  *
  * Determinism = oracle-checkability: the hash functions are fixed
  * md5 slices (the q83 `instr()` hex→int idiom both engines share
  * bit-for-bit), so the sketch cells — and therefore every estimate —
  * are exact integers DuckDB reproduces, unlike a seeded-RNG sketch.
  *
  * Scale shape: the sketch build is ONE map-side-combinable aggregate
  * over the token-frequency frame (the d hash columns are per-row
  * projections; the groupBy(j, bucket) result is d·w = 1,024 rows at
  * ANY corpus size — that fixed size is the whole point of a sketch).
  * The top-k probe side joins the 1,024-row sketch broadcast; a
  * production serving path evaluates est(t) for queried keys only,
  * exactly as modeled here (probes = the top-k frame, never the
  * vocabulary). Nothing is corpus-pairwise; the only vocabulary-sized
  * shuffle is the exact token-frequency groupBy the calibration
  * comparison itself requires (and q30 already pays). */
object HeavyHitters {

  private val D = 4 // sketch rows (independent hashes)

  /** 8-bit bucket of `tok` for sketch row `j`: two hex chars of an
    * independent md5, via the shared `instr()` hex→int idiom. */
  private def bucketFrag(j: Int, tok: String): String = {
    val h = s"md5(concat('cm$j|', $tok))"
    s"((instr('0123456789abcdef', substr($h, 1, 1)) - 1) * 16" +
      s" + (instr('0123456789abcdef', substr($h, 2, 1)) - 1))"
  }

  def q131(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tf = ScratchCache.persist(
      Tables.documents(s, dir)
        .select(explode(expr(TextQueries.toksExpr)).as("tok"))
        .groupBy($"tok").agg(count(lit(1)).as("exact_n")))
    // (j, bucket, exact_n) cells: sketch[j][b] = Σ counts of tokens
    // hashing there — identical to feeding every occurrence through
    // the sketch, built from the (much smaller) token-type frame
    val cells = tf.selectExpr(
      "tok", "exact_n",
      s"stack($D, ${(0 until D).map(j => s"$j, ${bucketFrag(j, "tok")}").mkString(", ")}) AS (j, bucket)")
    val sketch = cells.groupBy($"j", $"bucket")
      .agg(sum($"exact_n").as("cell_n"))
    val top = tf.orderBy($"exact_n".desc, $"tok").limit(20)
    val est = top.selectExpr("tok",
        s"stack($D, ${(0 until D).map(j => s"$j, ${bucketFrag(j, "tok")}").mkString(", ")}) AS (j, bucket)")
      .join(broadcast(sketch), Seq("j", "bucket"))
      .groupBy($"tok").agg(min($"cell_n").as("est_n"))
    top.join(est, Seq("tok"))
      .select($"tok", $"exact_n", $"est_n", ($"est_n" - $"exact_n").as("err_n"))
      .orderBy($"exact_n".desc, $"tok")
  }

  val q131Sql: String = {
    val cellsUnion = (0 until D)
      .map(j => s"SELECT tok, exact_n, $j AS j, ${bucketFrag(j, "tok")} AS bucket FROM tf")
      .mkString("\n  UNION ALL ")
    s"""WITH tf AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS exact_n
       |  FROM (SELECT unnest(${TextQueries.toksSql}) AS tok FROM documents)
       |  GROUP BY tok
       |), cells AS (
       |  $cellsUnion
       |), sketch AS (
       |  SELECT j, bucket, CAST(sum(exact_n) AS BIGINT) AS cell_n
       |  FROM cells GROUP BY j, bucket
       |), top AS (
       |  SELECT tok, exact_n FROM tf ORDER BY exact_n DESC, tok LIMIT 20
       |), est AS (
       |  SELECT c.tok, CAST(min(s.cell_n) AS BIGINT) AS est_n
       |  FROM (SELECT * FROM cells WHERE tok IN (SELECT tok FROM top)) c
       |  JOIN sketch s USING (j, bucket)
       |  GROUP BY c.tok
       |)
       |SELECT t.tok, t.exact_n, e.est_n, e.est_n - t.exact_n AS err_n
       |FROM top t JOIN est e USING (tok)
       |ORDER BY exact_n DESC, tok""".stripMargin
  }
}
