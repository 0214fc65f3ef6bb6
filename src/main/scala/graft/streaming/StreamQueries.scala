package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Det, QueryCatalog, Tables}

/** Batch-mode oracle checks for the streaming transforms (SURVEY.md
  * §7.5: window() is the same function in batch and streaming, so the
  * DuckDB oracle validates the streaming semantics on the static
  * `events` frame; watermark/late-data behavior is covered by
  * StreamingSpec instead, which DuckDB cannot express).
  *
  * Timestamp note: events.ts is µs-truncated on the Spark side
  * (Tables.events); the oracle casts TIMESTAMP_NS → TIMESTAMP the same
  * way, and all window arithmetic is epoch-second based.
  */
object StreamQueries extends QueryCatalog {

  // ---------------------------------------------------------------- q60
  private def q60(s: SparkSession, dir: String): DataFrame =
    EventStreams.tumblingCounts(Tables.events(s, dir))
      .orderBy(col("w_start"), col("event_type"))
  private val q60Sql =
    s"""SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS w_start,
       |  event_type, count(*) AS n,
       |  ${Det.sqlSum("value")} AS sum_value
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY w_start, event_type""".stripMargin

  // ---------------------------------------------------------------- q61
  /** Sliding windows: each event lands in 2 windows (10 min / 5 min).
    * Oracle enumerates both window starts per event. */
  private def q61(s: SparkSession, dir: String): DataFrame =
    EventStreams.slidingCounts(Tables.events(s, dir))
      .orderBy(col("w_start"))
  private val q61Sql =
    """SELECT make_timestamp(ws * 1000000) AS w_start, count(*) AS n, count(DISTINCT user_id) AS users
      |FROM (
      |  SELECT user_id,
      |    unnest([CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 300) * 300 AS BIGINT),
      |            CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 300) * 300 - 300 AS BIGINT)]) AS ws
      |  FROM events
      |)
      |GROUP BY ws
      |ORDER BY w_start""".stripMargin

  // ---------------------------------------------------------------- q62
  /** Gap-based sessionization (batch twin of the streaming path). */
  private def q62(s: SparkSession, dir: String): DataFrame =
    EventStreams.sessionize(Tables.events(s, dir))
      .orderBy(col("user_id"), col("session_seq"))
  private val q62Sql =
    """WITH flagged AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |              OR epoch(CAST(ts AS TIMESTAMP)) - epoch(CAST(lag(ts) OVER w AS TIMESTAMP)) > 1800.0
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), numbered AS (
      |  SELECT user_id, ts,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM flagged
      |)
      |SELECT user_id, session_seq, count(*) AS n_events,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  round(epoch(max(ts)) - epoch(min(ts)), 3) AS duration_s
      |FROM numbered
      |GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_stream_tumbling" -> q60,
    "q61_stream_sliding" -> q61,
    "q62_sessionize" -> q62,
  )

  val oracleSql: Map[String, String] = Map(
    "q60_stream_tumbling" -> q60Sql,
    "q61_stream_sliding" -> q61Sql,
    "q62_sessionize" -> q62Sql,
  )
}
