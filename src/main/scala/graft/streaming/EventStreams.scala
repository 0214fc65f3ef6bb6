package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface over the `events` shape (SURVEY.md
  * §2.3 "streaming"; the reference is batch-only — recorded in §2.2 —
  * so this is engine-added capability).
  *
  * The transform functions below are written against a plain DataFrame
  * so the SAME code path runs in batch mode (for the DuckDB oracle via
  * stream.StreamQueries) and in streaming mode (readStream → transform →
  * writeStream, exercised in StreamingSpec with a memory source/sink).
  * `window()` / `withWatermark` are identical functions in both modes —
  * that equivalence is the test strategy.
  */
object EventStreams {

  /** Tumbling 1-hour event-time window per event_type. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 4).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))

  /** Stream–static enrichment: each event joins the STATIC customer
    * dimension (broadcast — the stream side never shuffles for the
    * join, and Structured Streaming plans stream-static equi-joins
    * STATELESS: no join state accumulates across micro-batches, the
    * dimension is just re-broadcast), then aggregates per (1-hour
    * window, market segment). The classic streaming-enrichment shape:
    * at scale the only state is the windowed aggregate, bounded by
    * the watermark; the dimension can be arbitrarily refreshed
    * between restarts without touching state. Works on batch and
    * streaming frames; [[enrichedSegmentCountsStream]] adds the
    * watermark. */
  def enrichedSegmentCounts(events: DataFrame, customers: DataFrame): DataFrame =
    events
      .join(broadcast(customers.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 4).as("sum_value"))
      .select(col("w.start").as("w_start"), col("c_mktsegment"), col("n"), col("sum_value"))

  /** Watermarked streaming variant of [[enrichedSegmentCounts]]. */
  def enrichedSegmentCountsStream(events: DataFrame, customers: DataFrame): DataFrame =
    enrichedSegmentCounts(events.withWatermark("ts", "30 minutes"), customers)

  /** Sliding 10-minute window every 5 minutes: event counts. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("users"))
      .select(col("w.start").as("w_start"), col("n"), col("users"))

  /** Watermarked streaming variant of [[tumblingCounts]] — late data
    * beyond 30 minutes is dropped; used by the streaming tests. */
  def tumblingCountsStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))

  /** Gap-based sessionization (30-minute inactivity) as a batch window
    * computation: new-session flag via lag, session id via running sum.
    * The streaming twin is [[sessionizeStream]]. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("double") - col("prev_ts").cast("double") > gapMinutes * 60.0, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .withColumn("duration_s",
        round(col("session_end").cast("double") - col("session_start").cast("double"), 3))
  }

  /** Streaming exactly-once dedup: drop events whose `idCol` was
    * already seen within the watermark horizon — the at-least-once →
    * exactly-once repair step in front of every downstream aggregate.
    * State is bounded by the watermark (keys older than the horizon
    * are expired), which is what makes this runnable forever at scale;
    * the batch twin is a plain `dropDuplicates(idCol)` — Spark rejects
    * dropDuplicatesWithinWatermark on static frames, so this transform
    * branches on `isStreaming` to stay runnable in both modes (the
    * batch mode is what the DuckDB oracle checks via q64). */
  def dedupStream(events: DataFrame, idCol: String = "event_id",
                  watermark: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(idCol)
    else events.dropDuplicates(idCol)

  /** Stream–stream interval join: each click joined to purchases by
    * the same user within `horizonMinutes` AFTER the click. Watermarks
    * on BOTH sides bound the join state (clicks older than the horizon
    * are dropped from the state store) — without the time bound in the
    * join condition the state grows forever and a 100 TB/day stream
    * OOMs the cluster. */
  def clickPurchaseJoinStream(clicks: DataFrame, purchases: DataFrame,
                              horizonMinutes: Int = 60,
                              watermarkMinutes: Option[Int] = None,
                              inputsPreWatermarked: Boolean = false): DataFrame = {
    // same delay-vs-horizon split as [[clickPurchaseLeftJoinStream]]:
    // replays of shuffled historical files need a watermark DELAY
    // covering the span while the join HORIZON stays the funnel's
    // bound; `inputsPreWatermarked` composes after dedupStream, whose
    // stateful stage already set the watermark
    val wm = watermarkMinutes.getOrElse(horizonMinutes)
    def mark(df: DataFrame) =
      if (inputsPreWatermarked) df else df.withWatermark("ts", s"$wm minutes")
    val c = mark(clicks).alias("c")
    val p = mark(purchases).alias("p")
    c.join(p, expr(
      s"""c.user_id = p.user_id AND
         |p.ts >= c.ts AND
         |p.ts <= c.ts + INTERVAL $horizonMinutes MINUTES""".stripMargin))
      .select(col("c.user_id").as("user_id"),
        col("c.click_id"), col("p.purchase_id"),
        col("c.ts").as("click_ts"), col("p.ts").as("purchase_ts"))
  }

  /** Stream–stream LEFT OUTER interval join — [[clickPurchaseJoinStream]]
    * plus a null-padded row for every click with NO purchase inside the
    * horizon (the funnel's "did-not-convert" signal, which the inner
    * variant silently drops). In streaming mode the padded row is held
    * in the state store and emitted only once BOTH watermarks pass the
    * click's horizon — the point where no matching purchase can still
    * arrive — so outer results are late by one watermark advance but
    * never wrong (StreamingSpec pins exactly that). In batch mode the
    * same transform is a plain left outer join, which is what the
    * DuckDB oracle checks via q103. State bound: identical to the
    * inner variant — the time-bound join condition lets expired clicks
    * leave the store. */
  def clickPurchaseLeftJoinStream(clicks: DataFrame, purchases: DataFrame,
                                  horizonMinutes: Int = 60,
                                  watermarkMinutes: Option[Int] = None,
                                  inputsPreWatermarked: Boolean = false): DataFrame = {
    // the watermark DELAY (late-arrival tolerance) and the join
    // HORIZON (business time bound) are distinct dials: a replay of
    // historical files needs a delay covering the whole span so
    // shuffled file order drops nothing, while the horizon stays the
    // funnel's 60 minutes. Default keeps them equal (the live-stream
    // setting, minimal state). `inputsPreWatermarked` is for inputs
    // that already carry a watermark from an upstream stateful stage
    // (e.g. [[dedupStream]] repairing at-least-once delivery) — Spark
    // forbids REDEFINING a watermark past a stateful operator, so the
    // chained composition passes the one it set (StreamSoakSpec's
    // disorder tests drive exactly this chain).
    val wm = watermarkMinutes.getOrElse(horizonMinutes)
    def mark(df: DataFrame) =
      if (inputsPreWatermarked) df else df.withWatermark("ts", s"$wm minutes")
    val c = mark(clicks).alias("c")
    val p = mark(purchases).alias("p")
    c.join(p, expr(
      s"""c.user_id = p.user_id AND
         |p.ts >= c.ts AND
         |p.ts <= c.ts + INTERVAL $horizonMinutes MINUTES""".stripMargin), "left_outer")
      .select(col("c.user_id").as("user_id"),
        col("c.click_id"), col("p.purchase_id"),
        col("c.ts").as("click_ts"), col("p.ts").as("purchase_ts"))
  }

  /** Arbitrary custom state via mapGroupsWithState: cumulative per-user
    * event count across micro-batches (the `GroupState` path for
    * semantics window()/session_window can't express). Update mode:
    * one (user, runningCount) row per user per batch. */
  def runningCountsStream(events: DataFrame): Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    events.select(col("user_id").cast("long")).as[Long]
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Long], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + batch.size
          state.update(total)
          (user, total)
      }
  }

  /** Threshold alerts via flatMapGroupsWithState — the zero-or-MANY-
    * rows-per-group stateful shape (mapGroupsWithState emits exactly
    * one): each user's `value` accumulates across micro-batches, and a
    * row (user_id, m) is emitted for every multiple m of `step` the
    * cumulative sum crosses — several in one batch, none in most.
    * State is one decimal per user. The accumulator is an EXACT
    * decimal(18,6) sum (Spark's own cast, summed with BigDecimal.add),
    * so for NON-NEGATIVE value streams results are independent of
    * batch/partition order and the SAME function run on a batch frame
    * (Spark treats it as one batch with empty initial state) is
    * DuckDB-checkable — q77. With negative values, crossings are
    * evaluated at BATCH granularity: the high-water mark advances on
    * end-of-batch totals, so an intra-batch peak (+250 then −200 inside
    * one batch) fires no alert, while the same rows split across
    * batches fire m=1,2 — order-independence is NOT claimed there.
    * Null `value` rows are dropped (a null contributes nothing to a
    * cumulative sum, and acc.add(null) would NPE the state fn). */
  def thresholdAlertsStream(events: DataFrame, step: Long = 100L): Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(step > 0, "step must be positive")
    val stepBd = new java.math.BigDecimal(step)
    events
      .select(col("user_id").cast("long"), col("value").cast("decimal(18,6)"))
      .filter(col("value").isNotNull)
      .as[(Long, java.math.BigDecimal)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        // state = (running total, HIGH-WATER mark). Alerts fire on
        // high-water crossings only, so negative values can never
        // re-emit an already-fired multiple (the sum dips and climbs
        // back) or emit bogus zero/negative multiples. For all-
        // non-negative streams high-water == total and the batch twin
        // q77's plain-sum oracle is exact. divide(_, 0, FLOOR) is the
        // explicit-scale form: plain divide() throws on any step whose
        // reciprocal is non-terminating (3, 7, 30...).
        (user: Long, batch: Iterator[(Long, java.math.BigDecimal)],
         state: GroupState[(java.math.BigDecimal, java.math.BigDecimal)]) =>
          val (prevTotal, prevHw) = state.getOption
            .getOrElse((java.math.BigDecimal.ZERO, java.math.BigDecimal.ZERO))
          val total = batch.foldLeft(prevTotal)((acc, r) => acc.add(r._2))
          val hw = if (total.compareTo(prevHw) > 0) total else prevHw
          state.update((total, hw))
          val from = prevHw.divide(stepBd, 0, java.math.RoundingMode.FLOOR).longValueExact()
          val to = hw.divide(stepBd, 0, java.math.RoundingMode.FLOOR).longValueExact()
          ((from + 1) to to).iterator.map(m => (user, m))
      }
  }

  /** Per-user funnel STATE MACHINE via mapGroupsWithState — the
    * multi-step stateful shape (q77 tracks one accumulator; this
    * tracks a vector of first-occurrence times and derives a stage
    * from their ORDER). State = the first view/click/purchase
    * timestamps seen so far (integer µs); each batch emits the user's
    * current stage 0–3, where stage n requires the first n funnel
    * events to have happened in strict order (q118's contract).
    *
    * Arrival-order robustness, the property the spec pins: mins are
    * order-independent accumulators, so however events split or
    * reorder across micro-batches, the stage CONVERGES to the batch
    * answer once all events are in — a late-arriving earlier `view`
    * can lower tv and upgrade (or downgrade) the stage, and the next
    * emission reflects it. State is 3 longs per user, bounded. */
  def funnelStageStream(events: DataFrame): Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    events
      .select(col("user_id").cast("long"), col("event_type"),
        unix_micros(col("ts")).as("tu"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[(Long, String, Long)],
         state: GroupState[(Long, Long, Long)]) =>
          // Long.MaxValue = "not seen" (min-neutral)
          val (v0, c0, p0) = state.getOption
            .getOrElse((Long.MaxValue, Long.MaxValue, Long.MaxValue))
          val (v, c, p) = batch.foldLeft((v0, c0, p0)) {
            case ((av, ac, ap), (_, et, tu)) => et match {
              case "view" => (math.min(av, tu), ac, ap)
              case "click" => (av, math.min(ac, tu), ap)
              case "purchase" => (av, ac, math.min(ap, tu))
              case _ => (av, ac, ap)
            }
          }
          state.update((v, c, p))
          // Guard the MaxValue sentinel explicitly: `c < p` is vacuously
          // true when p is "not seen", which would award stage 3 to a
          // view<click user with no purchase (and stage 2 to a view-only
          // user via `v < c`). The batch oracle's `tv < tc` is NULL-falsy
          // when tc is NULL; these guards reproduce that.
          val stage =
            if (v < c && c < p && p != Long.MaxValue) 3L
            else if (v < c && c != Long.MaxValue) 2L
            else if (v != Long.MaxValue) 1L
            else 0L
          (user, stage)
      }
  }

  /** Streaming sessionization via session_window (native state store
    * path) — used by the streaming tests; semantics match
    * [[sessionize]] for on-time data. */
  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Streaming corpus admission — the continuous-ingest gate of an
    * incremental training-data pipeline: a newly-arriving document's
    * content digest is admitted iff
    *  (a) it is NOT already in the static corpus digest set — a
    *      stream-static LEFT OUTER join against a digest-only frame
    *      plus a null filter (stream-static joins don't support
    *      left_anti, so the outer join + marker-null filter IS the
    *      anti join; Structured Streaming plans stream-static
    *      equi-joins STATELESS, so no join state accumulates across
    *      micro-batches and the corpus side is 16 bytes/doc at any
    *      corpus size — re-loadable between restarts as the corpus
    *      grows, the same artifact-refresh contract as q94's
    *      signature store. The join strategy is left to the planner:
    *      a digest set under the broadcast cap is broadcast, a bigger
    *      one falls back to a shuffled stream-static join — still
    *      stateless, so the gate works past the 8 GB broadcast limit
    *      rather than failing on a forced hint); and
    *  (b) it was not already admitted from this stream within the
    *      watermark — `dropDuplicatesWithinWatermark` on the digest,
    *      the bounded-state guard against at-least-once redelivery.
    *
    * `arrivals` needs `text` and an event-time `ingest_ts`. Emits the
    * ADMITTED DIGEST SET (one column, `digest`) rather than surviving
    * rows: which physical row represents a digest depends on arrival
    * order in a stream, but the admitted set itself is deterministic —
    * exactly what a downstream corpus-append consumer keys on, and
    * what the DuckDB oracle can replay (q128). In batch mode the
    * dedup degrades to `dropDuplicates` per [[dedupStream]]'s
    * contract, and the output is the same digest set. */
  def admissionStream(arrivals: DataFrame, corpusDigests: DataFrame,
                      watermark: String = "30 minutes"): DataFrame = {
    // NULL text (→ NULL digest) is dropped on BOTH sides: a null join
    // key never matches, so a null-text arrival would sail through the
    // anti join and "admit" a meaningless null digest — and the SQL
    // twin's subquery semantics would diverge on it.
    val digested = arrivals
      .withColumn("digest", md5(col("text")))
      .filter(col("digest").isNotNull)
    val marked = corpusDigests
      .filter(col("digest").isNotNull)
      .select(col("digest"), lit(1).as("in_corpus"))
    val fresh = (if (digested.isStreaming)
        digested.withWatermark("ingest_ts", watermark)
      else digested)
      .join(marked, Seq("digest"), "left_outer")
      .filter(col("in_corpus").isNull)
    (if (fresh.isStreaming) fresh.dropDuplicatesWithinWatermark("digest")
     else fresh.dropDuplicates("digest"))
      .select(col("digest"))
  }

  /** Streaming per-key rate quota — the ingest throttle of a
    * multi-tenant pipeline: admit at most `quota` events per
    * (user, tumbling hour), chosen as the K LOWEST (event time,
    * event id) of the window, emitted ONCE per (user, window) when the
    * watermark passes the window's end.
    *
    * Admission by k-lowest (not arrival order) is what makes the
    * operator deterministic and therefore batch-twinned (q139's window
    * rank) and oracle-checkable: mergeing "keep the K smallest" is an
    * order-independent accumulator — however arrivals split or reorder
    * across micro-batches, the state CONVERGES to the batch answer —
    * while "first K to arrive" would admit a different set per run.
    * Emission waits for the EventTimeTimeout (never fires early, the
    * q103 left-outer discipline) so a late-but-in-watermark event can
    * still displace a provisional admit before anything is published.
    *
    * State per live (user, window): ≤ quota (ts, id) pairs, dropped at
    * emission — bounded by watermark horizon × active keys, never by
    * history. Output: (user_id, window_start µs, event_id, rank). */
  def quotaStream(events: DataFrame, quota: Int = 4,
                  watermark: String = "30 minutes"): Dataset[(Long, Long, Long, Long)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(quota > 0, "quota must be positive")
    val HourUs = 3600L * 1000000L
    // full-µs event time from the Timestamp: getTime is ms-truncated,
    // getNanos carries the whole sub-second fraction
    def micros(t: java.sql.Timestamp): Long =
      (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
    // the WATERMARKED column itself must reach the stateful operator —
    // projecting ts into a derived µs long first makes the analyzer
    // reject EventTimeTimeout ("watermark must be specified")
    val withTime = events
      .withWatermark("ts", watermark)
      .select(col("ts"), col("user_id").cast("long"),
        col("event_id").cast("long"))
      .as[(java.sql.Timestamp, Long, Long)]
    withTime
      .groupByKey(r => (r._2, (micros(r._1) / HourUs) * HourUs))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, Long), batch: Iterator[(java.sql.Timestamp, Long, Long)],
         state: GroupState[List[(Long, Long)]]) =>
          val (user, winStart) = key
          if (state.hasTimedOut) {
            // watermark has passed the window end: the k-lowest set is
            // final — publish with its within-window rank and drop state
            val admitted = state.getOption.getOrElse(Nil)
            state.remove()
            admitted.sorted.iterator.zipWithIndex.map {
              case ((tu, id), i) => (user, winStart, id, i + 1L)
            }
          } else {
            val merged = (state.getOption.getOrElse(Nil) ++
              batch.map(r => (micros(r._1), r._3))).sorted.take(quota)
            state.update(merged)
            // fire once the watermark clears the window end; a timeout
            // timestamp at/below the current watermark throws, so floor
            // it just above (the window is then already emittable and
            // times out on the next micro-batch)
            val target = math.max(winStart + HourUs,
              state.getCurrentWatermarkMs() * 1000L + 1000L)
            state.setTimeoutTimestamp(target / 1000L)
            Iterator.empty
          }
      }
  }

  /** Streaming first/last-touch ATTRIBUTION — the continuous twin of
    * q211's batch credit table (q235 is the oracle-checked batch
    * formulation): each purchase is credited to the FIRST and LAST
    * touch (click/view) in that user's trailing `windowDays` window,
    * emitted as one ledger row (user_id, purchase_id, first_touch,
    * last_touch, value_milli) ONCE — when the watermark passes the
    * purchase's event time, the point where no in-watermark touch at
    * or before it can still arrive. Purchases with no touch in the
    * window credit '(none)' (q211's miss path); credit is exact
    * integer millis, floor half-up, identical to the batch twin.
    *
    * Convergence, the property AttributionStreamSpec pins: first/last
    * over a time-bounded set are order-independent argmin/argmax
    * accumulators (the encoded (tu, event_id) key is a total order),
    * so however arrivals split or reorder across micro-batches —
    * including a late-but-in-watermark touch arriving after the
    * purchase — the emitted ledger is EXACTLY the batch twin's, and
    * its roll-up is exactly q211's report. Emission never fires early
    * (the q139 emit-once discipline): a purchase is held in state
    * until the EventTimeTimeout confirms its trailing window can no
    * longer change.
    *
    * State per live user: touches inside the trailing horizon
    * (pruned each firing to tu ≥ min(live purchase, watermark) −
    * window — nothing older can enter any still-finalizable window)
    * plus the pending purchases (held only until the watermark passes
    * their event time, i.e. at most the watermark delay). Both are
    * bounded by event RATE × horizon, never by history; a drained
    * user's state is removed entirely. At 100 TB/day the state store
    * holds (touches in 7 days + purchases in the watermark horizon)
    * per ACTIVE user — the same bound the batch window pays per task,
    * made incremental.
    *
    * A NULL purchase `value` is carried as a Long.MinValue sentinel in
    * state and emitted as NULL value_milli (the batch twin's NULL
    * floor) — boxed nulls don't survive tuple state encoding.
    *
    * At-least-once inputs: redelivered PURCHASE rows would emit their
    * credit twice (touches are safe — argmin/argmax are duplicate-
    * insensitive), so production chains [[dedupStream]] in front;
    * `inputsPreWatermarked` composes after its stateful stage exactly
    * like [[clickPurchaseLeftJoinStream]] (Spark forbids redefining a
    * watermark past a stateful operator) — StreamSoakSpec drives the
    * full chain over shuffled + redelivered files. */
  def attributionStream(events: DataFrame, windowDays: Int = 7,
                        watermark: String = "30 minutes",
                        inputsPreWatermarked: Boolean = false)
      : Dataset[(Long, Long, String, String, java.lang.Long)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(windowDays > 0, "windowDays must be positive")
    val WindowUs = windowDays * 86400L * 1000000L
    def micros(t: java.sql.Timestamp): Long =
      (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
    // watermarked ts column must reach the stateful operator (the
    // quotaStream note); value travels as boxed Double so NULLs survive
    val withTime = (if (inputsPreWatermarked) events
                    else events.withWatermark("ts", watermark))
      .select(col("ts"), col("user_id").cast("long"), col("event_type"),
        col("event_id").cast("long"), col("value").cast("double"))
      .as[(java.sql.Timestamp, Long, String, Long, java.lang.Double)]
    // state: (touches (tu, id, type), pending purchases (tu, id, milli))
    withTime
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[(java.sql.Timestamp, Long, String, Long, java.lang.Double)],
         state: GroupState[(List[(Long, Long, String)], List[(Long, Long, Long)])]) =>
          val (touches0, pending0) = state.getOption.getOrElse((Nil, Nil))
          // watermark the engine used to late-filter THIS batch: every
          // incoming row has tu >= wmUs, so a pending purchase with
          // pt < wmUs can never gain another in-window touch — final
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var touches = touches0
          var pending = pending0
          if (!state.hasTimedOut) batch.foreach { case (ts, _, et, id, v) =>
            val tu = micros(ts)
            et match {
              case "click" | "view" => touches = (tu, id, et) :: touches
              case "purchase" =>
                val milli = if (v == null) Long.MinValue
                            else math.floor(v * 1000 + 0.5).toLong
                pending = (tu, id, milli) :: pending
              case _ => ()
            }
          }
          val (done, live) = pending.partition(_._1 < wmUs)
          val out = done.sortBy(p => (p._1, p._2)).map { case (pt, pid, milli) =>
            val win = touches.filter(t => t._1 >= pt - WindowUs && t._1 <= pt)
            val first = if (win.isEmpty) "(none)" else win.minBy(t => (t._1, t._2))._3
            val last = if (win.isEmpty) "(none)" else win.maxBy(t => (t._1, t._2))._3
            (user, pid, first, last,
              if (milli == Long.MinValue) null else java.lang.Long.valueOf(milli))
          }
          // prune: future purchases arrive at tu >= wmUs, so no touch
          // below min(live, wm) - window can enter any window again
          val floorTu = (wmUs :: live.map(_._1)).min - WindowUs
          touches = touches.filter(_._1 >= floorTu)
          if (touches.isEmpty && live.isEmpty) state.remove()
          else {
            state.update((touches, live))
            // wake when the earliest pending purchase becomes final, or
            // when the oldest touch ages out (so touch-only state
            // drains); floored just above the current watermark (a
            // timeout at/below it throws — the quotaStream note)
            val targetUs =
              if (live.nonEmpty) live.map(_._1).min + 1000L
              else touches.map(_._1).min + WindowUs + 1000L
            state.setTimeoutTimestamp(math.max(targetUs, wmUs + 1000000L) / 1000L)
          }
          out.iterator
      }
  }
}
