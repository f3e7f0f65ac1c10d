package graft.streaming

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table — the
  * streaming extension the reference lacks entirely (SURVEY.md §2.7:
  * no streams anywhere in the Erlang system).
  *
  * Design: each windowed aggregation is ONE transform function over a
  * DataFrame, applied unchanged to a batch frame (oracle-checkable by
  * DuckDB) and to a streaming frame behind `withWatermark` (checked by
  * the stream-equals-batch spec). That equivalence is Spark's own
  * contract for windowed aggregates — the batch twin IS the
  * correctness oracle for the stream.
  *
  * Scale posture: streaming aggregation state is keyed by
  * (window, key) — bounded by watermark eviction; tumbling/sliding
  * windows shuffle once on the window key, session windows shuffle on
  * `user_id` then merge per-key sorted runs. No per-event driver work.
  */
/** Input row for the custom-state sessionizer. */
case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)

/** One session interval (epoch millis). */
case class SessionAgg(start: Long, last: Long, n: Long)

/** Per-user sessionizer state: EVERY session the watermark hasn't
  * passed yet — the open tail plus any gap-separated predecessors
  * that a late-but-in-watermark event could still merge into. */
case class SessionList(sessions: Seq[SessionAgg])

/** One closed session (epoch-millis bounds; end = last event + gap,
  * matching `session_window`'s contract). */
case class SessionRow(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

/** One funnel event inside the custom-state funnel tracker. */
case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)

/** Per-user funnel state: every relevant (type, epoch-ms) seen so
  * far. Retained whole because a LATE view can lower t1 and newly
  * validate clicks already seen — first-after semantics are not
  * incrementally monotone per field, only per event-SET. */
case class FunnelBuf(evs: Seq[(String, Long)])

/** Per-user funnel progress: stage ∈ 0..3, times in epoch ms (−1 =
  * stage unreached). */
case class FunnelStageRow(user_id: Long, stage: Int, t1: Long, t2: Long, t3: Long)

/** One changelog entry for the streaming compactor (`seq` unique
  * within key breaks same-timestamp ties; `op` ∈ I/U/D). */
case class CdcOp(key: Long, ts: java.sql.Timestamp, seq: Long,
                 op: String, value: Double)

/** Compactor state per key: the winning (ts, seq) entry so far plus
  * the total op count — O(1) regardless of history length. */
case class CdcState(ts_ms: Long, seq: Long, op: String, value: Double,
                    n_ops: Long)

/** Current snapshot row for a key (update mode: each micro-batch
  * re-emits keys it touched; `last_op = "D"` is the retraction marker
  * a sink uses to drop the key from the materialized snapshot). */
case class CdcRow(user_id: Long, n_ops: Long, last_op: String,
                  last_value: Double, last_ts_ms: Long)

object EventStreams {

  private def dec(c: Column) = c.cast("decimal(18,2)")

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based streaming source over an events parquet directory.
    * Streaming file sources require a user-supplied schema, and the
    * right `ts` schema depends on what the parquet writer stored and
    * what this reader version yields for it (TIMESTAMP_NTZ on
    * Spark ≥3.4 for isAdjustedToUTC=false µs timestamps; bigint on a
    * pre-4.1 reader under the legacy nanosAsLong conf). Probe the
    * directory ONCE with the batch reader at stream-construction
    * time — one footer read, no data scan — then declare that exact
    * type to the stream and apply [[Tables.normalizeEventTs]]'s
    * dispatch so every micro-batch yields the library's stable
    * `ts: timestamp` (µs, UTC session zone) surface. On the native
    * timestamp/NTZ paths no session conf is touched, so nothing
    * needs restoring when streams end; only the legacy
    * bigint-for-nanos path (pre-4.1 readers) still sets the conf,
    * session-wide, as documented on the branch below. */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    val probedTs = Tables.eventsFrame(spark, dir).schema("ts").dataType
    val rawSchema = StructType(eventsSchema.map {
      case f if f.name == "ts" => f.copy(dataType = probedTs)
      case f => f
    })
    if (probedTs == LongType) {
      // legacy reader + TIMESTAMP(NANOS) file: micro-batch footer
      // conversion needs the conf for the stream's whole lifetime.
      // Set it session-wide — the conf only affects nanos columns,
      // which this library uniformly treats as epoch-ns longs.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    Tables.normalizeEventTs(
      spark.readStream.schema(rawSchema).parquet(dir))
  }

  // -- shared transforms (batch twin == streaming body) ------------

  /** Tumbling 1-hour windows per event type. */
  def tumblingHourly(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum(dec($"value")).cast("double").as("sum_value"))
      .select(
        date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
        $"event_type", $"n", $"sum_value")
  }

  /** Stream-static enrichment: the event stream joins a static
    * dimension frame on `user_id` BEFORE the windowed aggregate —
    * the canonical streaming-enrichment shape. The static side needs
    * no watermark and broadcasts into every micro-batch; state is
    * keyed on the (coarser) enriched key, so enrichment also SHRINKS
    * streaming state vs aggregating on raw user_id. Works identically
    * on a batch frame (the spec's stream==batch witness).
    *
    * A user dimension is user-population-proportional, so the
    * broadcast is capacity-tiered like every other such hint (one
    * count of the STATIC side at plan construction — metadata-cheap
    * for a table read, never per micro-batch); past the cap the
    * per-batch join strategy is Catalyst's to pick. */
  def enrichedTumbling(events: DataFrame, dim: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.join(graft.util.Broadcasting.maybeBroadcast(dim, dim.count()), "user_id")
      .groupBy(window($"ts", "1 hour"), $"segment")
      .agg(count(lit(1)).as("n"),
        sum(dec($"value")).cast("double").as("sum_value"))
      .select(
        date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
        $"segment", $"n", $"sum_value")
  }

  /** Sliding 1-hour windows every 15 minutes per event type: each
    * event lands in exactly 4 overlapping windows. */
  def slidingHourly(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum(dec($"value")).cast("double").as("sum_value"))
      .select(
        date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
        $"event_type", $"n", $"sum_value")
  }

  /** Tumbling daily distinct-user KMV sketch: per day, the event
    * count plus the k-minimum-values sketch of the hashed user-id
    * space ([[graft.functions.KMinValuesAgg]]). The streaming
    * counterpart of the batch KMV queries: per-window state is a
    * FIXED ≤ k-long buffer regardless of traffic (a streaming
    * `count_distinct` would hold every user id per open window —
    * unbounded on a 100-TB ingest), the buffer merges associatively
    * across micro-batches, and because the sketch rides the
    * engine-neutral md5 hash the batch twin's oracle replays the
    * retained minima and the integer estimate bit-for-bit. Works
    * identically on a batch frame (the spec's stream==batch
    * witness). */
  def dailyUsersKmv(events: DataFrame, k: Int = 64): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import graft.functions.KMinValues._
    events
      .groupBy(window($"ts", "1 day"))
      .agg(count(lit(1)).as("n_events"),
        k_min_values(
          graft.functions.Hashing.md5i32($"user_id".cast("string"), 0), k)
          .as("kmv"))
      .select(
        date_format($"window.start", "yyyy-MM-dd").as("day"),
        $"n_events",
        size($"kmv").cast("long").as("n_kept"),
        when(size($"kmv") === k, element_at($"kmv", k)).as("kth_min"),
        kmvEstimate($"kmv", k).as("est_users"))
  }

  /** Tumbling daily value-quantile sketch: per day, p25/50/75/90 of
    * the event `value` estimated from a bounded uniform sample — the
    * `s` events with the smallest engine-neutral md5(event_id), kept
    * with their values by [[graft.functions.KMinByHashAgg]]. The
    * windowed-quantile problem is where streaming percentiles blow
    * up (exact per-window quantiles hold every value; Spark's own
    * `approx_percentile` is bounded but engine-internal, so only
    * rows-only checkable): this sketch's per-window state is ≤ s
    * (hash, value) pairs that merge associatively across
    * micro-batches, and the batch twin's oracle replays the retained
    * sample and every rank-arithmetic estimate bit-for-bit. Values
    * pass through arithmetic-free, so doubles compare exactly. Same
    * transform body batch or stream (the spec's witness). */
  def dailyValueQuantiles(events: DataFrame, s: Int = 64): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import graft.functions.KMinValues._
    def q(p: Int): Column =
      element_at($"vs",
        expr(s"cast((n_sampled * $p + 99) div 100 as int)")).as(s"p$p")
    events
      .groupBy(window($"ts", "1 day"))
      .agg(count(lit(1)).as("n_events"),
        k_min_by_hash(
          graft.functions.Hashing.md5i32($"event_id".cast("string"), 29),
          $"value", s).as("samp"))
      .select(
        date_format($"window.start", "yyyy-MM-dd").as("day"),
        $"n_events",
        size($"samp").cast("long").as("n_sampled"),
        sort_array(transform($"samp", x => x.getField("v"))).as("vs"))
      .select($"day", $"n_events", $"n_sampled", q(25), q(50), q(75), q(90))
  }

  /** Windowed Count-Min sketch parameters, shared with the oracle.
    * depth×width = 1024 counters ≈ 8 KB of state per open window —
    * the bound that makes per-window frequency queries affordable on
    * an unbounded stream. Probes are catalog constants so the batch
    * twin and its oracle can never drift. */
  val EventCmsDepth = 4
  val EventCmsWidth = 256
  val EventCmsProbes: Seq[Long] = Seq(1L, 2L, 3L, 5L, 8L)

  /** (salt, cell) assignments of one key under the engine-neutral
    * md5 family — the Count-Min row functions. */
  private def cmsCellsOf(key: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(s =>
      struct(lit(s).as("salt"),
        pmod(graft.functions.Hashing.md5i32(key.cast("string"), s),
          lit(width.toLong)).as("cell"))): _*)

  /** Tumbling daily Count-Min sketch of the user-id stream: per day,
    * the depth×width cell counts — the third windowed sketch next to
    * [[dailyUsersKmv]] (distinct count) and [[dailyValueQuantiles]]
    * (quantiles), covering per-key FREQUENCY: "how often did user X
    * appear in window W" for any X, answered later from ≤ 1024
    * bounded counters instead of a per-user count whose state grows
    * with distinct users per window. The sketch is a plain windowed
    * aggregate (explode each event into its `depth` cell assignments,
    * partial+final count), so it streams under a watermark with NO
    * custom state — per (task, window) at most depth·width rows cross
    * the wire, and cells sum cell-wise across micro-batches by
    * construction. Engine-neutral md5 rows make every counter exactly
    * replayable by the batch twin's oracle ([[eventsCmsWindowSql]]).
    * Works identically on a batch frame (the spec's stream==batch
    * witness). */
  def dailyUserCmsCells(events: DataFrame, depth: Int = EventCmsDepth,
                        width: Int = EventCmsWidth): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select($"ts", explode(cmsCellsOf($"user_id", depth, width)).as("sc"))
      .select($"ts", $"sc.salt".as("salt"), $"sc.cell".as("cell"))
      .groupBy(window($"ts", "1 day"), $"salt", $"cell")
      .agg(count(lit(1)).as("c"))
      .select(date_format($"window.start", "yyyy-MM-dd").as("day"),
        $"salt", $"cell", $"c")
  }

  /** Windowed HLL register geometry (p=6 → m=64 registers ≈ 512 B
    * per open window) and the textbook α₆₄; shared with the oracle. */
  val EventHllP = 6
  val EventHllM: Int = 1 << EventHllP
  val EventHllW: Int = 32 - EventHllP
  val EventHllR: Int = EventHllW + 1
  val EventHllAlpha = 0.709
  val EventHllSalt = 7

  /** Tumbling daily HLL registers of the user-id stream — the fourth
    * windowed sketch (KMV = checkable distinct, value-KMV =
    * quantiles, CMS = frequency): TRULY fixed state. The KMV window
    * holds min(k, distinct) hashes — k longs at saturation; HLL holds
    * exactly m=64 register maxima per window no matter how many
    * distinct users arrive, the right trade when windows are many and
    * memory is the constraint. A plain windowed MAX aggregate
    * (register index = high p bits of the engine-neutral md5, rho =
    * leading-zero rank of the rest), so it streams under a watermark
    * with no custom state and registers merge by MAX across
    * micro-batches by construction. Works identically on a batch
    * frame (the stream==batch witness). */
  def dailyUserHllRegisters(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val mask = (1L << EventHllW) - 1
    events
      .select($"ts",
        graft.functions.Hashing.md5i32($"user_id".cast("string"), EventHllSalt)
          .as("h"))
      .select($"ts", shiftright($"h", EventHllW).as("idx"),
        $"h".bitwiseAND(lit(mask)).as("w"))
      .select($"ts", $"idx",
        when($"w" === 0L, lit(EventHllR.toLong))
          .otherwise(lit((EventHllW + 1).toLong)
            - length(expr("bin(w)")).cast("long")).as("rho"))
      .groupBy(window($"ts", "1 day"), $"idx")
      .agg(max($"rho").as("mj"))
      .select(date_format($"window.start", "yyyy-MM-dd").as("day"),
        $"idx", $"mj")
  }

  /** Batch twin of [[dailyUserHllRegisters]]: fold each day's
    * registers into the integer-scaled harmonic sum and the standard
    * estimator (linear counting below 2.5m with zero registers, else
    * α·m²·2^R/s_scaled — the [[graft.operators.TextAnalytics
    * .approxDistinct]] arithmetic at window grain), joined with the
    * exact per-day distinct as the certificate the oracle recomputes
    * identically. Production ships the registers; the exact twin is
    * the diagnostic. */
  def eventsHllWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val m = EventHllM.toLong
    val m2r = EventHllM.toDouble * EventHllM.toDouble * (1L << EventHllR).toDouble
    val folded = dailyUserHllRegisters(ev)
      .groupBy($"day")
      .agg(count(lit(1)).as("n_used"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $EventHllR - mj)")).as("s_used"))
      .select($"day", (lit(m) - $"n_used").as("n_zero"),
        ($"s_used" + (lit(m) - $"n_used") * lit(1L << EventHllR)).as("s_scaled"))
      .withColumn("raw_est",
        lit(EventHllAlpha) * lit(m2r) / $"s_scaled".cast("double"))
      .select($"day", $"n_zero", $"s_scaled",
        when($"raw_est" <= lit(2.5 * EventHllM) && $"n_zero" > 0L,
          lit(EventHllM.toDouble)
            * log(lit(EventHllM.toDouble) / $"n_zero".cast("double")))
          .otherwise($"raw_est").as("est_users"))
    val exact = ev
      .groupBy(window($"ts", "1 day"))
      .agg(countDistinct($"user_id").as("n_users"))
      .select(date_format($"window.start", "yyyy-MM-dd").as("day"), $"n_users")
    folded.join(exact, Seq("day"))
      .select($"day", $"n_zero", $"s_scaled", $"est_users", $"n_users")
      .orderBy($"day")
  }

  def eventsHllWindowSql(): String = {
    val h = graft.functions.Hashing
      .md5i32Sql("CAST(user_id AS VARCHAR)", EventHllSalt)
    val (m, w, r) = (EventHllM, EventHllW, EventHllR)
    val m2r = java.lang.Double.toString(
      EventHllM.toDouble * EventHllM.toDouble * (1L << EventHllR).toDouble)
    s"""WITH e AS (
       |  SELECT strftime(time_bucket(INTERVAL 1 DAY, CAST(ts AS TIMESTAMP)),
       |                  '%Y-%m-%d') AS day, user_id
       |  FROM events),
       |bits AS (SELECT day, h >> $w AS idx, h & ${(1L << w) - 1} AS w
       |         FROM (SELECT day, $h AS h FROM e)),
       |regs AS (
       |  SELECT day, idx,
       |    MAX(CASE WHEN w = 0 THEN $r
       |        ELSE ${w + 1} - (length(bin(w)) - position('1' IN bin(w)) + 1)
       |        END) AS mj
       |  FROM bits GROUP BY 1, 2),
       |agg AS (
       |  SELECT day, COUNT(*) AS n_used,
       |    SUM(1::BIGINT << ($r - mj)) AS s_used
       |  FROM regs GROUP BY day),
       |fin AS (
       |  SELECT day, $m - n_used AS n_zero,
       |    s_used + ($m - n_used) * ${1L << r} AS s_scaled
       |  FROM agg),
       |est AS (
       |  SELECT day, n_zero, s_scaled,
       |    $EventHllAlpha * $m2r / CAST(s_scaled AS DOUBLE) AS raw_est
       |  FROM fin),
       |ex AS (SELECT day, COUNT(DISTINCT user_id) AS n_users FROM e GROUP BY day)
       |SELECT est.day, CAST(n_zero AS BIGINT) AS n_zero,
       |  CAST(s_scaled AS BIGINT) AS s_scaled,
       |  CASE WHEN raw_est <= ${2.5 * EventHllM} AND n_zero > 0
       |       THEN ${EventHllM.toDouble}
       |            * ln(${EventHllM.toDouble} / CAST(n_zero AS DOUBLE))
       |       ELSE raw_est END AS est_users,
       |  ex.n_users
       |FROM est JOIN ex ON est.day = ex.day
       |ORDER BY est.day""".stripMargin
  }

  /** 30-minute-gap session windows per user (a new session starts
    * when the gap since the previous event is >= 30 min —
    * `session_window`'s contract). ONE stateful aggregation, so it is
    * directly runnable as a watermarked stream. */
  def sessionCounts(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupBy(session_window($"ts", "30 minutes").as("sw"), $"user_id")
      .agg(count(lit(1)).as("session_events"))
  }

  /** Per-user session statistics — the stateless rollup of
    * [[sessionCounts]] (in streaming this second aggregate would be a
    * second stateful operator; keep it batch-side or in the sink). */
  def sessionStatsPerUser(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    sessionCounts(events)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum($"session_events").cast("long").as("n_events"),
        max($"session_events").cast("long").as("max_session_events"))
  }

  /** Custom-state sessionization via `flatMapGroupsWithState` — the
    * arbitrary-stateful-processing tier below `session_window`, for
    * session logic the built-in can't express (e.g. emitting rich
    * per-session records, per-key adaptive gaps).
    *
    * Emission follows `session_window`'s own rule: a session is final
    * only once the watermark passes its end (`last + gap`) — until
    * then it stays in state, because a late-but-in-watermark event can
    * still merge into it (extend it, or bridge it with a neighbor).
    * So per-user state is the LIST of unemitted sessions, and every
    * micro-batch runs one gaps-and-islands pass over
    * (held sessions ++ new events): late events merge with earlier
    * sessions — including sessions a previous batch already separated
    * — exactly as the built-in would. Ripe islands (end ≤ watermark)
    * are emitted; Spark drops rows older than the watermark before
    * this function, so a ripe island can never grow — emission is
    * safe and exactly-once. The event-time timeout flushes ripe
    * sessions of users with no new data.
    *
    * Equivalence with the built-in (`sessionCounts`) is pinned by
    * StreamingSpec, including multi-late-event and cross-batch merge
    * cases. Streaming-only: batch mode restricts
    * flatMapGroupsWithState to NoTimeout, and the batch answer is
    * `session_window` anyway. */
  /** Shared funnel semantics (the [[graft.operators.Relational
    * .eventsFunnel]] contract): first view, first click strictly
    * after it, first purchase strictly after that. Pure function of
    * the event SET, so batch and streaming agree regardless of
    * arrival order. */
  private[streaming] def funnelTimes(evs: Seq[(String, Long)]): (Long, Long, Long) = {
    def minAfter(tpe: String, after: Long): Option[Long] = {
      val it = evs.iterator.filter(e => e._1 == tpe && e._2 > after).map(_._2)
      if (it.isEmpty) None else Some(it.min)
    }
    val v = minAfter("view", Long.MinValue)
    val c = v.flatMap(minAfter("click", _))
    val p = c.flatMap(minAfter("purchase", _))
    (v.getOrElse(-1L), c.getOrElse(-1L), p.getOrElse(-1L))
  }

  private def stageRow(user: Long, t: (Long, Long, Long)): FunnelStageRow =
    FunnelStageRow(user,
      Seq(t._1, t._2, t._3).count(_ >= 0), t._1, t._2, t._3)

  /** Batch twin: per-user funnel stage via one groupByKey pass. */
  def funnelStagesBatch(events: Dataset[FunnelEvent]): Dataset[FunnelStageRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.filter(e =>
        e.event_type == "view" || e.event_type == "click" ||
          e.event_type == "purchase")
      .groupByKey(_.user_id)
      .mapGroups { (u, it) =>
        stageRow(u, funnelTimes(it.map(e => (e.event_type, e.ts.getTime)).toSeq))
      }
  }

  /** Streaming funnel tracker via `mapGroupsWithState`: per user the
    * state holds every funnel event seen so far (a late-arriving
    * earlier view can LOWER t1 and newly validate clicks already
    * seen, so first-after times are recomputed from the set — they
    * are monotone in set inclusion, not per arrival). Emits the
    * user's current stage each batch in Update mode; the final
    * emission equals the batch answer. State is bounded by the
    * user's own funnel-relevant events; production would add an
    * event-time timeout to retire quiet users. */
  def funnelStagesStream(events: Dataset[FunnelEvent]): Dataset[FunnelStageRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val fn = (user: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelBuf]) => {
      val held = state.getOption.map(_.evs).getOrElse(Seq.empty)
      val all = held ++ rows.map(e => (e.event_type, e.ts.getTime))
      state.update(FunnelBuf(all))
      stageRow(user, funnelTimes(all))
    }
    events.filter(e =>
        e.event_type == "view" || e.event_type == "click" ||
          e.event_type == "purchase")
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }

  def sessionizeWithState(events: Dataset[SessionEvent],
                          gapMs: Long = 30L * 60 * 1000): Dataset[SessionRow] = {
    val spark = events.sparkSession
    import spark.implicits._

    def close(user: Long, s: SessionAgg): SessionRow =
      SessionRow(user, s.start, s.last + gapMs, s.n)

    // gaps-and-islands over session intervals sorted by start: merge
    // when the next interval starts within the gap of the current
    // island's end (also covers full overlap). Returns islands in
    // ascending start order.
    def islands(items: Seq[SessionAgg]): Seq[SessionAgg] =
      items.sortBy(s => (s.start, s.last))
        .foldLeft(List.empty[SessionAgg]) {
          case (head :: tail, it) if it.start - head.last < gapMs =>
            SessionAgg(head.start, math.max(head.last, it.last),
              head.n + it.n) :: tail
          case (acc, it) => it :: acc
        }.reverse

    def fn(user: Long, rows: Iterator[SessionEvent],
           state: GroupState[SessionList]): Iterator[SessionRow] = {
      // one body for both triggers: on timeout `rows` is empty and the
      // held sessions are re-partitioned against the advanced watermark
      val wm = state.getCurrentWatermarkMs()
      val held = state.getOption.map(_.sessions).getOrElse(Seq.empty)
      val incoming = rows.map(e =>
        SessionAgg(e.ts.getTime, e.ts.getTime, 1)).toSeq
      val merged = islands(held ++ incoming)
      val (ripe, open) = merged.partition(_.last + gapMs <= wm)
      if (open.nonEmpty) {
        state.update(SessionList(open))
        // flush when the earliest unemitted session ripens; must stay
        // strictly above the current watermark
        state.setTimeoutTimestamp(
          math.max(open.map(_.last + gapMs).min, wm + 1000))
      } else {
        state.remove()
      }
      ripe.map(close(user, _)).iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Click→purchase attribution pairs: every purchase within 30
    * minutes AFTER a click by the same user, attributed to that click.
    * ONE transform for both modes — as a stream-stream inner join the
    * time bound plus per-side watermarks let Spark evict join state
    * (clicks older than watermark−30min can never match again); as a
    * batch join it is the oracle-checked twin. State is keyed by
    * user_id and bounded by (watermark window × per-user event rate) —
    * the production attribution-join shape. */
  def attributionPairs(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(
      col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val p = purchases.select(
      col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
      col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("purchase_value"))
  }

  /** LEFT-OUTER click→purchase attribution: every click exactly once
    * per matching purchase, PLUS unmatched clicks null-padded — the
    * conversion-funnel form of [[attributionPairs]] (an unconverted
    * click is the signal there). Same ONE-transform-both-modes
    * discipline: in streaming, an unmatched click is held in state
    * and emitted null-padded only once the watermark proves no
    * qualifying purchase can still arrive (watermark past click_ts +
    * 30 min); state eviction is identical to the inner form. As a
    * batch join it is the oracle-checked twin. */
  def attributionOuter(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(
      col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val p = purchases.select(
      col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
      col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr("INTERVAL 30 MINUTES"),
      "left_outer")
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("purchase_value"))
  }

  /** FULL-OUTER click→purchase attribution — the last cell of the
    * stream-stream join matrix: matched pairs, unconverted clicks
    * (null purchase), AND organic purchases with no preceding click
    * (null click — the "dark conversion" a left join never surfaces,
    * and the number marketing attribution fights over). Same
    * ONE-transform-both-modes discipline: in streaming, BOTH sides
    * hold state until the watermark proves no qualifying partner can
    * arrive (click_ts + 30 min past watermark for clicks; purchase_ts
    * itself for purchases), then flush null-padded exactly once. As
    * a batch join it is the oracle-checked twin. */
  def attributionFull(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(
      col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val p = purchases.select(
      col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
      col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr("INTERVAL 30 MINUTES"),
      "full_outer")
      .select(coalesce(col("user_id"), col("p_user_id")).as("user_id"),
        col("click_id"), col("purchase_id"), col("purchase_value"))
  }

  // -- batch twins (oracle-checked) --------------------------------

  def eventsSliding(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    slidingHourly(Tables.events(spark, sfDir))
      .orderBy($"window_start", $"event_type")
  }

  /** DuckDB mirror: each event belongs to the 4 slide-aligned windows
    * starting at time_bucket(15min, ts) - k·15min, k ∈ 0..3. */
  val eventsSlidingSql: String =
    """SELECT strftime(time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP))
      |                  - k * INTERVAL 15 MINUTE,
      |                '%Y-%m-%d %H:%M:%S') AS window_start,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events, range(4) t(k)
      |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** Batch twin of [[dailyUsersKmv]] over the events table. */
  /** Batch twin of [[dailyValueQuantiles]] over the events table. */
  def eventsValueQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    dailyValueQuantiles(Tables.events(spark, sfDir)).orderBy($"day")
  }

  /** Oracle of [[eventsValueQuantiles]]: replays the bounded sample
    * (`row_number() ≤ s` over `ORDER BY h, v` per day) and the
    * rank-arithmetic quantile inversion — doubles untouched by
    * arithmetic, compared exactly. */
  def eventsValueQuantilesSql(s: Int = 64): String = {
    val h = graft.functions.Hashing.md5i32Sql("CAST(event_id AS VARCHAR)", 29)
    def q(p: Int): String =
      s"MAX(CASE WHEN vr = (m * $p + 99) // 100 THEN v END) AS p$p"
    s"""WITH e AS (
       |  SELECT strftime(time_bucket(INTERVAL 1 DAY, CAST(ts AS TIMESTAMP)),
       |                  '%Y-%m-%d') AS day, $h AS h, value AS v
       |  FROM events),
       |n AS (SELECT day, COUNT(*) AS n_events FROM e GROUP BY day),
       |p AS (SELECT DISTINCT day, h, v FROM e),
       |r AS (SELECT day, h, v,
       |        row_number() OVER (PARTITION BY day ORDER BY h, v) AS rk
       |      FROM p),
       |vv AS (SELECT day, v,
       |         row_number() OVER (PARTITION BY day ORDER BY v) AS vr,
       |         COUNT(*) OVER (PARTITION BY day) AS m
       |       FROM r WHERE rk <= $s)
       |SELECT day, n.n_events, CAST(m AS BIGINT) AS n_sampled,
       |  ${q(25)}, ${q(50)}, ${q(75)}, ${q(90)}
       |FROM vv JOIN n USING (day)
       |GROUP BY day, m, n.n_events ORDER BY day""".stripMargin
  }

  def eventsUsersKmv(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    dailyUsersKmv(Tables.events(spark, sfDir)).orderBy($"day")
  }

  /** Oracle of [[eventsUsersKmv]]: replays the per-day sketch with
    * `row_number() ≤ k` over distinct user hashes and the integer
    * estimator — sketch contents hash-compared, not banded. */
  def eventsUsersKmvSql(k: Int = 64): String = {
    val h = graft.functions.Hashing.md5i32Sql("CAST(user_id AS VARCHAR)", 0)
    s"""WITH e AS (
       |  SELECT strftime(time_bucket(INTERVAL 1 DAY, CAST(ts AS TIMESTAMP)),
       |                  '%Y-%m-%d') AS day, user_id
       |  FROM events),
       |n AS (SELECT day, COUNT(*) AS n_events FROM e GROUP BY day),
       |h AS (SELECT DISTINCT day, $h AS h FROM e),
       |r AS (SELECT day, h,
       |        row_number() OVER (PARTITION BY day ORDER BY h) AS rk,
       |        COUNT(*) OVER (PARTITION BY day) AS nd
       |      FROM h)
       |SELECT day, n.n_events,
       |  CAST(LEAST(nd, $k) AS BIGINT) AS n_kept,
       |  MAX(CASE WHEN rk = $k THEN h END) AS kth_min,
       |  CASE WHEN nd < $k THEN CAST(nd AS BIGINT)
       |       ELSE ${(k - 1).toLong * graft.functions.KMinValues.HashDomain}
       |            // MAX(CASE WHEN rk = $k THEN h END) END AS est_users
       |FROM r JOIN n USING (day)
       |GROUP BY day, nd, n.n_events ORDER BY day""".stripMargin
  }

  /** Batch twin of [[dailyUserCmsCells]]: builds the per-day sketch,
    * then answers the fixed probe set from it — per (day, probe) the
    * min over the `depth` counters, joined with the exact per-day
    * count so the oracle certifies the CMS contract (`est ≥ exact`,
    * `overcount ≥ 0`) on every row. A probe absent from a day still
    * answers (its estimate is that day's collision mass, exact 0) —
    * CMS answers any key, which is the point of a sketch; the
    * left-join + coalesce pins that semantics. The probe lookup is a
    * cross of (days × probes × salts) — all catalog-bounded — against
    * the ≤ depth·width-per-day cell frame; the event table is scanned
    * twice (sketch + exact certificate), and production ships only
    * the first scan. */
  def eventsCmsWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val cells = dailyUserCmsCells(ev)
    val days = cells.select($"day").distinct()
    val probeFrame = EventCmsProbes.toDF("user_id")
      .select($"user_id",
        explode(cmsCellsOf($"user_id", EventCmsDepth, EventCmsWidth)).as("sc"))
      .select($"user_id", $"sc.salt".as("salt"), $"sc.cell".as("cell"))
    val est = days.crossJoin(broadcast(probeFrame))
      .join(cells, Seq("day", "salt", "cell"), "left")
      .groupBy($"day", $"user_id")
      .agg(min(coalesce($"c", lit(0L))).as("est"))
    val exact = ev.filter($"user_id".isin(EventCmsProbes: _*))
      .groupBy(window($"ts", "1 day"), $"user_id")
      .agg(count(lit(1)).as("n"))
      .select(date_format($"window.start", "yyyy-MM-dd").as("day"),
        $"user_id", $"n")
    est.join(exact, Seq("day", "user_id"), "left")
      .select($"day", $"user_id", coalesce($"n", lit(0L)).as("n"), $"est",
        ($"est" - coalesce($"n", lit(0L))).as("overcount"))
      .orderBy($"day", $"user_id")
  }

  /** Oracle of [[eventsCmsWindow]]: rebuilds the identical per-day
    * cell table from the md5 rows and replays min-over-rows — sketch
    * counters hash-compared, not banded. */
  def eventsCmsWindowSql(depth: Int = EventCmsDepth,
                         width: Int = EventCmsWidth): String = {
    val h = graft.functions.Hashing
      .md5i32Sql("CAST(user_id AS VARCHAR)", "CAST(salt AS VARCHAR)")
    val probeList = EventCmsProbes.mkString(", ")
    s"""WITH e AS (
       |  SELECT strftime(time_bucket(INTERVAL 1 DAY, CAST(ts AS TIMESTAMP)),
       |                  '%Y-%m-%d') AS day, user_id
       |  FROM events),
       |salts AS (SELECT unnest(range($depth)) AS salt),
       |cells AS (
       |  SELECT day, salt, $h % $width AS cell, COUNT(*) AS c
       |  FROM e CROSS JOIN salts GROUP BY 1, 2, 3),
       |probes AS (
       |  SELECT CAST(unnest([$probeList]) AS BIGINT) AS user_id),
       |pc AS (SELECT p.user_id, s.salt, $h % $width AS cell
       |       FROM probes p CROSS JOIN salts s),
       |days AS (SELECT DISTINCT day FROM e),
       |est AS (
       |  SELECT d.day, pc.user_id, MIN(COALESCE(c.c, 0)) AS est
       |  FROM days d CROSS JOIN pc
       |  LEFT JOIN cells c
       |    ON c.day = d.day AND c.salt = pc.salt AND c.cell = pc.cell
       |  GROUP BY 1, 2),
       |ex AS (SELECT day, user_id, COUNT(*) AS n FROM e
       |       WHERE user_id IN ($probeList) GROUP BY 1, 2)
       |SELECT est.day, est.user_id, COALESCE(ex.n, 0) AS n, est.est,
       |       est.est - COALESCE(ex.n, 0) AS overcount
       |FROM est LEFT JOIN ex
       |  ON ex.day = est.day AND ex.user_id = est.user_id
       |ORDER BY 1, 2""".stripMargin
  }

  /** Batch twin of [[enrichedTumbling]] with a dimension derived
    * deterministically from the user-id space (5 segments). */
  def eventsEnriched(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val dim = ev.select($"user_id").distinct()
      .select($"user_id", concat(lit("seg-"), $"user_id" % 5).as("segment"))
    enrichedTumbling(ev, dim).orderBy($"window_start", $"segment")
  }

  val eventsEnrichedSql: String =
    """SELECT strftime(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)),
      |                '%Y-%m-%d %H:%M:%S') AS window_start,
      |  'seg-' || (user_id % 5) AS segment, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, segment""".stripMargin

  // -- at-least-once → exactly-once delivery repair -----------------

  /** Deterministic re-delivery injector: every event whose salted md5
    * lands in the low decile arrives TWICE — the duplicate an
    * at-least-once broker retry produces. One rule shared by the
    * catalog query, its oracle, and the streaming spec, so the
    * duplicate population is identical everywhere. */
  def withRedelivery(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.unionAll(events.filter(
      graft.functions.Hashing.md5i32($"event_id".cast("string"), 29) % 10 === 0))
  }

  /** Exactly-once repair, batch form: keep one copy per event key. */
  def dedupEvents(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")

  /** Exactly-once repair, streaming form: the caller watermarks `ts`,
    * and `dropDuplicatesWithinWatermark` keeps dedup state only for
    * the watermark lifetime — the 100-TB posture (plain streaming
    * `dropDuplicates` accumulates every key ever seen and ooms a
    * long-running ingest; within-watermark state is bounded by the
    * delay window, which is the correct contract for broker retries
    * that arrive near their original). Stream == batch pinned by
    * spec for in-window duplicates. */
  def dedupEventsStream(events: DataFrame): DataFrame =
    events.dropDuplicatesWithinWatermark("event_id")

  /** Delivery-repair accounting per event type over the re-delivered
    * stream: rows delivered, unique events, duplicates dropped. */
  def eventsDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    withRedelivery(Tables.events(spark, sfDir))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_delivered"),
        count_distinct($"event_id").as("n_unique"))
      .select($"event_type", $"n_delivered", $"n_unique",
        ($"n_delivered" - $"n_unique").as("n_dupes"))
      .orderBy($"event_type")
  }

  val eventsDedupSql: String = {
    val h = graft.functions.Hashing.md5i32Sql("CAST(event_id AS VARCHAR)", 29)
    s"""WITH d AS (
       |  SELECT event_type, event_id FROM events
       |  UNION ALL
       |  SELECT event_type, event_id FROM events WHERE $h % 10 = 0)
       |SELECT event_type, COUNT(*) AS n_delivered,
       |  COUNT(DISTINCT event_id) AS n_unique,
       |  COUNT(*) - COUNT(DISTINCT event_id) AS n_dupes
       |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  def eventsAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    attributionPairs(
      ev.filter($"event_type" === "click"),
      ev.filter($"event_type" === "purchase"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_attributed"),
        sum(dec($"purchase_value")).cast("double").as("attributed_value"))
      .orderBy($"user_id")
  }

  val eventsAttributionSql: String =
    """SELECT c.user_id, COUNT(*) AS n_attributed,
      |  CAST(SUM(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS attributed_value
      |FROM events c JOIN events p
      |  ON c.user_id = p.user_id
      | AND c.event_type = 'click' AND p.event_type = 'purchase'
      | AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 30 MINUTE
      |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin

  /** Batch twin of [[attributionOuter]]: per-user conversion funnel —
    * matched pairs, unconverted clicks, attributed value. */
  def eventsAttributionOuter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    attributionOuter(
      ev.filter($"event_type" === "click"),
      ev.filter($"event_type" === "purchase"))
      .groupBy($"user_id")
      .agg(count($"purchase_id").as("n_attributed"),
        sum(when($"purchase_id".isNull, 1).otherwise(0)).cast("long")
          .as("n_unmatched_clicks"),
        sum(dec($"purchase_value")).cast("double").as("attributed_value"))
      .orderBy($"user_id")
  }

  val eventsAttributionOuterSql: String =
    """SELECT c.user_id, COUNT(p.event_id) AS n_attributed,
      |  CAST(SUM(CASE WHEN p.event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_unmatched_clicks,
      |  CAST(SUM(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS attributed_value
      |FROM events c LEFT JOIN events p
      |  ON c.user_id = p.user_id AND p.event_type = 'purchase'
      | AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 30 MINUTE
      |WHERE c.event_type = 'click'
      |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin

  /** Batch twin of [[attributionFull]]: per-user conversion census
    * including the organic-purchase column. */
  def eventsAttributionFull(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    attributionFull(
      ev.filter($"event_type" === "click"),
      ev.filter($"event_type" === "purchase"))
      .groupBy($"user_id")
      .agg(
        sum(when($"click_id".isNotNull && $"purchase_id".isNotNull, 1)
          .otherwise(0)).cast("long").as("n_attributed"),
        sum(when($"purchase_id".isNull, 1).otherwise(0)).cast("long")
          .as("n_unmatched_clicks"),
        sum(when($"click_id".isNull, 1).otherwise(0)).cast("long")
          .as("n_organic_purchases"),
        sum(when($"click_id".isNotNull, dec($"purchase_value")))
          .cast("double").as("attributed_value"))
      .orderBy($"user_id")
  }

  val eventsAttributionFullSql: String =
    """SELECT COALESCE(c.user_id, p.user_id) AS user_id,
      |  CAST(SUM(CASE WHEN c.event_id IS NOT NULL
      |                 AND p.event_id IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_attributed,
      |  CAST(SUM(CASE WHEN p.event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_unmatched_clicks,
      |  CAST(SUM(CASE WHEN c.event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_organic_purchases,
      |  CAST(SUM(CASE WHEN c.event_id IS NOT NULL
      |            THEN CAST(p.value AS DECIMAL(18,2)) END) AS DOUBLE)
      |    AS attributed_value
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id
      | AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 30 MINUTE
      |GROUP BY COALESCE(c.user_id, p.user_id)
      |ORDER BY user_id""".stripMargin

  def eventsSession(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    sessionStatsPerUser(Tables.events(spark, sfDir))
      .orderBy($"user_id")
  }

  /** DuckDB mirror via gaps-and-islands: session boundary when the
    * in-user gap is >= 30 minutes (matches session_window: an event
    * at exactly previous_ts + gap starts a NEW session). */
  val eventsSessionSql: String =
    """WITH marked AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      |), sessions AS (
      |  SELECT user_id, ts,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM marked
      |), per_session AS (
      |  SELECT user_id, session_id, COUNT(*) AS session_events
      |  FROM sessions GROUP BY user_id, session_id
      |)
      |SELECT user_id, COUNT(*) AS n_sessions,
      |  CAST(SUM(session_events) AS BIGINT) AS n_events,
      |  CAST(MAX(session_events) AS BIGINT) AS max_session_events
      |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------
  // streaming changelog compaction — last-writer-wins on ingest
  // ---------------------------------------------------------------

  /** Streaming form of [[graft.operators.Relational.cdcCompactOf]]:
    * maintain the latest-snapshot row per key as a changelog streams
    * in. State per key is ONE (ts, seq, op, value) winner plus a
    * counter — O(1) however long the history — and each micro-batch
    * emits the refreshed snapshot row for the keys it touched
    * (Update mode; a `last_op = "D"` row retracts the key
    * downstream). Late entries are handled by VALUE, not arrival:
    * the (ts, seq) comparison makes the merge order-insensitive, so
    * no watermark is needed for correctness — the batch twin over
    * the same log is bit-equal whatever the arrival order (spec
    * replays shuffled arrivals).
    *
    * Scale posture: state is keys × O(1); the stream shuffles once
    * on key per micro-batch. The same shape Kafka log compaction
    * runs continuously, expressed as Spark streaming state. */
  def cdcCompactStream(log: Dataset[CdcOp]): Dataset[CdcRow] = {
    val spark = log.sparkSession
    import spark.implicits._
    val fn = (key: Long, rows: Iterator[CdcOp], state: GroupState[CdcState]) => {
      var st = state.getOption.getOrElse(
        CdcState(Long.MinValue, Long.MinValue, "", 0.0, 0L))
      rows.foreach { r =>
        val t = r.ts.getTime
        val newer = t > st.ts_ms || (t == st.ts_ms && r.seq > st.seq)
        st =
          if (newer) CdcState(t, r.seq, r.op, r.value, st.n_ops + 1)
          else st.copy(n_ops = st.n_ops + 1)
      }
      state.update(st)
      CdcRow(key, st.n_ops, st.op, st.value, st.ts_ms)
    }
    log.groupByKey(_.key).mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }

  // ---------------------------------------------------------------
  // streaming sequence packing — stateful bin assignment on ingest
  // ---------------------------------------------------------------

  /** Incremental sequence packing over a document STREAM: each
    * language keeps one counter (total tokens packed so far) as
    * custom state, and every arriving doc is assigned the context
    * window its first token lands in — the ingest-time form of
    * [[graft.operators.TextAnalytics.seqPackOf]] (shards = 1), whose
    * batch window-cumsum computes the identical assignment.
    * Assignments are FINAL on emission (the cursor only moves
    * forward), so the query runs in Append mode with O(1) state per
    * language stream.
    *
    * Ordering contract: docs arrive in doc_id order per language
    * across batches (ingestion order); within a micro-batch the
    * group sorts by doc_id. */
  def packStream(docs: Dataset[PackDoc], ctx: Int = 512): Dataset[PackAssign] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fn = (lang: String, rows: Iterator[PackDoc],
              state: GroupState[PackCursor]) => {
      var cum = state.getOption.map(_.cum).getOrElse(0L)
      val out = rows.toSeq.sortBy(_.doc_id).map { d =>
        val start = cum
        cum += d.n_tokens
        PackAssign(d.doc_id, lang, start / ctx,
          d.n_tokens > 0 && (cum - 1) / ctx > start / ctx)
      }
      state.update(PackCursor(cum))
      out.iterator
    }
    docs.groupByKey(_.lang)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Harness entry (`llm_seq_pack_assign`): the batch twin's per-doc
    * assignments over the documents table, oracle-checked row by row
    * (the aggregate view is `llm_seq_pack`). */
  def seqPackAssign(spark: SparkSession, sfDir: String,
                    ctx: Int = 512): DataFrame = {
    import spark.implicits._
    packBatch(
      Tables.documents(spark, sfDir)
        .select($"doc_id", $"lang",
          size(graft.functions.TextAnalysis.tokens($"text")).cast("long")
            .as("n_tokens"))
        .as[PackDoc], ctx)
      .toDF().orderBy($"doc_id")
  }

  def seqPackAssignSql(ctx: Int = 512): String =
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |         len(${graft.functions.TextAnalysis.tokensSql}) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, lang, n_tokens,
       |         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |                             ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM d)
       |SELECT doc_id, lang,
       |  CAST((cum - n_tokens) // $ctx AS BIGINT) AS bin,
       |  n_tokens > 0 AND (cum - 1) // $ctx > (cum - n_tokens) // $ctx
       |    AS crosses
       |FROM c ORDER BY doc_id""".stripMargin

  /** [[packStream]] at production parallelism: state keyed on
    * `(lang, shard)` with `shard = doc_id % shards`, so concurrent
    * cursors scale with `langs × shards` instead of hitting the
    * |langs| ceiling one-cursor-per-language imposes at 100 TB ingest
    * (round-5 verdict item 4). Bins never span shards — the same
    * contract as [[graft.operators.TextAnalytics.seqPackOf]]'s
    * sharded audit — so each cursor is still O(1) state and
    * assignments stay final on emission (Append mode). Ordering
    * contract: docs arrive in doc_id order per language, which
    * implies doc_id order per (lang, shard). */
  def packStreamSharded(docs: Dataset[PackDoc], ctx: Int = 512,
                        shards: Int = 4): Dataset[PackAssignShard] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fn = (key: (String, Long), rows: Iterator[PackDoc],
              state: GroupState[PackCursor]) => {
      var cum = state.getOption.map(_.cum).getOrElse(0L)
      val out = rows.toSeq.sortBy(_.doc_id).map { d =>
        val start = cum
        cum += d.n_tokens
        PackAssignShard(d.doc_id, key._1, key._2, start / ctx,
          d.n_tokens > 0 && (cum - 1) / ctx > start / ctx)
      }
      state.update(PackCursor(cum))
      out.iterator
    }
    docs.groupByKey(d => (d.lang, d.doc_id % shards))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** [[packStreamSharded]] re-expressed on Spark 4's
    * `transformWithState` — the successor API to
    * `flatMapGroupsWithState`, and the forward-looking 100-TB state
    * story: named state variables (`ValueState`) instead of one
    * opaque blob, per-variable TTL, and a contract that REQUIRES the
    * RocksDB state store (state lives on executor SSD, not heap).
    * Assignment arithmetic and the ordering contract are shared with
    * the fMGWS form verbatim; the spec pins assignment-level equality
    * between the two APIs and the batch twin. */
  def packStreamTws(docs: Dataset[PackDoc], ctx: Int = 512,
                    shards: Int = 4): Dataset[PackAssignShard] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(d => (d.lang, d.doc_id % shards))
      .transformWithState(new PackProcessor(ctx),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  /** The per-(lang, shard) cursor as a [[StatefulProcessor]]: one
    * named `ValueState[Long]` ("cum", no TTL — packing state is
    * permanent for the stream's lifetime) holding tokens packed so
    * far; every arriving doc is assigned the bin its first token
    * lands in, final on emission. */
  private class PackProcessor(ctx: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      (String, Long), PackDoc, PackAssignShard] {

    @transient private var cursor:
      org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      cursor = getHandle.getValueState[Long]("cum",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: (String, Long), rows: Iterator[PackDoc],
                                 tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[PackAssignShard] = {
      var cum = if (cursor.exists()) cursor.get() else 0L
      val out = rows.toSeq.sortBy(_.doc_id).map { d =>
        val start = cum
        cum += d.n_tokens
        PackAssignShard(d.doc_id, key._1, key._2, start / ctx,
          d.n_tokens > 0 && (cum - 1) / ctx > start / ctx)
      }
      cursor.update(cum)
      out.iterator
    }
  }

  /** The batch twin of [[packStreamSharded]]: one window cumsum per
    * (lang, shard) stream. */
  def packBatchSharded(docs: Dataset[PackDoc], ctx: Int = 512,
                       shards: Int = 4): Dataset[PackAssignShard] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang", $"shard").orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs.toDF()
      .withColumn("shard", pmod($"doc_id", lit(shards)).cast("long"))
      .withColumn("cum", sum($"n_tokens").over(w))
      .select($"doc_id", $"lang", $"shard",
        floor(($"cum" - $"n_tokens") / ctx).as("bin"),
        ($"n_tokens" > 0 &&
          floor(($"cum" - 1) / ctx) > floor(($"cum" - $"n_tokens") / ctx))
          .as("crosses"))
      .as[PackAssignShard]
  }

  /** Harness entry (`llm_seq_pack_assign_sharded`): the sharded batch
    * twin's per-doc assignments over the documents table. */
  def seqPackAssignSharded(spark: SparkSession, sfDir: String,
                           ctx: Int = 512, shards: Int = 4): DataFrame = {
    import spark.implicits._
    packBatchSharded(
      Tables.documents(spark, sfDir)
        .select($"doc_id", $"lang",
          size(graft.functions.TextAnalysis.tokens($"text")).cast("long")
            .as("n_tokens"))
        .as[PackDoc], ctx, shards)
      .toDF().orderBy($"doc_id")
  }

  def seqPackAssignShardedSql(ctx: Int = 512, shards: Int = 4): String =
    s"""WITH d AS (
       |  SELECT doc_id, lang, doc_id % $shards AS shard,
       |         len(${graft.functions.TextAnalysis.tokensSql}) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, lang, shard, n_tokens,
       |         SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
       |                             ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM d)
       |SELECT doc_id, lang, CAST(shard AS BIGINT) AS shard,
       |  CAST((cum - n_tokens) // $ctx AS BIGINT) AS bin,
       |  n_tokens > 0 AND (cum - 1) // $ctx > (cum - n_tokens) // $ctx
       |    AS crosses
       |FROM c ORDER BY doc_id""".stripMargin

  /** The batch twin of [[packStream]]: identical per-doc assignments
    * from one window cumsum — the differential check's reference. */
  def packBatch(docs: Dataset[PackDoc], ctx: Int = 512): Dataset[PackAssign] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs.toDF()
      .withColumn("cum", sum($"n_tokens").over(w))
      .select($"doc_id", $"lang",
        floor(($"cum" - $"n_tokens") / ctx).as("bin"),
        ($"n_tokens" > 0 &&
          floor(($"cum" - 1) / ctx) > floor(($"cum" - $"n_tokens") / ctx))
          .as("crosses"))
      .as[PackAssign]
  }
}

case class PackDoc(doc_id: Long, lang: String, n_tokens: Long)
case class PackCursor(cum: Long)
case class PackAssign(doc_id: Long, lang: String, bin: Long, crosses: Boolean)
case class PackAssignShard(doc_id: Long, lang: String, shard: Long,
                           bin: Long, crosses: Boolean)
