package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators the reference lacks entirely but any
  * large-scale event/training pipeline needs: calendar gap-fill with
  * forward-fill resampling, and an interval (range) join decomposed
  * into a bounded equi-join on fixed-width time buckets.
  *
  * Scale posture (100 TB):
  *  - Gap-fill expands each key to its OWN [min, max] calendar — the
  *    blow-up is bounded by keys × span-days, never keys × global
  *    span; the join back to observations is an equi-join on
  *    (key, day), and the forward fill is one window pass in the
  *    same (key, day) partitioning — the sort is reused, no second
  *    shuffle.
  *  - The range join never materializes the cross product a naive
  *    θ-join plans (BroadcastNestedLoop): probes hash to ONE bucket,
  *    intervals explode to the few buckets they overlap
  *    (span/width + 1), and the bucket equi-join + residual
  *    predicate is the standard interval-join decomposition (Flink's
  *    interval join and KDB's window join use the same shape). Each
  *    (interval, probe) pair meets in exactly one bucket — the
  *    probe's — so no post-join dedup is needed.
  */
object TimeSeries {

  private def dec(c: Column) = c.cast("decimal(18,2)")

  // ---------------------------------------------------------------
  // rel_events_gapfill — daily resample with forward fill
  // ---------------------------------------------------------------

  /** Daily per-user activity with calendar gaps filled: absent days
    * appear with `n_events = 0` and `filled_value` carried forward
    * from the last active day (the resample → ffill idiom). */
  def gapFillDaily(spark: SparkSession, sfDir: String,
                   maxUser: Long = 20): DataFrame = {
    import spark.implicits._
    gapFillDailyOf(Tables.events(spark, sfDir).filter($"user_id" <= maxUser))
  }

  /** [[gapFillDaily]] over any `(user_id, ts, value)` frame. */
  def gapFillDailyOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val daily = events
      .groupBy($"user_id", date_trunc("day", $"ts").as("day"))
      .agg(count(lit(1)).as("n"), sum(dec($"value")).as("sv"))
    // per-key calendar: sequence() is bounded by the key's own span
    val cal = daily.groupBy($"user_id")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
      .select($"user_id",
        explode(sequence($"d0", $"d1", expr("INTERVAL 1 DAY"))).as("day"))
    val w = Window.partitionBy($"user_id").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily, Seq("user_id", "day"), "left")
      .withColumn("filled_value",
        last($"sv", ignoreNulls = true).over(w).cast("double"))
      .select($"user_id",
        date_format($"day", "yyyy-MM-dd").as("day"),
        coalesce($"n", lit(0L)).cast("long").as("n_events"),
        $"filled_value")
      .orderBy($"user_id", $"day")
  }

  val gapFillDailySql: String =
    """WITH daily AS (
      |  SELECT user_id, time_bucket(INTERVAL 1 DAY, CAST(ts AS TIMESTAMP)) AS day,
      |         COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,2))) AS sv
      |  FROM events WHERE user_id <= 20 GROUP BY 1, 2),
      |cal AS (
      |  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      |  FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
      |        FROM daily GROUP BY user_id)),
      |j AS (
      |  SELECT c.user_id, c.day, d.n, d.sv
      |  FROM cal c LEFT JOIN daily d
      |    ON c.user_id = d.user_id AND c.day = d.day)
      |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
      |       CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
      |       CAST(LAST_VALUE(sv IGNORE NULLS) OVER (
      |         PARTITION BY user_id ORDER BY day
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |         AS filled_value
      |FROM j ORDER BY user_id, day""".stripMargin

  // ---------------------------------------------------------------
  // rel_range_join_weekly — interval join via bucket decomposition
  // ---------------------------------------------------------------

  /** Generic interval join: rows of `probe` whose `tsCol` falls in
    * `[startCol, endCol)` of `intervals`, WITHOUT the cartesian plan
    * Spark produces for a bare θ-join. Probes get one fixed-width
    * bucket, intervals explode to every bucket they overlap, the
    * bucket becomes an equi-join key, and the original predicate
    * remains as a residual filter. Choose `bucketDays` near the
    * typical interval span: shorter buckets mean more interval
    * replicas; longer buckets mean more residual-filtered probes. */
  def rangeJoinOf(probe: DataFrame, tsCol: String,
                  intervals: DataFrame, startCol: String, endCol: String,
                  bucketDays: Int = 7): DataFrame = {
    require(bucketDays > 0, s"bucketDays must be positive, got $bucketDays")
    val w = lit(86400L * bucketDays)
    val pb = probe.withColumn("__bucket",
      floor(unix_timestamp(col(tsCol)) / w))
    // end-exclusive: the last covered bucket is end - 1 second's
    val ib = intervals.withColumn("__bucket",
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / w),
        floor((unix_timestamp(col(endCol)) - 1) / w))))
    ib.join(pb, Seq("__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }

  /** Catalog instance: lineitems shipped within 7 days of an urgent
    * order's date, counted per order — the "activity inside each
    * maintenance window" query shape. */
  def rangeJoinWeekly(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val iv = Tables.orders(spark, sfDir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey", $"o_orderdate".as("w_start"),
        expr("o_orderdate + INTERVAL 7 DAYS").as("w_end"))
    val probe = Tables.lineitem(spark, sfDir)
      .filter($"l_suppkey" <= 2)
      .select($"l_shipdate", $"l_quantity")
    rangeJoinOf(probe, "l_shipdate", iv, "w_start", "w_end", bucketDays = 7)
      .groupBy($"o_orderkey")
      .agg(count(lit(1)).as("n_in_window"),
        sum(dec($"l_quantity")).cast("double").as("qty_in_window"))
      .orderBy($"o_orderkey")
  }

  val rangeJoinWeeklySql: String =
    """SELECT o_orderkey, COUNT(*) AS n_in_window,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |         AS qty_in_window
      |FROM orders o JOIN lineitem l
      |  ON l.l_shipdate >= o.o_orderdate
      | AND l.l_shipdate <  o.o_orderdate + INTERVAL 7 DAY
      |WHERE o.o_orderpriority = '1-URGENT' AND l.l_suppkey <= 2
      |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------
  // rel_scd2 — slowly-changing-dimension (type 2) history build
  // ---------------------------------------------------------------

  /** Build SCD type-2 version history from an append-only change
    * stream: each change to a key opens a new version row whose
    * validity interval [valid_from, valid_to) closes when the NEXT
    * change arrives; the last version per key stays open
    * (valid_to NULL, is_current true). The history-keeping complement
    * to [[Relational.applyChanges]], which maintains only the latest
    * snapshot.
    *
    * Scale posture: ONE shuffle — the per-key window (row_number +
    * lead share a single partition+sort). No joins, no global state;
    * at 100 TB this is the textbook "windows over the change log"
    * dimension build, and the sink would write partitioned by
    * is_current so current-version reads never scan history.
    */
  def scd2(spark: SparkSession, sfDir: String, maxUser: Long = 30L): DataFrame =
    scd2Of(Tables.events(spark, sfDir)
      .filter(col("user_id") < maxUser)
      .select(col("user_id").as("key"), col("ts"),
        col("event_id").as("seq"), col("event_type").as("attr")))

  /** Caller-frame form over any `(key, ts, seq, attr)` change log
    * (`seq` breaks same-timestamp ties deterministically). */
  def scd2Of(changes: DataFrame): DataFrame = {
    import changes.sparkSession.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"key").orderBy($"ts", $"seq")
    changes
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("next_ts", lead($"ts", 1).over(w))
      .select(
        $"key", $"version", $"attr",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        date_format($"next_ts", "yyyy-MM-dd HH:mm:ss").as("valid_to"),
        $"next_ts".isNull.as("is_current"))
      .orderBy($"key", $"version")
  }

  // ---------------------------------------------------------------
  // rel_events_retention — cohort retention matrix
  // ---------------------------------------------------------------

  /** Cohort retention matrix: users cohorted by their FIRST active
    * day, then counted distinct per (cohort_day, day_offset) for
    * offsets 0..`maxOffset` — the product-analytics complement of
    * the funnel (how many of each day's new users come back on day
    * k). `n_users` at offset 0 is the cohort size.
    *
    * Scale posture (100 TB): the event stream collapses FIRST to
    * distinct (user, day) — bounded by users × active days, ≪ raw
    * events — in one partial+final aggregate; the cohort frame
    * (per-user min day) groups on the same user key, so the join
    * back is user-co-partitioned (AQE reuses the exchange), and the
    * matrix itself is ≤ days × offsets rows. Nothing after the first
    * aggregate is corpus-proportional. */
  def eventsRetention(spark: SparkSession, sfDir: String,
                      maxOffset: Int = 14): DataFrame = {
    import spark.implicits._
    require(maxOffset >= 0, s"offset bound must be >= 0, got $maxOffset")
    val ev = Tables.events(spark, sfDir)
      .select($"user_id", to_date($"ts").as("d")).distinct()
    val cohort = ev.groupBy($"user_id").agg(min($"d").as("cohort_day"))
    ev.join(cohort, "user_id")
      .withColumn("day_offset", datediff($"d", $"cohort_day").cast("long"))
      .filter($"day_offset" <= maxOffset)
      .groupBy($"cohort_day", $"day_offset")
      .agg(count_distinct($"user_id").as("n_users"))
      .orderBy($"cohort_day", $"day_offset")
  }

  def eventsRetentionSql(maxOffset: Int = 14): String =
    s"""WITH ev AS (
       |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
       |c AS (SELECT user_id, MIN(d) AS cohort_day FROM ev GROUP BY user_id)
       |SELECT c.cohort_day, CAST(ev.d - c.cohort_day AS BIGINT) AS day_offset,
       |  COUNT(DISTINCT ev.user_id) AS n_users
       |FROM ev JOIN c ON ev.user_id = c.user_id
       |WHERE ev.d - c.cohort_day <= $maxOffset
       |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin

  // ---------------------------------------------------------------
  // rel_events_dau_wau — rolling distinct-active stickiness
  // ---------------------------------------------------------------

  /** DAU / trailing-7-day WAU per day (the "stickiness" product
    * metric). Distinct-over-a-sliding-window can't ride a plain
    * window function (count_distinct isn't decomposable), so each
    * (user, day) activity is EXPLODED to the 7 trailing windows it
    * belongs to and WAU is an ordinary distinct count per day — the
    * scatter-to-windows trick the sliding-window stream op uses,
    * with fan-out fixed at 7.
    *
    * Scale posture: the corpus collapses FIRST to distinct
    * (user, day); the 7× explode applies to that bounded frame, not
    * the raw events, and both distinct counts shuffle on (day, user)
    * — nothing corpus-proportional past the opening aggregate. */
  def eventsDauWau(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ud = Tables.events(spark, sfDir)
      .select(to_date($"ts").as("d"), $"user_id").distinct()
    val wau = ud
      .select(explode(sequence($"d", date_add($"d", 6))).as("day"), $"user_id")
      .groupBy($"day").agg(count_distinct($"user_id").as("wau"))
    val dau = ud.groupBy($"d".as("day"))
      .agg(count_distinct($"user_id").as("dau"))
    dau.join(wau, "day")
      .select($"day", $"dau", $"wau",
        round($"dau".cast("double") / $"wau", 6).as("stickiness"))
      .orderBy($"day")
  }

  val eventsDauWauSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
      |w AS (SELECT d + CAST(k AS INT) AS day, user_id
      |      FROM ud, range(7) t(k)),
      |wau AS (SELECT day, COUNT(DISTINCT user_id) AS wau FROM w GROUP BY day),
      |dau AS (SELECT d AS day, COUNT(DISTINCT user_id) AS dau
      |        FROM ud GROUP BY d)
      |SELECT dau.day, dau.dau, wau.wau,
      |  round(dau::DOUBLE / wau, 6) AS stickiness
      |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin

  // ---------------------------------------------------------------
  // rel_point_in_time_features — leakage-safe training-set assembly
  // ---------------------------------------------------------------

  /** Point-in-time feature assembly — the feature-store operation
    * behind every supervised training set built from event logs: for
    * each prediction point (here: a `purchase` event, whose `value`
    * is the label), attach per-user features computed ONLY from
    * events STRICTLY BEFORE the prediction timestamp (click count,
    * average click value, view count, last error value). The strict
    * `[-∞, -1 row)` frame is what makes the join leakage-safe — a
    * plain equi-join on user would leak future activity into the
    * features.
    *
    * Implementation: all contributing event types are stacked into
    * ONE stream and every feature rides the SAME per-user window
    * (partition by user, order by (ts, event_id)) — one shuffle, one
    * sort, N features; prediction rows are filtered AFTER the window
    * pass. This is the scalable "stacked events" point-in-time shape:
    * adding a feature table means adding rows to the union and
    * conditional aggregates to the window, never another join. The
    * as-of join ([[Relational.asofJoin]]) is the 1-feature special
    * case.
    *
    * Scale posture (100 TB): one hash partition on user_id; window
    * state is O(1) per feature (running sums / last-seen), sort is
    * bounded by per-user event count. Sums ride decimals so the
    * accumulation order the two engines choose cannot change the
    * result. */
  def pointInTimeFeatures(spark: SparkSession, sfDir: String): DataFrame =
    pointInTimeFeaturesOf(Tables.events(spark, sfDir))

  /** [[pointInTimeFeatures]] over any
    * `(event_id, user_id, ts, event_type, value)` frame. */
  def pointInTimeFeaturesOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .filter($"event_type".isin("purchase", "click", "view", "error"))
      .withColumn("n_clicks_prior",
        sum(when($"event_type" === "click", 1L).otherwise(0L)).over(w))
      .withColumn("click_value_sum",
        sum(when($"event_type" === "click", dec($"value"))).over(w))
      .withColumn("n_views_prior",
        sum(when($"event_type" === "view", 1L).otherwise(0L)).over(w))
      .withColumn("last_error_value",
        last(when($"event_type" === "error", $"value"), ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        $"value".as("label_value"),
        coalesce($"n_clicks_prior", lit(0L)).cast("long").as("n_clicks_prior"),
        when($"n_clicks_prior" > 0,
          round($"click_value_sum".cast("double") / $"n_clicks_prior", 6))
          .as("avg_click_value"),
        coalesce($"n_views_prior", lit(0L)).cast("long").as("n_views_prior"),
        $"last_error_value")
      .orderBy($"event_id")
  }

  val pointInTimeFeaturesSql: String =
    """WITH s AS (
      |  SELECT event_id, user_id, ts, event_type, value,
      |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER w
      |      AS n_clicks_prior,
      |    SUM(CASE WHEN event_type = 'click'
      |             THEN CAST(value AS DECIMAL(18,2)) END) OVER w
      |      AS click_value_sum,
      |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER w
      |      AS n_views_prior,
      |    LAST_VALUE(CASE WHEN event_type = 'error' THEN value END IGNORE NULLS)
      |      OVER w AS last_error_value
      |  FROM events
      |  WHERE event_type IN ('purchase', 'click', 'view', 'error')
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT event_id, user_id,
      |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
      |  value AS label_value,
      |  CAST(COALESCE(n_clicks_prior, 0) AS BIGINT) AS n_clicks_prior,
      |  CASE WHEN n_clicks_prior > 0
      |       THEN ROUND(CAST(click_value_sum AS DOUBLE) / n_clicks_prior, 6)
      |  END AS avg_click_value,
      |  CAST(COALESCE(n_views_prior, 0) AS BIGINT) AS n_views_prior,
      |  last_error_value
      |FROM s WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------
  // rel_concurrency_peak — interval sweep line, segmented by day
  // ---------------------------------------------------------------

  /** Peak concurrent sessions per day — the sweep-line interval
    * aggregate (capacity planning, license counting, connection-pool
    * sizing). Sessions are gaps-and-islands over the event stream
    * (same ≥`gapMinutes` boundary rule as the session-window
    * operator), active from their first event until `gapMinutes`
    * after their last; each interval contributes +1 at start and −1
    * at end, and concurrency at time t is the running sum of deltas.
    *
    * Scale posture (100 TB): a naive sweep is a running sum over ONE
    * global sort — a single-partition window over corpus-sized data.
    * Instead the sweep is SEGMENTED: deltas first coalesce per
    * timestamp (one corpus-bounded aggregate), the running sum is
    * computed per DAY partition, and each day's carry-in is the
    * prefix sum of per-day nets — a second window over ≤ calendar
    * days rows (the [[Relational.outlierZscore]] discipline: the
    * single-partition window runs on calendar-bounded data only).
    * Global running sum = carry-in + day-local running sum, exactly.
    * Each emitted day's peak considers the day's standing carry-in
    * level as well as every post-boundary level, so a day whose
    * first delta is negative (a session end) still reports the
    * higher level it started at. Days with zero boundary events are
    * not emitted (their peak is the standing carry — derivable, but
    * not a boundary-day row). */
  def concurrencyPeak(spark: SparkSession, sfDir: String,
                      gapMinutes: Int = 30): DataFrame =
    concurrencyPeakOf(Tables.events(spark, sfDir), gapMinutes)

  /** [[concurrencyPeak]] over any `(user_id, ts)`-bearing frame. */
  def concurrencyPeakOf(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    require(gapMinutes > 0, s"gap must be positive, got $gapMinutes")
    val gap = s"INTERVAL $gapMinutes MINUTES"
    val wU = Window.partitionBy($"user_id").orderBy($"ts")
    val wRun = wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = events.select($"user_id", $"ts")
      .withColumn("prev", lag($"ts", 1).over(wU))
      .withColumn("new_s",
        when($"prev".isNull || $"ts" >= $"prev" + expr(gap), 1L).otherwise(0L))
      .withColumn("sid", sum($"new_s").over(wRun))
      .groupBy($"user_id", $"sid")
      .agg(min($"ts").as("s_start"),
        (max($"ts") + expr(gap)).as("s_end"))
    val deltas = sessions.select($"s_start".as("t"), lit(1L).as("delta"))
      .unionByName(sessions.select($"s_end".as("t"), lit(-1L).as("delta")))
      .groupBy($"t").agg(sum($"delta").as("net"))
      .withColumn("day", to_date($"t"))
    val wDay = Window.partitionBy($"day").orderBy($"t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = deltas.withColumn("run", sum($"net").over(wDay))
    // carry-in: prefix sum of per-day nets — ≤ calendar-days rows, the
    // only single-partition window in the operator
    val wCal = Window.orderBy($"day").rowsBetween(Window.unboundedPreceding, -1)
    val carry = deltas.groupBy($"day").agg(sum($"net").as("day_net"))
      .withColumn("carry", coalesce(sum($"day_net").over(wCal), lit(0L)))
      .select($"day", $"carry")
    // `carry + run - net` is the level just BEFORE each boundary; for
    // a day's first row that is exactly the carry-in, for later rows
    // it duplicates the previous row's level — already a candidate —
    // so the greatest() adds the one missing candidate and no others
    local.join(carry, Seq("day"))
      .groupBy($"day")
      .agg(max(greatest($"carry" + $"run", $"carry" + $"run" - $"net"))
        .cast("long").as("peak_concurrent"))
      .orderBy($"day")
  }

  def concurrencyPeakSql(gapMinutes: Int = 30): String =
    s"""WITH marked AS (
       |  SELECT user_id, ts,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR ts >= lag(ts) OVER w + INTERVAL $gapMinutes MINUTE
       |         THEN 1 ELSE 0 END AS new_s
       |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       |sess AS (
       |  SELECT user_id, ts,
       |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
       |      ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM marked),
       |iv AS (
       |  SELECT MIN(ts) AS s_start,
       |         MAX(ts) + INTERVAL $gapMinutes MINUTE AS s_end
       |  FROM sess GROUP BY user_id, sid),
       |d AS (
       |  SELECT t, SUM(delta) AS net FROM (
       |    SELECT s_start AS t, 1 AS delta FROM iv
       |    UNION ALL SELECT s_end AS t, -1 AS delta FROM iv)
       |  GROUP BY t),
       |r AS (
       |  SELECT CAST(t AS DATE) AS day, net,
       |    SUM(net) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS run
       |  FROM d)
       |SELECT day,
       |  CAST(MAX(GREATEST(run, run - net)) AS BIGINT) AS peak_concurrent
       |FROM r GROUP BY day ORDER BY day""".stripMargin

  def scd2Sql(maxUser: Long = 30L): String =
    s"""WITH s AS (
       |  SELECT user_id AS key, ts, event_id AS seq, event_type AS attr
       |  FROM events WHERE user_id < $maxUser)
       |SELECT key,
       |  CAST(row_number() OVER w AS BIGINT) AS version,
       |  attr,
       |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS valid_from,
       |  strftime(CAST(lead(ts) OVER w AS TIMESTAMP),
       |           '%Y-%m-%d %H:%M:%S') AS valid_to,
       |  lead(ts) OVER w IS NULL AS is_current
       |FROM s WINDOW w AS (PARTITION BY key ORDER BY ts, seq)
       |ORDER BY key, version""".stripMargin

  // ---------------------------------------------------------------
  // rel_scd2_asof — point-in-time (time-travel) dimension read
  // ---------------------------------------------------------------

  /** AS OF read over the [[scd2]] version history: the dimension
    * exactly as it stood at `asOf` — the version whose validity
    * interval contains the instant (open `valid_to` = still current).
    * This is the lakehouse time-travel primitive expressed over the
    * history table: the same filter a `VERSION AS OF` snapshot read
    * resolves to, but computable on any engine that has the history.
    * Exactly one row per key survives (versions partition time), so
    * the read costs one predicate over the history scan — no window,
    * no join.
    */
  def scd2AsOf(spark: SparkSession, sfDir: String,
               asOf: String = "2024-01-15 00:00:00",
               maxUser: Long = 30L): DataFrame = {
    import spark.implicits._
    scd2(spark, sfDir, maxUser)
      .filter($"valid_from" <= asOf &&
        ($"valid_to".isNull || $"valid_to" > asOf))
      .select($"key", $"version", $"attr", $"valid_from", $"is_current")
      .orderBy($"key")
  }

  def scd2AsOfSql(asOf: String = "2024-01-15 00:00:00",
                  maxUser: Long = 30L): String =
    s"""WITH hist AS (${scd2Sql(maxUser)})
       |SELECT key, version, attr, valid_from, is_current
       |FROM hist
       |WHERE valid_from <= '$asOf'
       |  AND (valid_to IS NULL OR valid_to > '$asOf')
       |ORDER BY key""".stripMargin

  // ---------------------------------------------------------------
  // rel_seasonal_decompose — trend + weekday effect + residual
  // ---------------------------------------------------------------

  /** Classical additive seasonal decomposition of the daily revenue
    * series: revenue = trend + weekday_effect + residual, the
    * pre-processing behind any weekly-seasonality anomaly monitor
    * (a raw z-score flags every Sunday; the residual flags actual
    * anomalies). Trend is the 7-ROW centered moving average over the
    * observed daily series (edge days without a full window are
    * dropped, which also makes every deviation an exact ×7 integer:
    * dev = 7·rev − sum7 stays DECIMAL end-to-end); the weekday effect
    * is the mean deviation per ISO weekday (Mon=0, Spark `weekday` ==
    * DuckDB `isodow − 1`); the residual is what's left. All three
    * components derive from decimal-exact sums — the only doubles are
    * final fixed-parenthesization divisions, so the oracle
    * hash-checks the whole decomposition.
    *
    * Scale: the raw stream collapses to ≤ calendar-days rows first;
    * the single unpartitioned window runs on that bounded frame (the
    * EWMA/outlier precedent), and the 7-row weekday-effect table
    * broadcasts back. */
  def seasonalDecompose(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, sfDir)
      .groupBy(to_date($"o_orderdate").as("day"))
      .agg(sum(dec($"o_totalprice")).as("rev"))
    val w = Window.orderBy($"day").rowsBetween(-3, 3)
    val interior = daily
      .withColumn("n7", count(lit(1)).over(w))
      .withColumn("sum7", sum($"rev").over(w))
      .filter($"n7" === 7)
      .withColumn("trend", round($"sum7".cast("double") / 7.0, 4))
      .withColumn("dev", $"rev" * 7 - $"sum7")
      .withColumn("wd", weekday($"day").cast("long"))
    val eff = interior.groupBy($"wd")
      .agg((sum($"dev")).as("sdev"), count(lit(1)).as("nw"))
      .select($"wd",
        round($"sdev".cast("double") / (lit(7.0) * $"nw".cast("double")), 4)
          .as("effect"))
    interior.join(broadcast(eff), "wd")
      .select($"day".cast("string").as("day"),
        round($"rev".cast("double"), 2).as("revenue"),
        $"trend", $"effect",
        round($"rev".cast("double") - $"trend" - $"effect", 4).as("resid"))
      .orderBy($"day")
  }

  val seasonalDecomposeSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1),
      |t AS (
      |  SELECT day, rev, COUNT(*) OVER w AS n7, SUM(rev) OVER w AS sum7
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |i AS (
      |  SELECT day, rev, round(CAST(sum7 AS DOUBLE) / 7.0, 4) AS trend,
      |    rev * 7 - sum7 AS dev, isodow(day) - 1 AS wd
      |  FROM t WHERE n7 = 7),
      |e AS (
      |  SELECT wd,
      |    round(CAST(SUM(dev) AS DOUBLE) / (7.0 * CAST(COUNT(*) AS DOUBLE)), 4)
      |      AS effect
      |  FROM i GROUP BY wd)
      |SELECT CAST(i.day AS VARCHAR) AS day,
      |  round(CAST(rev AS DOUBLE), 2) AS revenue, trend, effect,
      |  round(CAST(rev AS DOUBLE) - trend - effect, 4) AS resid
      |FROM i JOIN e USING (wd) ORDER BY day""".stripMargin

  // ---------------------------------------------------------------
  // rel_seasonal_anomaly — seasonally-adjusted MAD anomaly flags
  // ---------------------------------------------------------------

  /** Anomaly flags on the DESEASONALIZED series: the additive
    * decomposition's residual, screened by the robust median/MAD
    * rule (|resid − med| > 3·MAD). This is the composition the two
    * building blocks exist for — the raw z-score flags every busy
    * weekday as an outlier (the decompose operator's own
    * motivation), and a mean/σ rule lets one true spike inflate σ
    * and hide its twin; median/MAD on the residual does neither.
    *
    * Determinism: residuals land on the 1e-4 grid (the decompose
    * rounding contract) and are integerized by round-then-cast;
    * both medians are exact lower medians by rank (day tie-break),
    * and the flag compare is integer cross-multiplication
    * (dev > 3·mad exactly). Zero-MAD (a constant residual) flags
    * nothing by definition — CASE-guarded.
    *
    * Scale: everything downstream of the decompose runs on the
    * ≤ calendar-days frame (two rank selections + one filter). */
  def seasonalAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d = seasonalDecompose(spark, sfDir)
      .select($"day", $"revenue", $"resid",
        expr("CAST(round(resid * 10000) AS BIGINT)").as("r4"))
    val med = d
      .withColumn("rn", row_number()
        .over(Window.orderBy($"r4", $"day")).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()).cast("long"))
      .filter($"rn" === expr("(n + 1) DIV 2"))
      .select($"r4".as("med4"))
    val dev = d.crossJoin(broadcast(med)) // 1-row median
      .withColumn("dev4", abs($"r4" - $"med4"))
    val mad = dev
      .withColumn("rn", row_number()
        .over(Window.orderBy($"dev4", $"day")).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()).cast("long"))
      .filter($"rn" === expr("(n + 1) DIV 2"))
      .select($"dev4".as("mad4"))
    dev.crossJoin(broadcast(mad)) // 1-row MAD
      .filter($"mad4" > 0L && $"dev4" > $"mad4" * 3L)
      .select($"day", $"revenue", $"resid",
        ($"dev4".cast("double") / 10000.0).as("abs_dev"),
        ($"mad4".cast("double") / 10000.0).as("mad"))
      .orderBy($"day")
  }

  def seasonalAnomalySql(): String =
    s"""WITH dcmp AS (${seasonalDecomposeSql.replace("\n", "\n")}),
       |d AS (SELECT day, revenue, resid,
       |        CAST(round(resid * 10000) AS BIGINT) AS r4
       |      FROM dcmp),
       |med AS (SELECT r4 AS med4 FROM (
       |          SELECT r4, ROW_NUMBER() OVER (ORDER BY r4, day) AS rn,
       |                 COUNT(*) OVER () AS n
       |          FROM d) WHERE rn = (n + 1) // 2),
       |dev AS (SELECT day, revenue, resid, abs(r4 - med4) AS dev4
       |        FROM d, med),
       |mad AS (SELECT dev4 AS mad4 FROM (
       |          SELECT dev4, ROW_NUMBER() OVER (ORDER BY dev4, day) AS rn,
       |                 COUNT(*) OVER () AS n
       |          FROM dev) WHERE rn = (n + 1) // 2)
       |SELECT day, revenue, resid,
       |  CAST(dev4 AS DOUBLE) / 10000.0 AS abs_dev,
       |  CAST(mad4 AS DOUBLE) / 10000.0 AS mad
       |FROM dev, mad
       |WHERE mad4 > 0 AND dev4 > mad4 * 3
       |ORDER BY day""".stripMargin

  // ---------------------------------------------------------------
  // rel_revenue_drawdown — cumulative-deviation regime monitor
  // ---------------------------------------------------------------

  /** Report the `k` deepest drawdown days. */
  val DrawdownTopK = 15

  /** Cumulative-deviation drawdown of the daily revenue series — the
    * window-expressible cousin of CUSUM changepoint detection (CUSUM's
    * `max(0, prev + δ)` recursion has no closed window form; the
    * drawdown `runmax(cum) − cum` flags the same sustained-drop
    * regimes and is two plain window functions). The series is
    * centered on the GLOBAL mean so flat periods hold the cumulative
    * path level: a sustained below-mean regime walks the path down
    * and the gap to its running maximum is the drawdown depth.
    *
    * Integer-exact construction: centering on μ = S/n would leave
    * decimal land (μ is rational), so the path is scaled by n —
    * cum_d = Σ_{j≤d} (n·x_j − S), an exact DECIMAL walk — and depth
    * scales back by one final division. Output: the [[DrawdownTopK]]
    * deepest days (day, revenue, depth), depth in revenue units.
    *
    * Scale: raw stream → ≤ calendar-days frame first; one
    * unpartitioned window over that bounded frame (EWMA precedent);
    * top-k via TakeOrdered. */
  def revenueDrawdown(spark: SparkSession, sfDir: String,
                      k: Int = DrawdownTopK): DataFrame = {
    import spark.implicits._
    revenueDrawdownOf(
      Tables.orders(spark, sfDir)
        .groupBy(to_date($"o_orderdate").as("day"))
        .agg(sum(dec($"o_totalprice")).as("rev")),
      k)
  }

  /** [[revenueDrawdown]] over any `(day, rev: decimal)` daily frame. */
  private[graft] def revenueDrawdownOf(daily: DataFrame, k: Int): DataFrame = {
    import daily.sparkSession.implicits._
    val stats = daily.agg(sum($"rev").as("s"), count(lit(1)).as("n"))
    val cumW = Window.orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.crossJoin(broadcast(stats))
      .withColumn("cum", sum($"rev" * $"n" - $"s").over(cumW))
      .withColumn("peak", max($"cum").over(cumW))
      .select($"day".cast("string").as("day"),
        round($"rev".cast("double"), 2).as("revenue"),
        round(($"peak" - $"cum").cast("double") / $"n".cast("double"), 4)
          .as("depth"))
      .orderBy($"depth".desc, $"day")
      .limit(k)
  }

  def revenueDrawdownSql(k: Int = DrawdownTopK): String =
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day,
       |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
       |  FROM orders GROUP BY 1),
       |st AS (SELECT SUM(rev) AS s, COUNT(*) AS n FROM daily),
       |c AS (
       |  SELECT day, rev, n,
       |    SUM(rev * n - s) OVER w AS cum
       |  FROM daily CROSS JOIN st
       |  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
       |               AND CURRENT ROW)),
       |p AS (
       |  SELECT day, rev, n, cum, MAX(cum) OVER w AS peak
       |  FROM c
       |  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
       |               AND CURRENT ROW))
       |SELECT CAST(day AS VARCHAR) AS day,
       |  round(CAST(rev AS DOUBLE), 2) AS revenue,
       |  round(CAST(peak - cum AS DOUBLE) / CAST(n AS DOUBLE), 4) AS depth
       |FROM p ORDER BY depth DESC, day LIMIT $k""".stripMargin

  // ---------------------------------------------------------------
  // rel_ewma_daily — exponentially weighted smoothing
  // ---------------------------------------------------------------

  /** EWMA lag horizon / decay — one definition for the operator and
    * its oracle. */
  val EwmaLags = 14
  val EwmaAlpha = 0.3

  /** Truncated exponentially-weighted moving average of daily revenue
    * per order priority: the adjust=True EWM (`Σ (1−α)^(t−j) x_j /
    * Σ (1−α)^(t−j)`) cut at [[EwmaLags]] trailing OBSERVATIONS (a
    * ROWS frame: for a series with calendar gaps the frame may span
    * more than 14 calendar days — decay is per observed day, which is
    * the intended semantics for a daily aggregate that only emits
    * days with data; densify upstream with a [[gapFillDailyOf]]-style
    * calendar spine if strict calendar decay is needed). Truncation is
    * the SCALE choice, not a shortcut: the closed-form full-history
    * rewrite (`(1−α)^t · Σ x_j (1−α)^{−j}`) overflows doubles after a
    * few hundred days, and a per-row recursive state is not
    * window-expressible — a bounded trailing frame gives bounded
    * per-row work and state forever, and the dropped tail weight is
    * `(1−α)^14 ≈ 0.7 %` of the mass. Weights are applied through an
    * indexed higher-order fold over the frame's `collect_list`
    * (ordered by the window's ORDER BY), and the result is rounded to
    * 4 dp — `pow` is the one cross-engine float in play.
    *
    * Scale: the raw stream collapses to a (priority, day) aggregate
    * first; the windows partition by priority — never global. */
  def ewmaDaily(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    ewmaOf(Tables.orders(spark, sfDir)
      .groupBy($"o_orderpriority".as("priority"),
        to_date($"o_orderdate").as("day"))
      .agg(sum($"o_totalprice".cast("decimal(18,2)")).cast("double")
        .as("revenue")))
  }

  /** Caller-frame form over any `(priority, day, revenue)` series. */
  def ewmaOf(daily: DataFrame): DataFrame = {
    import daily.sparkSession.implicits._
    val q = 1.0 - EwmaAlpha
    val w = Window.partitionBy($"priority").orderBy($"day")
      .rowsBetween(-(EwmaLags - 1), Window.currentRow)
    daily
      .withColumn("vals", collect_list($"revenue").over(w))
      .withColumn("n", size($"vals"))
      .withColumn("num",
        aggregate(
          zip_with($"vals", sequence(lit(1), $"n"),
            (v, i) => v * pow(lit(q), ($"n" - i).cast("double"))),
          lit(0.0), (acc, x) => acc + x))
      .withColumn("den",
        (lit(1.0) - pow(lit(q), $"n".cast("double"))) / (1.0 - q))
      .select($"priority", $"day", $"revenue",
        round($"num" / $"den", 4).as("ewma"))
      .orderBy($"priority", $"day")
  }

  val ewmaDailySql: String = {
    val q = 1.0 - EwmaAlpha
    s"""WITH daily AS (
       |  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
       |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
       |  FROM orders GROUP BY 1, 2),
       |framed AS (
       |  SELECT priority, day, revenue,
       |    list(revenue) OVER (PARTITION BY priority ORDER BY day
       |      ROWS BETWEEN ${EwmaLags - 1} PRECEDING AND CURRENT ROW) AS vals
       |  FROM daily)
       |SELECT priority, day, revenue,
       |  round(
       |    list_sum([vals[i] * pow($q, len(vals) - i)
       |              for i in range(1, len(vals) + 1)])
       |    / ((1.0 - pow($q, len(vals))) / ${1.0 - q}), 4) AS ewma
       |FROM framed ORDER BY priority, day""".stripMargin
  }

  // ---------------------------------------------------------------
  // rel_forecast_baseline — seasonal-naive backtest by weekday
  // ---------------------------------------------------------------

  /** Seasonal-naive forecast backtest of the daily revenue series:
    * ŷ(d) = y(d − 7 days) — the baseline every forecasting system
    * must beat before it earns its complexity — scored per ISO
    * weekday with the error metrics a backtest reports (n evaluated
    * days, total absolute error, MAPE, sMAPE). Per-weekday rows make
    * the seasonal structure visible: a weekday the naive model
    * forecasts badly is a weekday with unstable demand.
    *
    * The predecessor is joined BY DATE (day − 7), not by 7 rows —
    * row-lag silently misaligns across calendar gaps. Weekday uses
    * the audited ISO mapping ([[graft.sources.Ingest.dateDim]]'s
    * one-place resolution of Spark 1=Sun vs DuckDB isodow).
    *
    * Determinism: revenues are exact cents; each day's percentage
    * error is floor-scaled to the 1e-6 grid BEFORE the mean (a sum
    * of doubles would be order-dependent), and the means are one
    * floor division each — BIGINT arithmetic end to end.
    *
    * Scale: one daily aggregate (partial+final on the date), one
    * self equi-join of the ≤ calendar-days frame, one 7-group
    * aggregate. Nothing scales past the day count. */
  def forecastBaseline(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    forecastBaselineOf(
      Tables.orders(spark, sfDir)
        .groupBy(to_date($"o_orderdate").as("day"))
        .agg(sum(dec($"o_totalprice")).as("rev")))
  }

  /** [[forecastBaseline]] over any `(day, rev: decimal)` frame. */
  private[graft] def forecastBaselineOf(daily: DataFrame): DataFrame = {
    import daily.sparkSession.implicits._
    val cents = daily.select($"day",
      expr("CAST(rev * 100 AS BIGINT)").as("y"))
    val f = cents.as("c")
      .join(cents.select(date_add($"day", 7).as("day"), $"y".as("yhat"))
        .as("p"), Seq("day"))
      .filter($"y" > 0)
      .select($"day", $"y", $"yhat",
        abs($"y" - $"yhat").as("ae"),
        // per-day error cents ·10⁶ in DECIMAL(38,0)/HUGEINT on the
        // two engines — BIGINT would overflow once a single day's
        // revenue error passes ~$9.2e10 (the pareto sf1 lesson,
        // applied proactively to the money-magnitude sites)
        expr("CAST(CAST(abs(y - yhat) AS DECIMAL(38,0)) * 1000000" +
          " DIV y AS BIGINT)").as("ape6"),
        expr("CAST(CAST(abs(y - yhat) AS DECIMAL(38,0)) * 2000000" +
          " DIV (y + yhat) AS BIGINT)").as("sape6"))
    f.groupBy((((dayofweek($"day") + 5) % 7) + 1).cast("bigint")
        .as("iso_dow"))
      .agg(count(lit(1)).as("n_days"),
        (sum($"ae").cast("double") / 100.0).as("total_abs_err"),
        (expr("CAST(SUM(ape6) DIV COUNT(1) AS BIGINT)")
          .cast("double") / 1000000.0).as("mape"),
        (expr("CAST(SUM(sape6) DIV COUNT(1) AS BIGINT)")
          .cast("double") / 1000000.0).as("smape"))
      .orderBy($"iso_dow")
  }

  val forecastBaselineSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
      |      AS y
      |  FROM orders GROUP BY 1),
      |f AS (
      |  SELECT c.day, c.y, p.y AS yhat, abs(c.y - p.y) AS ae,
      |    CAST(CAST(abs(c.y - p.y) AS HUGEINT) * 1000000 // c.y
      |         AS BIGINT) AS ape6,
      |    CAST(CAST(abs(c.y - p.y) AS HUGEINT) * 2000000 // (c.y + p.y)
      |         AS BIGINT) AS sape6
      |  FROM daily c JOIN daily p ON c.day = p.day + 7
      |  WHERE c.y > 0)
      |SELECT CAST(isodow(day) AS BIGINT) AS iso_dow,
      |  CAST(COUNT(*) AS BIGINT) AS n_days,
      |  CAST(SUM(ae) AS DOUBLE) / 100.0 AS total_abs_err,
      |  CAST(SUM(ape6) // COUNT(*) AS DOUBLE) / 1000000.0 AS mape,
      |  CAST(SUM(sape6) // COUNT(*) AS DOUBLE) / 1000000.0 AS smape
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  // rel_markov_transitions — event-type transition matrix
  // ---------------------------------------------------------------

  /** First-order Markov transition matrix of the event stream: for
    * every (prev_type → event_type) step inside a user's timeline,
    * the step count and the row-normalized transition probability —
    * the structure behind next-event prediction, funnel-leak
    * analysis, and bot detection (bots have near-degenerate rows).
    * A user's FIRST event has no predecessor and is excluded (the
    * matrix conditions on a previous state by definition).
    *
    * Determinism: the timeline orders by (ts, event_id) — event_id
    * breaks same-timestamp ties identically in both engines, where
    * bare-ts ordering would leave lag() nondeterministic. Counts are
    * exact integers; each probability is scaled-integer floor
    * division (n·10⁶ DIV total)/10⁶ — the [[dataSkewReport]]
    * precedent; round() after a double divide diverges cross-engine
    * on half-boundary rationals.
    *
    * Scale: one shuffle on user_id for the lag window (each user's
    * sequence sorts locally in its partition — skew-bounded by the
    * busiest single user), then a partial+final count on the
    * (prev, cur) pair; the matrix itself is |types|² rows, driver-
    * safe at any corpus size. The row-total divisor is a window over
    * that |types|²-row frame, not the corpus. */
  def markovTransitions(spark: SparkSession, sfDir: String): DataFrame =
    markovTransitionsOf(Tables.events(spark, sfDir))

  /** [[markovTransitions]] over any `(user_id, ts, event_id,
    * event_type)` frame. */
  private[graft] def markovTransitionsOf(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val seq = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val counts = events
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(seq))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type")
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("tot", sum($"n").over(Window.partitionBy($"prev_type")))
      .select($"prev_type", $"event_type", $"n",
        (expr("CAST((n * 1000000) DIV tot AS BIGINT)")
          .cast("double") / 1000000.0).as("p"))
      .orderBy($"prev_type", $"event_type")
  }

  val markovTransitionsSql: String =
    """WITH steps AS (
      |  SELECT LAG(event_type) OVER
      |           (PARTITION BY user_id ORDER BY ts, event_id)
      |         AS prev_type,
      |         event_type
      |  FROM events),
      |m AS (SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
      |      FROM steps WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT prev_type, event_type, n,
      |        SUM(n) OVER (PARTITION BY prev_type) AS tot FROM m)
      |SELECT prev_type, event_type, n,
      |  CAST((n * 1000000) // tot AS DOUBLE) / 1000000.0 AS p
      |FROM t ORDER BY prev_type, event_type""".stripMargin

  // ---------------------------------------------------------------
  // rel_event_paths — most-common user journeys (3-step paths)
  // ---------------------------------------------------------------

  /** Top event-type PATHS: every consecutive 3-step journey segment
    * per user (ordered by ts with the event_id tie-break — the
    * [[markovTransitions]] determinism call), counted corpus-wide,
    * top 20 by frequency. Where the Markov matrix answers "what
    * follows X", paths answer "which journeys actually happen" —
    * the product-analytics staple the transition matrix marginalizes
    * away (A→B→C and B→C→A share its cells but are different
    * stories).
    *
    * Scale: one user-keyed window (bounded by the busiest user, the
    * sessionization posture), one (path) partial+final count over
    * the ≤|types|³ path space, one bounded TakeOrdered. Counts
    * exact; share floor-scaled. */
  def eventPaths(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame =
    eventPathsOf(Tables.events(spark, sfDir), k)

  /** [[eventPaths]] over any `(user_id, ts, event_id, event_type)`
    * frame. */
  private[graft] def eventPathsOf(events: DataFrame, k: Int = 20): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val seq = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val paths = events
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("e2", lead($"event_type", 1).over(seq))
      .withColumn("e3", lead($"event_type", 2).over(seq))
      .filter($"e2".isNotNull && $"e3".isNotNull)
      .select(concat_ws(">", $"event_type", $"e2", $"e3").as("path"))
    val counts = paths.groupBy($"path").agg(count(lit(1)).as("n"))
    counts
      .withColumn("tot", sum($"n").over(Window.partitionBy()))
      .select($"path", $"n",
        (expr("CAST(n * 1000000 DIV tot AS BIGINT)")
          .cast("double") / 1000000.0).as("share"))
      .orderBy($"n".desc, $"path")
      .limit(k)
  }

  def eventPathsSql(k: Int = 20): String =
    s"""WITH s AS (
       |  SELECT event_type AS e1,
       |    LEAD(event_type, 1) OVER w AS e2,
       |    LEAD(event_type, 2) OVER w AS e3
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |c AS (SELECT e1 || '>' || e2 || '>' || e3 AS path,
       |        CAST(COUNT(*) AS BIGINT) AS n
       |      FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
       |      GROUP BY 1),
       |t AS (SELECT path, n, SUM(n) OVER () AS tot FROM c)
       |SELECT path, n,
       |  CAST(n * 1000000 // tot AS DOUBLE) / 1000000.0 AS share
       |FROM t ORDER BY n DESC, path LIMIT $k""".stripMargin

  // ---------------------------------------------------------------
  // rel_acf_daily — autocorrelation function of the revenue series
  // ---------------------------------------------------------------

  /** Default ACF horizon — two weekly cycles, enough to see the
    * 7-day seasonality the decomposition and naive forecast exploit. */
  val AcfMaxLag = 14

  /** Autocorrelation function of daily revenue at calendar lags
    * 1..[[AcfMaxLag]]: r(k) = Σ d(t)·d(t+k) / Σ d(t)² with d(t) the
    * series centered on its INTEGER-FLOOR mean (whole dollars). The
    * diagnostic behind every seasonality decision — a spike at lag 7
    * says "weekly cycle", slow decay says "trend first".
    *
    * Determinism: revenue floors to whole dollars (cents DIV 100 —
    * integer division, identical in both engines where a direct
    * DECIMAL→BIGINT cast rounds in DuckDB and truncates in Spark);
    * the mean is the floor mean T DIV n, so every centered value,
    * product, and the two sums are exact BIGINTs — the sub-dollar
    * mean truncation shifts all d(t) by one shared ε < $1, an ACF
    * perturbation far below 1e-6 on any non-degenerate series. Each
    * r(k) is ONE double division (CASE-guarded: constant series →
    * NaN). Lags join BY DATE (day+k), so calendar gaps drop pairs
    * instead of silently misaligning rows. Overflow bound:
    * Σd² ≤ n·max|d|² must fit BIGINT — $3·10⁷ daily deviations over
    * 10⁴ days; past it route the moment sums through DECIMAL(38,0).
    *
    * Scale: one date-keyed aggregate over the corpus; everything
    * after (center, explode ×14, self equi-join, 14-group aggregate)
    * runs on the ≤ calendar-days frame. */
  def acfDaily(spark: SparkSession, sfDir: String,
               maxLag: Int = AcfMaxLag): DataFrame = {
    import spark.implicits._
    acfOf(Tables.orders(spark, sfDir)
      .groupBy(to_date($"o_orderdate").as("day"))
      .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,2))")).as("rev")),
      maxLag)
  }

  /** [[acfDaily]] over any `(day: date, rev: decimal)` frame. */
  private[graft] def acfOf(dailyRev: DataFrame,
                           maxLag: Int = AcfMaxLag): DataFrame = {
    val spark = dailyRev.sparkSession
    import spark.implicits._
    val daily = dailyRev.select($"day",
      expr("CAST(rev * 100 AS BIGINT) DIV 100").as("y"))
    val mu = daily.agg(count(lit(1)).as("n"),
      expr("SUM(y) DIV COUNT(1)").as("mu"))
    val centered = daily.crossJoin(broadcast(mu)) // 1-row mean
      .select($"day", ($"y" - $"mu").as("d"))
    val dd = centered.agg(sum($"d" * $"d").as("dd"))
    val shifted = centered
      .select(explode(sequence(lit(1), lit(maxLag))).as("lag"),
        expr("date_add(day, lag)").as("day"), $"d".as("dp"))
    shifted.join(centered, Seq("day"))
      .groupBy($"lag".cast("long").as("lag"))
      .agg(count(lit(1)).as("n_pairs"), sum($"dp" * $"d").as("num"))
      .crossJoin(broadcast(dd)) // 1-row denominator
      .select($"lag", $"n_pairs", expr(AcfExpr).as("acf"))
      .orderBy($"lag")
  }

  // ---------------------------------------------------------------
  // rel_bootstrap_ci — hash-seeded bootstrap CI for the daily median
  // ---------------------------------------------------------------

  /** Bootstrap replicas and the salted draw-hash — shared with the
    * oracle so both engines draw the identical resamples. */
  val BootstrapB = 40
  val BootstrapSalt = 101

  /** Percentile-bootstrap 90 % confidence interval for the MEDIAN
    * daily revenue: [[BootstrapB]] resamples-with-replacement of the
    * day frame, each drawn by the salted md5 of `(replica:slot)` —
    * deterministic, so both engines draw the SAME resamples and the
    * interval replays bit-for-bit (no RNG state anywhere). The
    * uncertainty readout a point median hides; medians have no CLT
    * closed form, which is exactly when analysts reach for the
    * bootstrap.
    *
    * All medians are exact lower medians of whole-dollar BIGINTs
    * (rank (n+1) DIV 2 — a value at a rank is tie-order-invariant);
    * the CI takes the 5th/95th percentile RANKS of the B replica
    * medians by the same integer rule. No floats anywhere.
    *
    * Scale: one date-keyed corpus aggregate; the resample universe
    * is days × B rows (bounded — the calendar, not the corpus), the
    * replica medians are B windowed rows, the readout is 1. */
  def bootstrapCi(spark: SparkSession, sfDir: String,
                  b: Int = BootstrapB): DataFrame = {
    import spark.implicits._
    import graft.functions.Hashing.md5i32
    // localCheckpoint: the indexed day frame is both the slot
    // generator and the value lookup — without the cut each
    // reference re-aggregates the corpus (the chiSquare discipline)
    val idx = Tables.orders(spark, sfDir)
      .groupBy(to_date($"o_orderdate").as("day"))
      .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100" +
        " AS BIGINT) DIV 100").as("y"))
      .select($"y", (row_number().over(Window.orderBy($"day")) - 1)
        .cast("long").as("i"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()).cast("long"))
      .localCheckpoint()
    val picks = idx.select($"i".as("slot"), $"n")
      .select(explode(sequence(lit(0), lit(b - 1))).as("b"), $"slot", $"n")
      .select($"b", pmod(md5i32(concat_ws(":", $"b", $"slot"),
        BootstrapSalt), $"n").as("i"))
    val medians = picks.join(idx.select($"i", $"y"), Seq("i"))
      .withColumn("rn", row_number()
        .over(Window.partitionBy($"b").orderBy($"y")).cast("long"))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy($"b"))
        .cast("long"))
      .filter($"rn" === expr("(cnt + 1) DIV 2"))
      .select($"b", $"y".as("med"))
    val ranked = medians.select($"med",
      row_number().over(Window.orderBy($"med")).cast("long").as("rb"))
    val kLo = math.max(1, b * 5 / 100)
    val kHi = b + 1 - kLo
    val point = idx
      .withColumn("rn", row_number().over(Window.orderBy($"y")).cast("long"))
      .filter($"rn" === expr("(n + 1) DIV 2"))
      .select($"n".as("n_days"), $"y".as("median"))
    point // four 1-row frames
      .crossJoin(medians.agg(count(lit(1)).as("n_replicas")))
      .crossJoin(ranked.filter($"rb" === kLo).select($"med".as("ci_lo")))
      .crossJoin(ranked.filter($"rb" === kHi).select($"med".as("ci_hi")))
      .select($"n_days", $"n_replicas", $"median", $"ci_lo", $"ci_hi")
  }

  def bootstrapCiSql(b: Int = BootstrapB): String = {
    import graft.functions.Hashing.md5i32Sql
    val kLo = math.max(1, b * 5 / 100)
    val kHi = b + 1 - kLo
    val draw = md5i32Sql(
      "CAST(b AS VARCHAR) || ':' || CAST(slot AS VARCHAR)",
      BootstrapSalt)
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day,
       |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
       |      // 100 AS y
       |  FROM orders GROUP BY 1),
       |idx AS (
       |  SELECT y, CAST(ROW_NUMBER() OVER (ORDER BY day) - 1 AS BIGINT)
       |    AS i, (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n
       |  FROM daily),
       |picks AS (
       |  SELECT t.b, $draw % n AS i
       |  FROM (SELECT i AS slot, n FROM idx) s,
       |       range(0, $b) t(b)),
       |med AS (
       |  SELECT b, y AS med FROM (
       |    SELECT p.b, x.y,
       |      ROW_NUMBER() OVER (PARTITION BY p.b ORDER BY x.y) AS rn,
       |      COUNT(*) OVER (PARTITION BY p.b) AS cnt
       |    FROM picks p JOIN idx x ON x.i = p.i)
       |  WHERE rn = (cnt + 1) // 2),
       |ranked AS (SELECT med, ROW_NUMBER() OVER (ORDER BY med) AS rb
       |           FROM med),
       |pt AS (SELECT n AS n_days, y AS median FROM (
       |         SELECT y, n, ROW_NUMBER() OVER (ORDER BY y) AS rn FROM idx)
       |       WHERE rn = (n + 1) // 2)
       |SELECT pt.n_days,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM med) AS n_replicas,
       |  pt.median,
       |  (SELECT med FROM ranked WHERE rb = $kLo) AS ci_lo,
       |  (SELECT med FROM ranked WHERE rb = $kHi) AS ci_hi
       |FROM pt""".stripMargin
  }

  // ---------------------------------------------------------------
  // rel_changepoint — binary-segmentation step on the revenue series
  // ---------------------------------------------------------------

  /** Single most-likely level-shift changepoint of the daily revenue
    * series — the first step of binary segmentation: the split k
    * maximizing the between-segment sum-of-squares reduction
    * gain(k) = S₁²/k + S₂²/(n−k) − T²/n (the k-means-style identity;
    * variance terms cancel). Emits the winning boundary with both
    * segment means and the gain — the "did the series regime-shift,
    * and when" pre-flight a forecast or drift monitor runs first.
    *
    * Determinism: the series floors to whole dollars and the prefix
    * sums S₁, counts, and totals are exact BIGINTs; each candidate's
    * gain is the SAME fixed-parenthesization double chain in both
    * engines (products/divisions of exact integers — correctly
    * rounded, bit-identical), and the argmax tie-breaks on the
    * earlier day. Segment means are floor divisions.
    *
    * Scale: one date-keyed corpus aggregate; the prefix sums, the
    * n−1 candidate gains, and the top-1 all run on the ≤
    * calendar-days frame (one bounded window sort, never the
    * corpus). */
  def changepoint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, sfDir)
      .groupBy(to_date($"o_orderdate").as("day"))
      .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100" +
        " AS BIGINT) DIV 100").as("y"))
    val seq = Window.orderBy($"day")
    val tot = daily.agg(count(lit(1)).as("n"), sum($"y").as("t"))
    daily
      .select($"day", row_number().over(seq).cast("long").as("k"),
        sum($"y").over(seq.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).as("s1"))
      .crossJoin(broadcast(tot)) // 1-row totals
      .filter($"k" < $"n")
      .select($"day".as("split_day"), $"k".as("n_before"),
        ($"n" - $"k").as("n_after"),
        (expr("s1 DIV k").cast("double")).as("mean_before"),
        (expr("(t - s1) DIV (n - k)").cast("double")).as("mean_after"),
        expr(ChangepointGainExpr).as("gain"))
      .orderBy($"gain".desc, $"split_day")
      .limit(1)
  }

  /** The gain chain — ONE text shared by Spark and the oracle. */
  private val ChangepointGainExpr: String =
    """(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE)
      | + CAST(t - s1 AS DOUBLE) * CAST(t - s1 AS DOUBLE)
      |   / CAST(n - k AS DOUBLE)
      | - CAST(t AS DOUBLE) * CAST(t AS DOUBLE) / CAST(n AS DOUBLE))"""
      .stripMargin

  def changepointSql(): String =
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day,
       |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
       |      // 100 AS y
       |  FROM orders GROUP BY 1),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |               CAST(SUM(y) AS BIGINT) AS t FROM daily),
       |pre AS (
       |  SELECT day, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS k,
       |    CAST(SUM(y) OVER (ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS s1
       |  FROM daily)
       |SELECT day AS split_day, k AS n_before, n - k AS n_after,
       |  CAST(s1 // k AS DOUBLE) AS mean_before,
       |  CAST((t - s1) // (n - k) AS DOUBLE) AS mean_after,
       |  $ChangepointGainExpr AS gain
       |FROM pre, tot WHERE k < n
       |ORDER BY gain DESC, split_day LIMIT 1""".stripMargin

  /** The r(k) division — ONE text shared by Spark and the oracle. */
  private val AcfExpr: String =
    """(CASE WHEN dd = 0 THEN CAST('NaN' AS DOUBLE)
      |  ELSE CAST(num AS DOUBLE) / CAST(dd AS DOUBLE) END)""".stripMargin

  def acfDailySql(maxLag: Int = AcfMaxLag): String =
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day,
       |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
       |      // 100 AS y
       |  FROM orders GROUP BY 1),
       |mu AS (SELECT CAST(SUM(y) // COUNT(*) AS BIGINT) AS mu FROM daily),
       |c AS (SELECT day, y - mu AS d FROM daily, mu),
       |den AS (SELECT CAST(SUM(d * d) AS BIGINT) AS dd FROM c),
       |p AS (
       |  SELECT t.lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |    CAST(SUM(prev.d * cur.d) AS BIGINT) AS num
       |  FROM range(1, ${maxLag + 1}) t(lag)
       |  JOIN c prev ON TRUE
       |  JOIN c cur ON cur.day = prev.day + CAST(t.lag AS INT)
       |  GROUP BY t.lag)
       |SELECT CAST(lag AS BIGINT) AS lag, n_pairs, $AcfExpr AS acf
       |FROM p, den ORDER BY lag""".stripMargin
}
