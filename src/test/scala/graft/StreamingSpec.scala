package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming-vs-batch equivalence: the same transform body run over a
  * watermarked stream must converge to the batch answer once all data
  * is processed — Spark's contract for windowed aggregations, and our
  * oracle for the streaming path (DuckDB can't run streams).
  */
case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
              event_type: String, value: Double)

class StreamingSpec extends AnyFunSuite with SparkSpec {

  private def eventRows(limit: Int): Seq[Ev] = {
    import spark.implicits._
    graft.sources.Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .orderBy($"event_id").limit(limit)
      .as[Ev].collect().toSeq
  }

  private def runStream(rows: Seq[Ev], name: String)
                       (transform: DataFrame => DataFrame): DataFrame = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    // two batches so the watermark actually advances mid-stream
    val (first, second) = rows.splitAt(rows.size / 2)
    val q = transform(mem.toDF().withWatermark("ts", "1 hour"))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .start()
    try {
      mem.addData(first); q.processAllAvailable()
      mem.addData(second); q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
  }

  private def canon(df: DataFrame): Seq[Seq[String]] =
    df.collect().toSeq.map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))

  test("tumbling hourly: stream == batch") {
    val rows = eventRows(800)
    import spark.implicits._
    val batch = EventStreams.tumblingHourly(rows.toDF())
    val stream = runStream(rows, "s_tumbling")(EventStreams.tumblingHourly)
    assert(canon(stream) == canon(batch))
    assert(batch.count() > 0)
  }

  test("daily distinct-user KMV sketch: stream == batch (r10)") {
    val rows = eventRows(800)
    import spark.implicits._
    // k=8 < distinct users/day in the fixture, so the streaming path
    // exercises the at-capacity displace AND the cross-batch merge
    val batch = EventStreams.dailyUsersKmv(rows.toDF(), k = 8)
    val stream = runStream(rows, "s_kmv_users")(EventStreams.dailyUsersKmv(_, k = 8))
    assert(canon(stream) == canon(batch))
    assert(batch.count() > 0)
    val caps = batch.select(max($"n_kept")).as[Long].head()
    assert(caps == 8L, s"expected at-capacity sketches, max n_kept=$caps")
  }

  test("daily value-quantile sketch: stream == batch (r10)") {
    val rows = eventRows(800)
    import spark.implicits._
    // s=8 < events/day in the fixture: the at-capacity displace and
    // the cross-micro-batch pair merge are both on the path
    val batch = EventStreams.dailyValueQuantiles(rows.toDF(), s = 8)
    val stream = runStream(rows, "s_val_quant")(
      EventStreams.dailyValueQuantiles(_, s = 8))
    assert(canon(stream) == canon(batch))
    assert(batch.count() > 0)
    val caps = batch.select(max($"n_sampled")).as[Long].head()
    assert(caps == 8L, s"expected at-capacity samples, max n_sampled=$caps")
    // quantiles come from real values and are monotone across p
    batch.select($"p25", $"p50", $"p75", $"p90")
      .as[(Double, Double, Double, Double)].collect().foreach {
        case (a, b, c, d) =>
          assert(a <= b && b <= c && c <= d, s"non-monotone: $a $b $c $d")
      }
  }

  test("daily user Count-Min cells: stream == batch, state bounded at depth*width") {
    val rows = eventRows(800)
    import spark.implicits._
    val batch = EventStreams.dailyUserCmsCells(rows.toDF(), depth = 4, width = 16)
    val stream = runStream(rows, "s_cms_cells")(
      EventStreams.dailyUserCmsCells(_, depth = 4, width = 16))
    assert(canon(stream) == canon(batch))
    assert(batch.count() > 0)
    // per-window state bound: <= depth*width cells per day
    val perDay = batch.groupBy($"day").count().select(max($"count")).as[Long].head()
    assert(perDay <= 4L * 16L, s"cells per day $perDay exceed depth*width")
    // cell-wise sums account for every (event, salt) assignment
    val total = batch.agg(sum($"c")).as[Long].head()
    assert(total == rows.size.toLong * 4L, s"mass $total != ${rows.size * 4}")
    // the CMS contract on the batch twin path: est >= exact everywhere
    val twin = EventStreams.eventsCmsWindow(spark, sf)
    val bad = twin.filter($"overcount" < 0L || $"est" < $"n").count()
    assert(bad == 0, "CMS bound violated on twin")
  }

  test("daily user HLL registers: stream == batch, state fixed at m, estimate in band") {
    val rows = eventRows(800)
    import spark.implicits._
    val batch = EventStreams.dailyUserHllRegisters(rows.toDF())
    val stream = runStream(rows, "s_hll_regs")(EventStreams.dailyUserHllRegisters(_))
    assert(canon(stream) == canon(batch))
    assert(batch.count() > 0)
    // TRULY fixed state: <= m register rows per day, registers in range
    val perDay = batch.groupBy($"day").count().select(max($"count")).as[Long].head()
    assert(perDay <= EventStreams.EventHllM.toLong,
      s"registers per day $perDay exceed m")
    val badReg = batch.filter($"mj" < 1L || $"mj" > EventStreams.EventHllR.toLong
      || $"idx" < 0L || $"idx" >= EventStreams.EventHllM.toLong).count()
    assert(badReg == 0, "register out of geometry")
    // batch twin: estimate within the m=64 band (~13% = 1.04/sqrt(64),
    // allow 3x; deterministic given md5) on every day
    val twin = EventStreams.eventsHllWindow(spark, sf)
    val offBand = twin.filter(
      abs($"est_users" - $"n_users") > $"n_users" * 0.39).count()
    assert(offBand == 0, "HLL day estimate out of band")
  }

  test("stream-static enrichment join: stream == batch") {
    val rows = eventRows(800)
    import spark.implicits._
    val dim = (0L to 50L).map(u => (u, s"seg-${u % 5}")).toDF("user_id", "segment")
    val batch = EventStreams.enrichedTumbling(rows.toDF(), dim)
    val stream = runStream(rows, "s_enrich")(EventStreams.enrichedTumbling(_, dim))
    assert(canon(stream) == canon(batch))
    assert(batch.count() > 0)
  }

  test("sliding 1h/15min: stream == batch") {
    val rows = eventRows(800)
    import spark.implicits._
    val batch = EventStreams.slidingHourly(rows.toDF())
    val stream = runStream(rows, "s_sliding")(EventStreams.slidingHourly)
    assert(canon(stream) == canon(batch))
  }

  test("session windows per user: stream == batch") {
    val rows = eventRows(800)
    import spark.implicits._
    val batch = EventStreams.sessionCounts(rows.toDF())
    val stream = runStream(rows, "s_session")(EventStreams.sessionCounts)
    assert(canon(stream) == canon(batch))
    assert(batch.count() > 0)
  }

  test("streaming cdc compaction equals the batch compactor, any arrival order") {
    import graft.streaming.{CdcOp, CdcRow}
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = eventRows(600)
    val ops = rows.map { e =>
      val op = e.event_type match {
        case "signup" => "I"
        case "error"  => "D"
        case _        => "U"
      }
      CdcOp(e.user_id, e.ts, e.event_id, op, e.value)
    }
    // batch truth from the SAME log via the oracle-checked operator
    val want = graft.operators.Relational.cdcCompactOf(
      ops.toDF("key", "ts", "seq", "op", "value"))
      .as[(Long, Long, String, Double, String)].collect().toSeq
      .map(r => (r._1, r._2, r._3, r._4)).toSet
    // arrival orders: natural, and deterministically shuffled — the
    // (ts, seq) value comparison must make arrival order irrelevant
    val shuffled = ops.sortBy(o => (o.seq * 2654435761L) & 0x7fffffffL)
    for ((order, name) <- Seq((ops, "s_cdc_nat"), (shuffled, "s_cdc_shuf"))) {
      val mem = MemoryStream[CdcOp]
      val q = EventStreams.cdcCompactStream(mem.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        val (a, b) = order.splitAt(order.size / 2)
        mem.addData(a); q.processAllAvailable()
        mem.addData(b); q.processAllAvailable()
      } finally q.stop()
      // update mode re-emits a key per touching batch: final state =
      // the row with that key's max op count
      val got = spark.table(name).as[CdcRow].collect().toSeq
        .groupBy(_.user_id).values.map(_.maxBy(_.n_ops))
        .filter(_.last_op != "D")
        .map(r => (r.user_id, r.n_ops, r.last_op, r.last_value)).toSet
      assert(got == want, s"$name diverged from batch compactor")
      assert(got.nonEmpty)
    }
  }

  test("streaming exact dedup: duplicated stream converges to batch distinct") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = eventRows(400)
    val mem = MemoryStream[Ev]
    val q = mem.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id") // bounded dedup state
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("s_dedup")
      .outputMode("complete").start()
    try {
      mem.addData(rows); q.processAllAvailable()
      mem.addData(rows); q.processAllAvailable() // full duplicate batch
    } finally q.stop()
    val got = spark.table("s_dedup")
    val want = rows.toDF().groupBy($"event_type").agg(count(lit(1)).as("n"))
    assert(canon(got) == canon(want))
  }

  test("flatMapGroupsWithState sessionizer matches built-in session windows") {
    import graft.streaming.{SessionEvent, SessionRow}
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = eventRows(600)
    val mem = MemoryStream[SessionEvent]
    val q = EventStreams.sessionizeWithState(
      mem.toDS().withWatermark("ts", "10 seconds"))
      .writeStream.format("memory").queryName("s_custom_session")
      .outputMode("append").start()
    val data = rows.map(r => SessionEvent(r.user_id, r.ts))
    val maxTs = rows.map(_.ts.getTime).max
    // far-future flush sentinels advance the watermark so idle users'
    // open sessions hit their event-time timeout and emit
    val flushTs = maxTs + 10L * 24 * 3600 * 1000
    val sentinels = data.map(_.user_id).distinct
      .map(u => SessionEvent(u, new java.sql.Timestamp(flushTs)))
    try {
      val (a, b) = data.splitAt(data.size / 2)
      mem.addData(a); q.processAllAvailable()
      mem.addData(b); q.processAllAvailable()
      mem.addData(sentinels); q.processAllAvailable()
      mem.addData(sentinels.map(s => SessionEvent(s.user_id,
        new java.sql.Timestamp(flushTs + 3600 * 1000)))); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("s_custom_session").as[SessionRow]
      .filter($"start_ms" < maxTs + 1) // drop sentinel sessions
      .collect()
      .map(r => (r.user_id, r.start_ms, r.end_ms, r.n_events)).toSet
    val want = EventStreams.sessionCounts(rows.toDF())
      .select($"user_id", $"sw.start".as("s"), $"sw.end".as("e"), $"session_events")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3))).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("sessionizer merges a late-but-in-watermark event, extending start down") {
    import graft.streaming.{SessionEvent, SessionRow}
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[SessionEvent]
    val q = EventStreams.sessionizeWithState(
      mem.toDS().withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("s_late_session")
      .outputMode("append").start()
    try {
      // batch 1 opens u=1 at 10:00:05
      mem.addData(SessionEvent(1L, t("2024-01-01 10:00:05")))
      q.processAllAvailable()
      // batch 2 delivers a LATE event at 10:00:00 — inside the gap,
      // inside the watermark: must merge and lower the session start
      mem.addData(SessionEvent(1L, t("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // flush sentinels close the session via event-time timeout
      mem.addData(SessionEvent(1L, t("2024-01-10 00:00:00")))
      q.processAllAvailable()
      mem.addData(SessionEvent(1L, t("2024-01-10 02:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    val sessions = spark.table("s_late_session").as[SessionRow]
      .filter($"start_ms" < t("2024-01-02 00:00:00").getTime)
      .collect()
    assert(sessions.length == 1)
    assert(sessions.head.start_ms == t("2024-01-01 10:00:00").getTime)
    assert(sessions.head.n_events == 2)
  }

  test("sessionizer merges multiple late singletons into ONE session") {
    import graft.streaming.{SessionEvent, SessionRow}
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[SessionEvent]
    val q = EventStreams.sessionizeWithState(
      mem.toDS().withWatermark("ts", "6 hours"))
      .writeStream.format("memory").queryName("s_late_multi")
      .outputMode("append").start()
    try {
      // batch 1 opens u=1 at 12:00
      mem.addData(SessionEvent(1L, t("2024-01-01 12:00:00")))
      q.processAllAvailable()
      // batch 2: TWO late events, both >= gap before the open session,
      // but within the gap of EACH OTHER — session_window merges them
      // into one 2-event session; emitting two singletons is the bug
      mem.addData(SessionEvent(1L, t("2024-01-01 10:00:00")),
        SessionEvent(1L, t("2024-01-01 10:10:00")))
      q.processAllAvailable()
      mem.addData(SessionEvent(1L, t("2024-01-10 00:00:00")))
      q.processAllAvailable()
      mem.addData(SessionEvent(1L, t("2024-01-10 12:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("s_late_multi").as[SessionRow]
      .filter($"start_ms" < t("2024-01-02 00:00:00").getTime)
      .collect().map(r => (r.start_ms, r.end_ms, r.n_events)).toSet
    val gap = 30L * 60 * 1000
    assert(got == Set(
      (t("2024-01-01 10:00:00").getTime, t("2024-01-01 10:10:00").getTime + gap, 2L),
      (t("2024-01-01 12:00:00").getTime, t("2024-01-01 12:00:00").getTime + gap, 1L)))
  }

  test("sessionizer merges a late event into a session separated in an EARLIER batch") {
    import graft.streaming.{SessionEvent, SessionRow}
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[SessionEvent]
    val q = EventStreams.sessionizeWithState(
      mem.toDS().withWatermark("ts", "6 hours"))
      .writeStream.format("memory").queryName("s_late_bridge")
      .outputMode("append").start()
    try {
      mem.addData(SessionEvent(1L, t("2024-01-01 11:30:00")))
      q.processAllAvailable()
      // 10:00 is its own island, gap-separated from 11:30 — but the
      // watermark hasn't passed it, so it must STAY unemitted...
      mem.addData(SessionEvent(1L, t("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // ...because this 10:20 event bridges into it a batch later
      mem.addData(SessionEvent(1L, t("2024-01-01 10:20:00")))
      q.processAllAvailable()
      mem.addData(SessionEvent(1L, t("2024-01-10 00:00:00")))
      q.processAllAvailable()
      mem.addData(SessionEvent(1L, t("2024-01-10 12:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("s_late_bridge").as[SessionRow]
      .filter($"start_ms" < t("2024-01-02 00:00:00").getTime)
      .collect().map(r => (r.start_ms, r.end_ms, r.n_events)).toSet
    val gap = 30L * 60 * 1000
    assert(got == Set(
      (t("2024-01-01 10:00:00").getTime, t("2024-01-01 10:20:00").getTime + gap, 2L),
      (t("2024-01-01 11:30:00").getTime, t("2024-01-01 11:30:00").getTime + gap, 1L)))
  }

  test("checkpointed file stream restarts with exactly-once output") {
    import spark.implicits._
    // recovery, not just semantics: run a checkpointed stream over one
    // staged file, STOP the query, stage a second file, restart the
    // same (source, checkpoint, sink) triple. The restarted stream
    // must resume from the checkpoint — the first file is NOT
    // reprocessed, the second is NOT lost — so every event lands in
    // the sink exactly once per staged copy.
    val in = java.nio.file.Files.createTempDirectory("graft_ck_in")
    val ck = java.nio.file.Files.createTempDirectory("graft_ck_meta")
    val out = java.nio.file.Files.createTempDirectory("graft_ck_out")
    val src = java.nio.file.Paths.get(s"$sf/events.parquet")
    java.nio.file.Files.copy(src, in.resolve("e1.parquet"))
    def run(): Unit = {
      val q = EventStreams.readEventsStream(spark, in.toString)
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ck.toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // processes e1, checkpoint records it
    java.nio.file.Files.copy(src, in.resolve("e2.parquet"))
    run() // restart: must process ONLY e2
    val got = spark.read.parquet(out.toString)
    val batch = graft.sources.Tables.events(spark, sf)
    assert(got.count() == 2 * batch.count())
    // exactly-once per staged copy: every event_id exactly twice
    // (reprocessing e1 would make 3+, losing e2 would make 1)
    val bad = got.groupBy($"event_id").agg(count(lit(1)).as("n"))
      .filter($"n" =!= 2).count()
    assert(bad == 0)
  }

  test("stream-stream attribution join: stream == batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // inner stream-stream join with a time-bound condition: every
    // click×purchase match must be emitted exactly once, including
    // pairs whose two sides arrive in DIFFERENT micro-batches (join
    // state holds the unmatched side until the watermark passes).
    val rows = eventRows(800)
    val clicks = rows.filter(_.event_type == "click")
    val purchases = rows.filter(_.event_type == "purchase")
    val batch = EventStreams.attributionPairs(clicks.toDF(), purchases.toDF())

    val memC = MemoryStream[Ev]
    val memP = MemoryStream[Ev]
    val joined = EventStreams.attributionPairs(
      memC.toDF().withWatermark("ts", "1 hour"),
      memP.toDF().withWatermark("ts", "1 hour"))
    val q = joined.writeStream.format("memory")
      .queryName("s_attr").outputMode("append").start()
    try {
      // purchases lag their clicks by a batch: cross-batch matches
      val (c1, c2) = clicks.splitAt(clicks.size / 2)
      val (p1, p2) = purchases.splitAt(purchases.size / 3)
      memC.addData(c1); memP.addData(p1); q.processAllAvailable()
      memC.addData(c2); memP.addData(p2); q.processAllAvailable()
    } finally q.stop()
    assert(canon(spark.table("s_attr")) == canon(batch))
    assert(batch.count() > 0)
  }

  test("stream-stream left-outer attribution: unmatched clicks flush after watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // outer stream-stream join: matched pairs emit like the inner
    // form; an UNMATCHED click emits null-padded only after the
    // watermark proves no qualifying purchase can still arrive. Two
    // far-future self-matching sentinel pairs advance the watermark
    // past every real click's 30-min window (output for a watermark
    // advance lands in the FOLLOWING micro-batch, hence two).
    val rows = eventRows(800)
    val clicks = rows.filter(_.event_type == "click")
    val purchases = rows.filter(_.event_type == "purchase")
    val maxTs = rows.map(_.ts.getTime).max
    def sentinel(offsetH: Int, id: Long): (Ev, Ev) = {
      val ts = new java.sql.Timestamp(maxTs + offsetH * 3600L * 1000L)
      (Ev(id, ts, 999000L + id, "click", 1.0),
        Ev(id + 1, ts, 999000L + id, "purchase", 1.0))
    }
    val (sc1, sp1) = sentinel(2, 900001L)
    val (sc2, sp2) = sentinel(4, 900011L)
    val allClicks = clicks ++ Seq(sc1, sc2)
    val allPurchases = purchases ++ Seq(sp1, sp2)
    val batch = EventStreams.attributionOuter(allClicks.toDF(), allPurchases.toDF())

    val memC = MemoryStream[Ev]
    val memP = MemoryStream[Ev]
    val joined = EventStreams.attributionOuter(
      memC.toDF().withWatermark("ts", "1 hour"),
      memP.toDF().withWatermark("ts", "1 hour"))
    val q = joined.writeStream.format("memory")
      .queryName("s_attr_outer").outputMode("append").start()
    try {
      val (c1, c2) = clicks.splitAt(clicks.size / 2)
      val (p1, p2) = purchases.splitAt(purchases.size / 3)
      memC.addData(c1); memP.addData(p1); q.processAllAvailable()
      memC.addData(c2); memP.addData(p2); q.processAllAvailable()
      memC.addData(Seq(sc1)); memP.addData(Seq(sp1)); q.processAllAvailable()
      memC.addData(Seq(sc2)); memP.addData(Seq(sp2)); q.processAllAvailable()
    } finally q.stop()
    assert(canon(spark.table("s_attr_outer")) == canon(batch))
    // the outer form strictly extends the inner one: null-padded rows exist
    val unmatched = spark.table("s_attr_outer")
      .filter($"purchase_id".isNull).count()
    assert(unmatched > 0, "expected watermark-flushed unmatched clicks")
  }

  test("stream-stream full-outer attribution: BOTH unmatched sides flush") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // the last cell of the join matrix: unmatched clicks AND organic
    // purchases (no preceding click) both emit null-padded once the
    // watermark proves no partner can arrive. Sentinels as in the
    // left-outer test.
    val rows = eventRows(800)
    val clicks = rows.filter(_.event_type == "click")
    val purchases = rows.filter(_.event_type == "purchase")
    val maxTs = rows.map(_.ts.getTime).max
    def sentinel(offsetH: Int, id: Long): (Ev, Ev) = {
      val ts = new java.sql.Timestamp(maxTs + offsetH * 3600L * 1000L)
      (Ev(id, ts, 999000L + id, "click", 1.0),
        Ev(id + 1, ts, 999000L + id, "purchase", 1.0))
    }
    val (sc1, sp1) = sentinel(2, 900001L)
    val (sc2, sp2) = sentinel(4, 900011L)
    val allClicks = clicks ++ Seq(sc1, sc2)
    val allPurchases = purchases ++ Seq(sp1, sp2)
    val batch = EventStreams.attributionFull(allClicks.toDF(), allPurchases.toDF())

    val memC = MemoryStream[Ev]
    val memP = MemoryStream[Ev]
    val joined = EventStreams.attributionFull(
      memC.toDF().withWatermark("ts", "1 hour"),
      memP.toDF().withWatermark("ts", "1 hour"))
    val q = joined.writeStream.format("memory")
      .queryName("s_attr_full").outputMode("append").start()
    try {
      val (c1, c2) = clicks.splitAt(clicks.size / 2)
      val (p1, p2) = purchases.splitAt(purchases.size / 3)
      memC.addData(c1); memP.addData(p1); q.processAllAvailable()
      memC.addData(c2); memP.addData(p2); q.processAllAvailable()
      memC.addData(Seq(sc1)); memP.addData(Seq(sp1)); q.processAllAvailable()
      memC.addData(Seq(sc2)); memP.addData(Seq(sp2)); q.processAllAvailable()
    } finally q.stop()
    assert(canon(spark.table("s_attr_full")) == canon(batch))
    // strictly extends the left-outer form: organic purchases appear
    val organic = spark.table("s_attr_full")
      .filter($"click_id".isNull).count()
    assert(organic > 0, "expected watermark-flushed organic purchases")
    assert(spark.table("s_attr_full").filter($"purchase_id".isNull).count() > 0)
  }

  test("foreachBatch ingest dedups each micro-batch against the corpus") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // the production dedup-on-ingest shape: every micro-batch is
    // near-dedup-checked against the accumulated survivor corpus via
    // the SAME MinHash operator the batch pipeline uses, and only
    // survivors are appended. foreachBatch is the escape hatch for
    // sinks/logic Structured Streaming can't express natively.
    val corpusDir = java.nio.file.Files.createTempDirectory("graft_fb_corpus").toString
    def corpus(): org.apache.spark.sql.DataFrame =
      try spark.read.parquet(corpusDir)
      catch { case _: Throwable => Seq.empty[(Long, String)].toDF("doc_id", "text") }

    def base(i: Int) = s"unique base document number $i with plenty of distinct words " +
      s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i"
    val batches = Seq(
      Seq((1L, base(1)), (2L, base(2)), (3L, base(3))),
      Seq((11L, base(1) + " tail"), (4L, base(4)), (13L, base(3) + " tail")),
      Seq((24L, base(4) + " tail"), (5L, base(5))))

    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val all = corpus().select($"doc_id", $"text")
          .unionByName(batch.select($"doc_id", $"text"))
        // ids increase over time, so a batch doc near-dupping ANY
        // earlier doc appears as doc_b of a pair
        val drop = graft.operators.Dedup.minHashNearDupsOf(all, threshold = 0.8)
          .select($"doc_b".as("doc_id")).distinct()
        batch.join(drop, Seq("doc_id"), "left_anti")
          .write.mode("append").parquet(corpusDir)
      }
      .start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()

    val survivors = corpus().select($"doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 2L, 3L, 4L, 5L),
      s"expected the five base docs, got $survivors")
  }

  test("custom-state funnel tracker: final stream emission == batch stages") {
    import graft.streaming.{EventStreams, FunnelEvent, FunnelStageRow}
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = eventRows(600).map(e => FunnelEvent(e.user_id, e.ts, e.event_type))
    val batch = EventStreams.funnelStagesBatch(rows.toDS())
      .collect().map(r => r.user_id -> r).toMap
    val mem = MemoryStream[FunnelEvent]
    // deliberately deliver SECOND half first: late earlier views must
    // lower t1 and re-validate clicks (the recompute-from-set claim)
    val (first, second) = rows.splitAt(rows.size / 2)
    val q = EventStreams.funnelStagesStream(mem.toDS())
      .writeStream.format("memory").queryName("s_funnel")
      .outputMode("update").start()
    try {
      mem.addData(second); q.processAllAvailable()
      mem.addData(first); q.processAllAvailable()
    } finally q.stop()
    // over set inclusion stage is non-decreasing and every reached
    // time non-increasing, so the final state reconstructs as
    // (max stage, min reached time per field) across emissions
    def minPos(xs: Seq[Long]) = { val p = xs.filter(_ >= 0); if (p.isEmpty) -1L else p.min }
    val stream = spark.table("s_funnel").as[FunnelStageRow].collect()
      .groupBy(_.user_id).map { case (u, rs) =>
        u -> ((rs.map(_.stage).max, minPos(rs.map(_.t1)),
          minPos(rs.map(_.t2)), minPos(rs.map(_.t3))))
      }
    assert(stream.keySet == batch.keySet && stream.nonEmpty)
    stream.foreach { case (u, s) =>
      val b = batch(u)
      assert(s == ((b.stage, b.t1, b.t2, b.t3)),
        s"user $u: stream $s vs batch $b")
    }
    // the funnel actually progresses somewhere in this slice
    assert(batch.values.exists(_.stage >= 2))
  }

  test("foreachBatch CDC stream maintains the snapshot via applyChanges") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // streaming table maintenance: each micro-batch of U/D/I changes
    // merges into the parquet snapshot with the SAME applyChanges the
    // batch pipeline uses — the incremental-refresh production shape
    val snapDir = java.nio.file.Files.createTempDirectory("graft_cdc_snap").toString
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v").write.mode("overwrite").parquet(snapDir)

    val mem = MemoryStream[(Long, String, String, Double)]
    val q = mem.toDF().toDF("k", "op", "name", "v")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val merged = graft.operators.Relational.applyChanges(
          spark.read.parquet(snapDir), batch, "k")
        // small snapshots rewrite atomically; at scale this write is
        // partition-targeted (overwrite only touched partitions)
        val staged = merged.collect()
        spark.createDataFrame(
          spark.sparkContext.parallelize(staged.toIndexedSeq),
          merged.schema)
          .write.mode("overwrite").parquet(snapDir)
      }
      .start()
    try {
      mem.addData((2L, "U", null.asInstanceOf[String], 25.0))
      q.processAllAvailable()
      mem.addData((3L, "D", null.asInstanceOf[String], 0.0),
        (4L, "I", "d", 40.0))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(snapDir).orderBy($"k")
      .as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b", 25.0), (4L, "d", 40.0)))
  }

  test("file-based events stream source reads the real parquet") {
    import spark.implicits._
    // file-stream sources need a directory; stage the single parquet
    // file into a scratch dir
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = EventStreams.readEventsStream(spark, dir.toString)
    assert(stream.isStreaming)
    val q = EventStreams.tumblingHourly(stream.withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("s_file").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("s_file")
    val want = EventStreams.tumblingHourly(graft.sources.Tables.events(spark, sf))
    assert(canon(got) == canon(want))
  }

  test("streaming sequence packer: per-doc bins == batch window cumsum") {
    import graft.streaming.{EventStreams, PackAssign, PackDoc}
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ctx = 64
    // real corpus token counts, in the ingestion (doc_id) order the
    // packer's contract requires
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"lang",
        size(graft.functions.TextAnalysis.tokens($"text")).cast("long")
          .as("n_tokens"))
      .as[PackDoc].collect().sortBy(_.doc_id).toSeq
    val batch = EventStreams.packBatch(docs.toDS(), ctx)
      .collect().map(a => a.doc_id -> a).toMap
    val mem = MemoryStream[PackDoc]
    val q = EventStreams.packStream(mem.toDS(), ctx)
      .writeStream.format("memory").queryName("s_pack")
      .outputMode("append").start()
    try {
      // three ordered micro-batches: bins must carry across batch
      // boundaries through the per-language cursor state
      docs.grouped((docs.size + 2) / 3).foreach { chunk =>
        mem.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()
    val stream = spark.table("s_pack").as[PackAssign]
      .collect().map(a => a.doc_id -> a).toMap
    assert(stream.keySet == batch.keySet && stream.nonEmpty)
    stream.foreach { case (id, a) =>
      assert(a == batch(id), s"doc $id: stream $a vs batch ${batch(id)}")
    }
    // at least one assignment must actually straddle batches: a later
    // batch's doc landing in a bin opened earlier
    assert(stream.values.groupBy(_.lang).exists(_._2.map(_.bin).toSet.size > 1))
  }

  test("sharded streaming packer: stream == batch twin, shard-invariant at 1") {
    import graft.streaming.{EventStreams, PackAssignShard, PackDoc}
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val (ctx, shards) = (64, 4)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"lang",
        size(graft.functions.TextAnalysis.tokens($"text")).cast("long")
          .as("n_tokens"))
      .as[PackDoc].collect().sortBy(_.doc_id).toSeq
    val batch = EventStreams.packBatchSharded(docs.toDS(), ctx, shards)
      .collect().map(a => a.doc_id -> a).toMap
    val mem = MemoryStream[PackDoc]
    val q = EventStreams.packStreamSharded(mem.toDS(), ctx, shards)
      .writeStream.format("memory").queryName("s_pack_sh")
      .outputMode("append").start()
    try {
      // bins must carry across micro-batch boundaries through every
      // (lang, shard) cursor
      docs.grouped((docs.size + 2) / 3).foreach { chunk =>
        mem.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()
    val stream = spark.table("s_pack_sh").as[PackAssignShard]
      .collect().map(a => a.doc_id -> a).toMap
    assert(stream.keySet == batch.keySet && stream.nonEmpty)
    stream.foreach { case (id, a) =>
      assert(a == batch(id), s"doc $id: stream $a vs batch ${batch(id)}")
    }
    // the parallelism the sharding buys is real: several shard
    // cursors carried documents, and some bins straddled batches
    assert(stream.values.map(_.shard).toSet.size > 1)
    assert(stream.values.groupBy(a => (a.lang, a.shard))
      .exists(_._2.map(_.bin).toSet.size > 1))
    // shards = 1 degenerates to the unsharded packer exactly
    val one = EventStreams.packBatchSharded(docs.toDS(), ctx, 1)
      .collect().map(a => a.doc_id -> (a.lang, a.bin, a.crosses)).toMap
    val flat = EventStreams.packBatch(docs.toDS(), ctx)
      .collect().map(a => a.doc_id -> (a.lang, a.bin, a.crosses)).toMap
    assert(one == flat)
  }

  test("sharded packer state survives a query RESTART from checkpoint") {
    // the exactly-once production posture: stop the query mid-corpus,
    // start a NEW query from the same checkpoint, and the per-(lang,
    // shard) bin cursors must resume where they left off — documents
    // packed after the restart land in the same bins the uninterrupted
    // batch twin assigns
    import graft.streaming.{EventStreams, PackAssignShard, PackDoc}
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val (ctx, shards) = (64, 4)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"lang",
        size(graft.functions.TextAnalysis.tokens($"text")).cast("long")
          .as("n_tokens"))
      .as[PackDoc].collect().sortBy(_.doc_id).toSeq
    val batch = EventStreams.packBatchSharded(docs.toDS(), ctx, shards)
      .collect().map(a => a.doc_id -> a).toMap
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-pack-ckpt").toString
    val (first, second) = docs.splitAt(docs.size / 2)
    val mem = MemoryStream[PackDoc]
    // foreachBatch is the recoverable custom sink (the memory sink
    // refuses checkpoint recovery); the buffer lives on the driver
    val sunk = new scala.collection.mutable.ArrayBuffer[PackAssignShard]
    def start() =
      EventStreams.packStreamSharded(mem.toDS(), ctx, shards)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[PackAssignShard],
                         _: Long) =>
          sunk.synchronized { sunk ++= df.collect() }; ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
    val q1 = start()
    try { mem.addData(first); q1.processAllAvailable() } finally q1.stop()
    val before = sunk.synchronized(sunk.toArray)
    // the restarted query replays nothing (offsets committed) and
    // resumes the cursors from state
    val q2 = start()
    try { mem.addData(second); q2.processAllAvailable() } finally q2.stop()
    val after = sunk.synchronized(sunk.toArray).drop(before.length)
    val stream = (before ++ after).map(a => a.doc_id -> a).toMap
    assert(stream.keySet == batch.keySet && after.nonEmpty)
    stream.foreach { case (id, a) =>
      assert(a == batch(id), s"doc $id after restart: $a vs batch ${batch(id)}")
    }
    // the continuity witness: some post-restart doc joined a bin its
    // stream opened BEFORE the restart (cursor state, not a fresh 0)
    val openBins = before.groupBy(a => (a.lang, a.shard))
      .map { case (k, as) => k -> as.map(_.bin).max }
    assert(after.exists(a =>
      openBins.get((a.lang, a.shard)).exists(_ == a.bin)),
      "no post-restart doc continued a pre-restart bin")
  }

  test("transformWithState packer == fMGWS packer == batch twin") {
    // Spark 4's successor state API must produce the identical
    // assignment stream; it REQUIRES the RocksDB provider, so this is
    // also a second engagement witness for that posture
    import graft.streaming.{EventStreams, PackAssignShard, PackDoc}
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val (ctx, shards) = (64, 4)
      val docs = graft.sources.Tables.documents(spark, sf)
        .select($"doc_id", $"lang",
          size(graft.functions.TextAnalysis.tokens($"text")).cast("long")
            .as("n_tokens"))
        .as[PackDoc].collect().sortBy(_.doc_id).toSeq
      val batch = EventStreams.packBatchSharded(docs.toDS(), ctx, shards)
        .collect().map(a => a.doc_id -> a).toMap
      val mem = MemoryStream[PackDoc]
      val q = EventStreams.packStreamTws(mem.toDS(), ctx, shards)
        .writeStream.format("memory").queryName("s_pack_tws")
        .outputMode("append").start()
      try {
        // state must carry across micro-batch boundaries here too
        docs.grouped((docs.size + 2) / 3).foreach { chunk =>
          mem.addData(chunk); q.processAllAvailable()
        }
      } finally q.stop()
      val tws = spark.table("s_pack_tws").as[PackAssignShard]
        .collect().map(a => a.doc_id -> a).toMap
      assert(tws.keySet == batch.keySet && tws.nonEmpty)
      tws.foreach { case (id, a) =>
        assert(a == batch(id), s"doc $id: tws $a vs batch ${batch(id)}")
      }
      // and some bin genuinely straddled micro-batches (cursor state)
      assert(tws.values.groupBy(a => (a.lang, a.shard))
        .exists(_._2.map(_.bin).toSet.size > 1))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("sharded packer under the RocksDB state store: same results, provider engaged") {
    // the 100-TB state posture: HDFSBackedStateStoreProvider keeps
    // every key in executor heap — fine for (lang × shards) cursors at
    // bench scale, an OOM at production key cardinality. RocksDB spills
    // state to local SSD and is the provider a real deployment pins;
    // the custom-state operator must produce identical assignments
    // under it, with the swap being pure configuration.
    import graft.streaming.{EventStreams, PackAssignShard, PackDoc}
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val (ctx, shards) = (64, 4)
      val docs = graft.sources.Tables.documents(spark, sf)
        .select($"doc_id", $"lang",
          size(graft.functions.TextAnalysis.tokens($"text")).cast("long")
            .as("n_tokens"))
        .as[PackDoc].collect().sortBy(_.doc_id).toSeq
      val batch = EventStreams.packBatchSharded(docs.toDS(), ctx, shards)
        .collect().map(a => a.doc_id -> a).toMap
      val mem = MemoryStream[PackDoc]
      val q = EventStreams.packStreamSharded(mem.toDS(), ctx, shards)
        .writeStream.format("memory").queryName("s_pack_rocks")
        .outputMode("append").start()
      try {
        docs.grouped((docs.size + 1) / 2).foreach { chunk =>
          mem.addData(chunk); q.processAllAvailable()
        }
        // witness the provider actually served the state operator:
        // RocksDB surfaces its own custom metrics in query progress
        val metrics = Option(q.lastProgress).toSeq
          .flatMap(_.stateOperators.toSeq)
          .flatMap(_.customMetrics.keySet().toArray.map(_.toString))
        assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
          s"state operator not on RocksDB; metrics=$metrics")
      } finally q.stop()
      val stream = spark.table("s_pack_rocks").as[PackAssignShard]
        .collect().map(a => a.doc_id -> a).toMap
      assert(stream.keySet == batch.keySet && stream.nonEmpty)
      stream.foreach { case (id, a) =>
        assert(a == batch(id), s"doc $id: rocksdb $a vs batch ${batch(id)}")
      }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("exactly-once dedup: dropDuplicatesWithinWatermark == batch dropDuplicates") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // at-least-once delivery: every 10th event arrives twice, the
    // duplicate ADJACENT to its original (broker retries land near
    // their first attempt — the case within-watermark state covers)
    val rows = eventRows(400)
    val delivered = rows.zipWithIndex.flatMap { case (r, i) =>
      if (i % 10 == 0) Seq(r, r) else Seq(r)
    }
    val batch = EventStreams.dedupEvents(delivered.toDF())
    val mem = MemoryStream[Ev]
    val (first, second) = delivered.splitAt(delivered.size / 2)
    val q = EventStreams.dedupEventsStream(
        mem.toDF().withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("s_dedup")
      .outputMode("append")
      .start()
    try {
      mem.addData(first); q.processAllAvailable()
      mem.addData(second); q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("s_dedup")
    assert(canon(stream) == canon(batch),
      "streamed exactly-once repair must converge to the batch dedup")
    assert(batch.count() == rows.size.toLong,
      "dedup must restore the original event population")
    assert(delivered.size > rows.size, "the injector actually duplicated")
  }
}
