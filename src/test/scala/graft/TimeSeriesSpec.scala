package graft

import graft.operators.{Relational, TextAnalytics, TimeSeries}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Pins the four operators wired into the catalog this round:
  * calendar gap-fill, bucketed range join, PII redaction, and the
  * approx-quantile error bound. Each is checked against either a
  * hand-computable fixture or an independent naive Spark plan, so
  * the oracle parity the driver certifies is exercised here first. */
class TimeSeriesSpec extends AnyFunSuite with SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gapFillDailyOf fills calendar gaps with n=0 and forward-fills value") {
    import spark.implicits._
    // user 1: days 1,2,4 observed (day 3 is the gap); user 2: one day
    val events = Seq(
      (1L, ts("2026-01-01 10:00:00"), 10.0),
      (1L, ts("2026-01-02 09:00:00"), 20.0),
      (1L, ts("2026-01-02 11:00:00"), 5.0),
      (1L, ts("2026-01-04 08:00:00"), 40.0),
      (2L, ts("2026-03-07 00:30:00"), 7.0)
    ).toDF("user_id", "ts", "value")
    val got = TimeSeries.gapFillDailyOf(events)
      .select($"user_id", $"day", $"n_events", $"filled_value")
      .as[(Long, String, Long, Double)].collect().toSeq
    val want = Seq(
      (1L, "2026-01-01", 1L, 10.0),
      (1L, "2026-01-02", 2L, 25.0),
      (1L, "2026-01-03", 0L, 25.0), // gap day: zero events, value carried
      (1L, "2026-01-04", 1L, 40.0),
      (2L, "2026-03-07", 1L, 7.0))
    assert(got == want)
  }

  test("rangeJoinOf equals the naive theta join, end-exclusive") {
    import spark.implicits._
    val intervals = Seq(
      (10L, ts("2026-01-01 00:00:00"), ts("2026-01-08 00:00:00")),
      (11L, ts("2026-01-05 00:00:00"), ts("2026-01-20 00:00:00")),
      (12L, ts("2026-02-01 00:00:00"), ts("2026-02-01 00:00:01"))
    ).toDF("iv_id", "start", "end")
    val probe = (1 to 40).map { i =>
      (i.toLong, new Timestamp(ts("2025-12-28 12:00:00").getTime + i * 21600_000L))
    }.toDF("p_id", "t")
    val fast = TimeSeries.rangeJoinOf(probe, "t", intervals, "start", "end",
        bucketDays = 3)
      .select($"iv_id", $"p_id").as[(Long, Long)].collect().toSeq.sorted
    val naive = intervals.crossJoin(probe)
      .filter($"t" >= $"start" && $"t" < $"end")
      .select($"iv_id", $"p_id").as[(Long, Long)].collect().toSeq.sorted
    assert(fast == naive && naive.nonEmpty)
    // probes replicate to exactly one bucket: no dedup hidden anywhere
    assert(fast.distinct == fast)
  }

  test("piiRedact accounts hits and redacted length consistently") {
    import spark.implicits._
    val out = TextAnalytics.piiRedact(spark, sf)
    val rows = out.as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // independent recount of one side: docs with >=1 pattern hit
    val expHit = Tables.documents(spark, sf)
      .filter($"text".rlike(TextAnalytics.PiiPattern))
      .groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    val gotHit = rows.map(r => r._1 -> r._2).toMap
    assert(gotHit.filter(_._2 > 0) == expHit)
    // redaction never lengthens text by more than |[PII]| per hit
    val base = Tables.documents(spark, sf).groupBy($"lang")
      .agg(sum(length($"text")).cast("long")).as[(String, Long)].collect().toMap
    rows.foreach { case (lang, _, hits, after) =>
      assert(after <= base(lang) + hits * "[PII]".length)
    }
  }

  test("approx_percentile lands inside the exact ±2% rank bracket") {
    import spark.implicits._
    val rows = Relational.approxQuantileBound(spark, sf)
      .select($"o_orderpriority", $"p50_in_bound", $"p95_in_bound",
        $"p50_lo" <= $"p50_hi", $"p95_lo" <= $"p95_hi")
      .as[(String, Boolean, Boolean, Boolean, Boolean)].collect()
    assert(rows.length == 5)
    rows.foreach { case (p, b50, b95, lo50, lo95) =>
      assert(b50 && b95 && lo50 && lo95, s"bracket violated for $p")
    }
  }

  test("scd2: versions chain gaplessly, exactly one open row per key") {
    import spark.implicits._
    val hist = TimeSeries.scd2(spark, sf)
      .select($"key", $"version", $"valid_from", $"valid_to", $"is_current")
      .as[(Long, Long, String, Option[String], Boolean)].collect()
      .groupBy(_._1)
    assert(hist.nonEmpty)
    val nChanges = Tables.events(spark, sf).filter($"user_id" < 30).count()
    assert(hist.values.map(_.length.toLong).sum == nChanges,
      "one version row per change")
    hist.foreach { case (key, rows0) =>
      val rows = rows0.sortBy(_._2)
      // versions are 1..n with no gaps
      assert(rows.map(_._2).toSeq == (1L to rows.length).toSeq, s"key $key")
      // exactly the last row is open/current; all others closed
      rows.zipWithIndex.foreach { case ((_, _, _, to, cur), i) =>
        val last = i == rows.length - 1
        assert(cur == last && to.isEmpty == last, s"key $key v${i + 1}")
      }
      // each closed interval's end == the next version's start
      rows.sliding(2).foreach {
        case Array((_, _, _, Some(to), _), (_, _, from, _, _)) =>
          assert(to == from, s"key $key interval chain broken")
        case _ =>
      }
    }
  }

  test("dau/wau: wau dominates dau and equals a direct trailing-range replay") {
    import spark.implicits._
    val got = TimeSeries.eventsDauWau(spark, sf)
      .as[(java.sql.Date, Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty)
    // direct replay: distinct users per day, WAU(d) = |∪ users over
    // [d-6, d]| — no explode, brute force over collected pairs
    val ud = graft.sources.Tables.events(spark, sf)
      .select(to_date($"ts").as("d"), $"user_id").distinct()
      .as[(java.sql.Date, Long)].collect()
    val byDay = ud.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    got.foreach { case (day, dau, wau, stick) =>
      val want = byDay(day)
      assert(dau == want.size, s"$day dau")
      val trailing = (0 to 6).flatMap { k =>
        byDay.get(java.sql.Date.valueOf(day.toLocalDate.minusDays(k)))
          .getOrElse(Set.empty)
      }.toSet
      assert(wau == trailing.size, s"$day wau")
      assert(wau >= dau && stick > 0 && stick <= 1.0)
    }
  }

  test("retention matrix: cohort sizes at offset 0 partition the user base") {
    import spark.implicits._
    val got = TimeSeries.eventsRetention(spark, sf)
      .as[(java.sql.Date, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    // every cohort leads with offset 0, and no later offset exceeds
    // the cohort size (a user can't return without having arrived)
    got.groupBy(_._1).foreach { case (day, rows) =>
      val byOffset = rows.map(r => r._2 -> r._3)
      assert(byOffset.head._1 == 0L, s"cohort $day missing offset 0")
      val size = byOffset.head._2
      byOffset.tail.foreach { case (off, n) =>
        assert(n <= size, s"cohort $day offset $off: $n > cohort size $size")
      }
    }
    // offset-0 counts partition the distinct-user base exactly
    val users = graft.sources.Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(got.filter(_._2 == 0L).map(_._3).sum == users)
  }

  test("concurrencyPeak counts a day's standing carry-in as a peak candidate") {
    import spark.implicits._
    // five users open sessions on day 1 (one event each); no day-2
    // boundaries fall before the five session-ends at 00:30, so day
    // 2's true peak is its CARRY-IN of 5 — a day whose first delta is
    // negative must not report carry+run = 4
    val ts = (u: Long, s: String) => (u, java.sql.Timestamp.valueOf(s))
    val events = (1L to 5L).map(u => ts(u, "2024-01-01 23:59:00")).toDF("user_id", "ts")
    val got = TimeSeries.concurrencyPeakOf(events, gapMinutes = 31)
      .as[(java.sql.Date, Long)].collect().toMap
    assert(got(java.sql.Date.valueOf("2024-01-01")) == 5L)
    // day 2 rows are the five -1 deltas at 00:30; peak = carry-in 5
    assert(got(java.sql.Date.valueOf("2024-01-02")) == 5L)
  }

  test("scd2 as-of: one row per key, consistent with the full history") {
    import spark.implicits._
    val asof = TimeSeries.scd2AsOf(spark, sf).collect()
    assert(asof.map(_.getLong(0)).distinct.length === asof.length,
      "AS OF must resolve to exactly one version per key")
    // every as-of row must exist in the history with a containing interval
    val hist = TimeSeries.scd2(spark, sf)
      .select($"key", $"version", $"valid_from", $"valid_to")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), Option(r.getString(3)))).toMap
    val t = "2024-01-15 00:00:00"
    asof.foreach { r =>
      val (from, to) = hist((r.getLong(0), r.getLong(1)))
      assert(from <= t && to.forall(_ > t),
        s"key ${r.getLong(0)} v${r.getLong(1)}: interval [$from,$to) misses $t")
    }
    // keys with history only AFTER the instant are correctly absent
    assert(asof.forall(_.getString(3) <= t))
  }

  test("ewma: constant series is a fixed point, first point is itself, bounded") {
    import spark.implicits._
    val flat = (1 to 30)
      .map(i => ("P", java.sql.Date.valueOf(f"2024-01-$i%02d"), 100.0))
      .toDF("priority", "day", "revenue")
    TimeSeries.ewmaOf(flat).collect().foreach(r =>
      assert(r.getDouble(3) == 100.0, "EWMA of a constant IS the constant"))
    val ramp = Seq(("P", java.sql.Date.valueOf("2024-01-01"), 10.0),
      ("P", java.sql.Date.valueOf("2024-01-02"), 20.0))
      .toDF("priority", "day", "revenue")
    val got = TimeSeries.ewmaOf(ramp).collect()
      .map(r => r.getDate(1).toString -> r.getDouble(3)).toMap
    assert(got("2024-01-01") == 10.0, "n=1 frame: EWMA = the point")
    // n=2, alpha=.3: (10*0.7 + 20*1) / (0.7 + 1) = 15.8824
    assert(got("2024-01-02") == 15.8824)
    // corpus sanity: smoothing stays inside each priority's range
    val bounds = TimeSeries.ewmaDaily(spark, sf)
      .groupBy($"priority")
      .agg(min($"revenue").as("lo"), max($"revenue").as("hi"),
        min($"ewma").as("elo"), max($"ewma").as("ehi"))
      .collect()
    bounds.foreach { r =>
      assert(r.getDouble(3) >= r.getDouble(1) && r.getDouble(4) <= r.getDouble(2))
    }
  }

  test("seasonal decompose: components reconstruct revenue, weekday effects centered, edges dropped") {
    import spark.implicits._
    val rows = TimeSeries.seasonalDecompose(spark, sf).cache()
    val n = rows.count()
    val nDays = graft.sources.Tables.orders(spark, sf)
      .select(to_date($"o_orderdate")).distinct().count()
    // exactly the 3+3 edge days of the observed series are dropped
    assert(n == nDays - 6, s"interior days $n vs observed $nDays")
    // identity: revenue == trend + effect + resid (to rounding dust)
    val broken = rows.filter(
      abs($"revenue" - ($"trend" + $"effect" + $"resid")) > 2e-4).count()
    assert(broken == 0, "decomposition does not reconstruct revenue")
    // weekday effects are deviations from a centered average: their
    // day-weighted mean is ~0 relative to the revenue scale (exact 0
    // only if edge days contributed symmetrically to every window)
    val meanRev = rows.agg(avg($"revenue")).head().getDouble(0)
    val eff = rows.groupBy($"effect").count().collect()
      .map(r => r.getDouble(0) * r.getLong(1)).sum / n
    assert(math.abs(eff) < 0.005 * meanRev,
      s"weekday effects not centered: $eff vs revenue scale $meanRev")
    // residuals are centered too (same argument)
    val res = rows.agg(avg($"resid")).head().getDouble(0)
    assert(math.abs(res) < 0.005 * meanRev, s"residual mean $res vs $meanRev")
  }

  test("revenue drawdown: hand-walked dip fixture, nonnegative depths on the corpus") {
    import spark.implicits._
    // 8 days, a 2-day dip: S=64, mean 8; scaled deviations 8x−64 are
    // +16 per 10-day and −48 per 2-day, so the path peaks at day 4
    // (cum 64) and bottoms at day 6 (cum −32) — depth (peak−cum)/8
    // is 12 at the dip bottom, recovering by 2/day after
    val daily = Seq("2024-01-01" -> 10.0, "2024-01-02" -> 10.0,
      "2024-01-03" -> 10.0, "2024-01-04" -> 10.0,
      "2024-01-05" -> 2.0, "2024-01-06" -> 2.0,
      "2024-01-07" -> 10.0, "2024-01-08" -> 10.0)
      .toDF("d", "r")
      .select($"d".cast("date").as("day"), $"r".cast("decimal(18,2)").as("rev"))
    val got = TimeSeries.revenueDrawdownOf(daily, k = 3).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toSeq
    assert(got == Seq(("2024-01-06", 12.0), ("2024-01-07", 10.0),
      ("2024-01-08", 8.0)), s"got $got")
    // corpus: depths are nonnegative (cum <= its running max by
    // construction) and the report is exactly k rows
    val corpus = TimeSeries.revenueDrawdown(spark, sf).collect()
    assert(corpus.length == TimeSeries.DrawdownTopK)
    assert(corpus.forall(_.getDouble(2) >= 0.0))
  }

  test("markov transitions: hand-walked matrix with a same-ts tie, corpus rows normalize") {
    import spark.implicits._
    import java.sql.Timestamp
    // u1 has two events at the SAME timestamp — event_id breaks the
    // tie (A before B), so the walk is A,B,A: A->B, B->A.
    // u2 walks A,A: A->A. Row A normalizes to 0.5/0.5, row B to 1.0.
    val ts = (m: Int) => Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, ts(0), 1L, "A"), (1L, ts(0), 2L, "B"), (1L, ts(5), 3L, "A"),
      (2L, ts(0), 4L, "A"), (2L, ts(9), 5L, "A"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = TimeSeries.markovTransitionsOf(ev)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(("A", "A", 1L, 0.5), ("A", "B", 1L, 0.5),
      ("B", "A", 1L, 1.0)), s"got $got")
    // corpus: every row of the matrix normalizes to 1 within the
    // floor-division grid (|types| * 1e-6), counts conserve to
    // (events - users) — each user contributes sequence-length - 1
    val m = TimeSeries.markovTransitions(spark, sf)
      .as[(String, String, Long, Double)].collect()
    val byPrev = m.groupBy(_._1)
    byPrev.values.foreach { rows =>
      val tot = rows.map(_._4).sum
      assert(tot <= 1.0 + 1e-9 && tot > 1.0 - rows.length * 1e-6,
        s"row sum $tot")
    }
    val events = graft.sources.Tables.events(spark, sf)
    val expectSteps = events.count() -
      events.select($"user_id").distinct().count()
    assert(m.map(_._3).sum == expectSteps)
  }

  test("forecast baseline: exact weekly pattern scores zero error except the perturbed day") {
    import spark.implicits._
    // two weeks, flat 100/day except 150 on 2024-01-10 (a Wednesday):
    // the seasonal-naive backtest evaluates week 2 only, and every
    // weekday scores zero except ISO dow 3 with ape = 50/150
    val daily = (1 to 14).map { d =>
      (java.sql.Date.valueOf(f"2024-01-$d%02d"),
        if (d == 10) BigDecimal(150) else BigDecimal(100))
    }.toDF("day", "rev")
      .select($"day", $"rev".cast("decimal(18,2)").as("rev"))
    val got = TimeSeries.forecastBaselineOf(daily)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(got.length == 7)
    got.foreach { case (dow, n, ae, mape, smape) =>
      assert(n == 1L)
      if (dow == 3L) {
        assert(ae == 50.0)
        assert(mape == (50L * 1000000L / 150L).toDouble / 1000000.0)
        assert(smape == (50L * 2000000L / 250L).toDouble / 1000000.0)
      } else assert(ae == 0.0 && mape == 0.0 && smape == 0.0,
        s"dow $dow not zero: $ae $mape")
    }
    // corpus: evaluated-day mass equals the independent day-7-join
    // count, and the error metrics are within their defined ranges
    val corpus = TimeSeries.forecastBaseline(spark, sf)
      .as[(Long, Long, Double, Double, Double)].collect()
    val days = graft.sources.Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.to_date($"o_orderdate").as("d"))
      .distinct()
    val evaluable = days.as("a").join(days.as("b"),
      org.apache.spark.sql.functions.expr("a.d = date_add(b.d, 7)")).count()
    assert(corpus.map(_._2).sum == evaluable)
    corpus.foreach { case (dow, _, ae, mape, smape) =>
      assert(dow >= 1 && dow <= 7 && ae >= 0.0 && mape >= 0.0)
      assert(smape >= 0.0 && smape <= 2.0) // sMAPE is bounded by 2
    }
  }

  test("acf: alternating series hand-walked; corpus values bounded") {
    import spark.implicits._
    // y = (100, 200, 100, 200) on consecutive days: mu = 150,
    // d = (-50, 50, -50, 50), dd = 10000;
    // lag 1: 3 pairs, num = -7500 -> -0.75; lag 2: 2 pairs, +0.5
    val tiny = (1 to 4).map { i =>
      (i.toLong, java.sql.Date.valueOf(f"2024-01-0$i"),
        BigDecimal(if (i % 2 == 1) 100 else 200))
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("acf").toString
    tiny.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = TimeSeries.acfDaily(spark, dir, maxLag = 3)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 3L, -0.75), (2L, 2L, 0.5), (3L, 1L, -0.25)),
      s"got $got")
    // corpus: every lag present, Cauchy-Schwarz bound holds
    val corpus = TimeSeries.acfDaily(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(corpus.map(_._1).toSeq == (1L to 14L))
    corpus.foreach { case (lag, n, r) =>
      assert(n > 0, s"lag $lag has no pairs")
      assert(!r.isNaN && math.abs(r) <= 1.0, s"acf($lag) = $r")
    }
  }

  test("seasonal anomaly: flags replay from the decompose residuals") {
    import spark.implicits._
    val flagged = TimeSeries.seasonalAnomaly(spark, sf)
      .as[(String, Double, Double, Double, Double)].collect()
    // independent replay from the decompose output
    val resid = TimeSeries.seasonalDecompose(spark, sf)
      .select($"day", $"resid").as[(String, Double)].collect()
      .map { case (d, r) => (d, math.round(r * 10000)) }
    def lowerMedian(xs: Seq[Long]): Long =
      xs.sorted.apply(((xs.length + 1) / 2) - 1)
    val med = lowerMedian(resid.map(_._2).toSeq)
    val mad = lowerMedian(resid.map(x => math.abs(x._2 - med)).toSeq)
    val want = resid.filter(x => mad > 0 && math.abs(x._2 - med) > 3 * mad)
      .map(_._1).toSet
    assert(flagged.map(_._1).toSet == want,
      s"flags ${flagged.map(_._1).toSet} != replay $want")
    flagged.foreach(f => assert(f._4 > 3 * f._5))
    // the MAD column is one global scalar on every row
    assert(flagged.map(_._5).distinct.length <= 1)
  }

  test("event paths: corpus paths reconcile with the step census") {
    import spark.implicits._
    val rows = TimeSeries.eventPaths(spark, sf, k = Int.MaxValue)
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    // total 3-step segments = Σ over users max(0, n_events - 2)
    val want = Tables.events(spark, sf)
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
      .agg(sum(greatest($"n" - 2L, lit(0L)))).head().getLong(0)
    assert(rows.map(_._2).sum == want, s"path mass ${rows.map(_._2).sum} != $want")
    // ordering contract + floor-scaled shares
    assert(rows.map(_._2).toSeq == rows.map(_._2).toSeq.sortBy(-_))
    rows.foreach(r => assert(r._3 >= 0.0 && r._3 <= 1.0))
    // every path is three '>'-joined known event types
    val types = Tables.events(spark, sf)
      .select($"event_type").distinct().as[String].collect().toSet
    rows.foreach { r =>
      val parts = r._1.split(">")
      assert(parts.length == 3 && parts.forall(types), s"bad path ${r._1}")
    }
  }

  test("bootstrap CI: constant series collapses the interval; corpus bracket holds") {
    import spark.implicits._
    // every resample of a constant series has the same median: the
    // interval MUST collapse to the point exactly
    val tiny = (1 to 9).map { i =>
      (i.toLong, java.sql.Date.valueOf(f"2024-01-0${(i % 9) + 1}"),
        BigDecimal(250))
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
      .withColumnRenamed("o_custkey", "o_orderkey")
    val dir = java.nio.file.Files.createTempDirectory("boot").toString
    tiny.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val flat = TimeSeries.bootstrapCi(spark, dir)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(flat == ((9L, 40L, 250L, 250L, 250L)), s"got $flat")
    // corpus: a genuine interval inside the observed range, ordered,
    // and deterministic across runs (no RNG state anywhere)
    val c = TimeSeries.bootstrapCi(spark, sf)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(c._2 == 40L && c._4 <= c._3 && c._3 <= c._5,
      s"interval does not bracket the median: $c")
    assert(c == TimeSeries.bootstrapCi(spark, sf)
      .as[(Long, Long, Long, Long, Long)].head())
  }

  test("changepoint: step series splits at the step; corpus sane") {
    import spark.implicits._
    // y = (100, 100, 200, 200): the k=2 split removes ALL within-
    // segment variance -> gain = 20000 + 80000 - 90000 = 10000
    val tiny = (1 to 4).map { i =>
      (i.toLong, java.sql.Date.valueOf(f"2024-01-0$i"),
        BigDecimal(if (i <= 2) 100 else 200))
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("cpt").toString
    tiny.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = TimeSeries.changepoint(spark, dir)
      .as[(java.sql.Date, Long, Long, Double, Double, Double)].head()
    assert(got == ((java.sql.Date.valueOf("2024-01-02"), 2L, 2L,
      100.0, 200.0, 10000.0)), s"got $got")
    // corpus: a genuine interior split with non-negative gain (the
    // between-segment identity bounds gain below by zero)
    val c = TimeSeries.changepoint(spark, sf)
      .as[(java.sql.Date, Long, Long, Double, Double, Double)].head()
    assert(c._2 > 0 && c._3 > 0 && c._6 >= 0.0, s"corpus $c")
  }
}
