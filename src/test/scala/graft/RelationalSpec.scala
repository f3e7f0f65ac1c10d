package graft

import graft.operators.Relational
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite with SparkSpec {

  test("salted join equals the plain join and actually shuffles") {
    import spark.implicits._
    val salted = Relational.saltedJoin(spark, sf)
    // the hint must hold: a broadcast would bypass the salted shuffle
    // and make the demo vacuous
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"expected a shuffled hash join in:\n$plan")
    val plain = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double")
          .as("total_price"))
      .orderBy($"c_mktsegment")
    assert(salted.collect().toSeq == plain.collect().toSeq)
    assert(salted.count() > 0)
  }

  test("column profile matches direct per-column computations") {
    import spark.implicits._
    val prof = Relational.columnProfile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.keySet == Set("l_quantity", "l_extendedprice",
      "l_discount", "l_tax", "l_returnflag", "l_linestatus"))
    val li = Tables.lineitem(spark, sf)
    val nRows = li.count()
    prof.values.foreach(r => assert(r.getLong(1) == nRows))
    // spot-check one numeric and one categorical column independently
    val q = prof("l_quantity")
    assert(q.getLong(2) == li.filter($"l_quantity".isNull).count())
    assert(q.getLong(3) == li.select($"l_quantity").distinct().count())
    val mm = li.agg(min($"l_quantity").cast("double"),
      max($"l_quantity").cast("double")).head()
    assert(q.getDouble(4) == mm.getDouble(0) && q.getDouble(5) == mm.getDouble(1))
    val f = prof("l_returnflag")
    assert(f.getLong(3) == li.select($"l_returnflag").distinct().count())
    assert(f.isNullAt(4) && f.isNullAt(5) && f.isNullAt(6))
    // plan shape: one moments scan + one column-pruned scan per
    // distinct branch — and every distinct branch reads EXACTLY one
    // column (the columnar-storage argument for the union design)
    // sparkPlan, not executedPlan: the unexecuted AdaptiveSparkPlanExec
    // wrapper is childless, so collectLeaves on it sees no scans
    val leaves = Relational.columnProfile(spark, sf)
      .queryExecution.sparkPlan.collectLeaves()
    assert(leaves.size == 7, s"expected 1 moments + 6 distinct scans, " +
      s"saw ${leaves.size}")
    val oneCol = leaves.count(_.schema.fields.length == 1)
    assert(oneCol == 6, s"distinct branches should read 1 column, " +
      s"pruned=$oneCol of ${leaves.size}")
  }

  test("histogram: counts conserve, buckets within range, mass in bounds") {
    import spark.implicits._
    val bins = Relational.histogram(spark, sf)
      .as[(Long, Long, Double)].collect()
    val o = Tables.orders(spark, sf)
    assert(bins.map(_._2).sum == o.count(), "every order lands in a bucket")
    assert(bins.forall(b => b._1 >= 0 && b._1 < 20))
    val total = o.agg(sum($"o_totalprice".cast("decimal(18,2)"))
      .cast("double")).as[Double].head()
    assert(math.abs(bins.map(_._3).sum - total) < 1e-6)
    // equi-width: bucket k's orders all cost within [lo+k*w, lo+(k+1)*w]
    val mm = o.agg(min($"o_totalprice"), max($"o_totalprice")).head()
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val w = (hi - lo) / 20
    val viol = o.withColumn("b",
      least(floor(($"o_totalprice" - lo) / w), lit(19L)))
      .filter($"o_totalprice" < lit(lo) + $"b" * w - 1e-9 ||
        $"o_totalprice" > lit(lo) + ($"b" + 1) * w + 1e-9)
      .count()
    assert(viol == 0)
  }

  test("z-score outliers match an independent driver-side replay") {
    import spark.implicits._
    val got = Relational.outlierZscore(spark, sf)
      .select($"day".cast("string"), $"z").as[(String, Double)]
      .collect().toMap
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date($"o_orderdate").as("day"))
      .agg(sum($"o_totalprice".cast("decimal(18,2)")).cast("double")
        .as("rev"))
      .select($"day".cast("string"), $"rev")
      .as[(String, Double)].collect()
    val mu = daily.map(_._2).sum / daily.length
    val sd = math.sqrt(
      daily.map(d => math.pow(d._2 - mu, 2)).sum / (daily.length - 1))
    val want = daily.map { case (d, r) =>
      d -> BigDecimal((r - mu) / sd)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.filter { case (_, z) => math.abs(z) >= 2.0 }.toMap
    assert(got.keySet == want.keySet,
      s"flagged days ${got.keySet} vs replay ${want.keySet}")
    got.foreach { case (d, z) => assert(math.abs(z - want(d)) <= 1e-4) }
    assert(got.nonEmpty, "sf0.001 should flag at least one outlier day")
  }

  test("null-safe join keeps the null bucket a plain equi-join drops") {
    import spark.implicits._
    val got = Relational.joinNullSafe(spark, sf)
      .as[(String, Long, Double)].collect().toSeq
    val labels = got.map(_._1)
    assert(labels.contains("bucket-null"), s"null bucket missing: $labels")
    // the null-safe join covers every event exactly once
    val total = graft.sources.Tables.events(spark, sf).count()
    assert(got.map(_._2).sum == total)
    // a plain `=` join on the same frames loses exactly the null rows
    val ev = graft.sources.Tables.events(spark, sf)
      .withColumn("k",
        expr("nullif(cast(get_json_object(props, '$.k') as bigint) % 10, 5)"))
    val dim = ev.select($"k").distinct()
    val plain = ev.as("e").join(dim.as("d"), col("e.k") === col("d.k")).count()
    val nulls = got.find(_._1 == "bucket-null").get._2
    assert(plain == total - nulls)
  }

  test("psi drift matches a driver-side replay of the smoothed formula") {
    import spark.implicits._
    val bins = 10
    val got = Relational.psiDrift(spark, sf)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty)
    // replay: same split, same reference-edged bins, same smoothing
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"event_type", $"value", $"ts".cast("double"))
      .as[(String, Double, Double)].collect()
    val (t0, t1) = (ev.map(_._3).min, ev.map(_._3).max)
    val mid = (t0 + t1) / 2
    val ref = ev.filter(_._3 < mid)
    val (lo, hi) = (ref.map(_._2).min, ref.map(_._2).max)
    def bucket(v: Double): Long =
      if (hi == lo) 0L
      else math.max(math.min(math.floor((v - lo) / ((hi - lo) / bins)), bins - 1L), 0L).toLong
    got.foreach { case (et, nRef, nCur, psi) =>
      val rows = ev.filter(_._1 == et)
      val (p0, p1) = rows.partition(_._3 < mid)
      assert(nRef == p0.length && nCur == p1.length)
      val cells = rows.map(r => bucket(r._2)).distinct
      val want = cells.map { b =>
        val np = p0.count(r => bucket(r._2) == b)
        val nq = p1.count(r => bucket(r._2) == b)
        val p = (np + 0.5) / (p0.length + 0.5 * bins)
        val q = (nq + 0.5) / (p1.length + 0.5 * bins)
        (q - p) * math.log(q / p)
      }.sum
      assert(math.abs(psi - want) < 1e-5, s"$et psi $psi vs $want")
      // same generator both halves → the monitor reads stable
      assert(psi < 0.1, s"$et unexpectedly drifted: $psi")
    }
  }

  test("window distinct equals the groupBy-distinct replay") {
    import spark.implicits._
    val got = Relational.windowDistinct(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    // replay without the window: per-customer distinct priorities by
    // aggregate, weighted by that customer's order count
    val want = Tables.orders(spark, sf)
      .groupBy($"o_custkey")
      .agg(countDistinct($"o_orderpriority").as("n_prio"),
        count(lit(1)).as("n_orders"))
      .groupBy($"n_prio")
      .agg(sum($"n_orders").as("n_orders"),
        count(lit(1)).as("n_customers"))
      .orderBy($"n_prio")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == want)
    assert(got.nonEmpty && got.forall { case (np, _, _) => np >= 1 && np <= 5 })
  }

  test("incremental agg merge equals the full recompute at every cutoff shape") {
    import spark.implicits._
    // full recompute, straight groupBy — what the oracle runs
    def full(): Seq[(String, String, Long, Double, Double, Double, java.sql.Date)] =
      Tables.lineitem(spark, sf)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"),
          round(sum($"l_quantity".cast("decimal(18,2)")).cast("double")
            / count(lit(1)), 6).as("avg_qty"),
          max($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("max_price"),
          min(to_date($"l_shipdate")).as("min_ship"))
        .orderBy($"l_returnflag", $"l_linestatus")
        .as[(String, String, Long, Double, Double, Double, java.sql.Date)]
        .collect().toSeq
    val want = full()
    // mid-range cutoff (both partials non-empty), all-history cutoff
    // (delta empty), all-delta cutoff (history empty): the merge with
    // identity elements must reproduce the full aggregate in each
    for (cutoff <- Seq("1999-01-01", "2005-01-01", "1990-01-01")) {
      val got = Relational.incrementalAgg(spark, sf, cutoff)
        .as[(String, String, Long, Double, Double, Double, java.sql.Date)]
        .collect().toSeq
      assert(got == want, s"cutoff $cutoff diverged from full recompute")
    }
  }

  test("cdc compact: fixture semantics and window-replay equivalence") {
    import spark.implicits._
    // hand changelog: key 1 I→U→U (last U wins); key 2 I→D (gone);
    // key 3 D→I (delete then re-insert: I wins — order matters, not
    // op precedence); key 4 same-ts tie broken by seq
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(t0.getTime + s * 1000)
    val log = Seq(
      (1L, ts(0), 10L, "I", 1.0), (1L, ts(1), 11L, "U", 2.0),
      (1L, ts(2), 12L, "U", 3.0),
      (2L, ts(0), 20L, "I", 4.0), (2L, ts(5), 21L, "D", 0.0),
      (3L, ts(0), 30L, "D", 0.0), (3L, ts(9), 31L, "I", 7.0),
      (4L, ts(4), 41L, "U", 8.0), (4L, ts(4), 40L, "I", 9.0)
    ).toDF("key", "ts", "seq", "op", "value")
    val got = Relational.cdcCompactOf(log)
      .as[(Long, Long, String, Double, String)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, "U", 3.0, "2024-01-01 00:00:02"),
      (3L, 2L, "I", 7.0, "2024-01-01 00:00:09"),
      (4L, 2L, "U", 8.0, "2024-01-01 00:00:04")))

    // on real data, the aggregate form equals the window+filter replay
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val replay = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w))
      .withColumn("n_ops", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"user_id")))
      .filter($"rn" === 1 && $"event_type" =!= "error")
      .select($"user_id", $"n_ops",
        when($"event_type" === "signup", "I").otherwise("U").as("last_op"),
        $"value".as("last_value"),
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("last_ts_s"))
      .orderBy($"user_id")
      .as[(Long, Long, String, Double, String)].collect().toSeq
    val real = Relational.cdcCompact(spark, sf)
      .as[(Long, Long, String, Double, String)].collect().toSeq
    assert(real == replay && real.nonEmpty)
  }

  test("k-anonymity: achieved k is the true minimum over cells") {
    val rows = Relational.kAnonymity(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.nonEmpty)
    // independent recompute of one type's cell minimum
    val (typ, (_, kAch, lt10, lt50)) = rows.head
    val cells = Tables.events(spark, sf)
      .filter(col("event_type") === typ)
      .groupBy(to_date(col("ts")), (hour(col("ts")) / 6).cast("int"))
      .agg(count_distinct(col("user_id")).as("u"))
      .select("u").collect().map(_.getLong(0))
    assert(kAch === cells.min)
    assert(lt10 === cells.count(_ < 10).toLong)
    assert(lt50 === cells.count(_ < 50).toLong)
  }

  test("mad outliers: driver-side replay agrees, flags beat the cut") {
    val flagged = Relational.outlierMad(spark, sf).collect()
      .map(r => r.getDate(0).toString -> r.getDouble(2)).toMap
    flagged.values.foreach(rz => assert(math.abs(rz) > 3.0))
    // independent replay: exact median/MAD over the collected daily frame
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
        .as("revenue"))
      .collect().map(r => r.getDate(0).toString -> r.getDouble(1))
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val m = med(daily.map(_._2).toSeq)
    val mad = med(daily.map(d => math.abs(d._2 - m)).toSeq)
    val expect = daily.filter { case (_, v) =>
      math.abs(BigDecimal((v - m) / (1.4826 * mad))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) > 3.0
    }.map(_._1).toSet
    assert(flagged.keySet === expect)
  }

  test("snapshot diff: identical cutoffs diff to all-unchanged, zero drift") {
    val same = Relational.snapshotDiff(spark, sf, "1997-01-01", "1997-01-01")
      .collect()
    assert(same.length == 1 && same.head.getString(0) == "unchanged")
    assert(same.head.getDouble(2) == 0.0)
    // and a real window produces a multi-status census whose drift is
    // exactly the quantity shipped inside the window
    val diff = Relational.snapshotDiff(spark, sf).collect()
    assert(diff.map(_.getString(0)).toSet.subsetOf(
      Set("added", "removed", "changed", "unchanged")))
    val drift = diff.map(_.getDouble(2)).sum
    val direct = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= "1996-06-01" && col("l_shipdate") < "1997-06-01")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double"))
      .collect().head.getDouble(0)
    assert(math.abs(drift - direct) < 1e-6,
      s"status drifts $drift must reconstruct the window's shipments $direct")
  }

  test("market share: Q8 shape — shares well-formed, market total reconstructs") {
    import spark.implicits._
    val rows = Relational.marketShare(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rr, tr, sh) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(rr >= 0.0 && rr <= tr + 1e-9, s"region slice $rr exceeds market $tr")
      assert(math.abs(sh - BigDecimal(rr / tr)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
    // independent reconstruction: the per-year market totals must sum
    // to the PROMO revenue computed by a plain two-table path
    val direct = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter($"p_type" === "PROMO"),
        $"l_partkey" === $"p_partkey")
      .agg(sum(($"l_extendedprice".cast("decimal(18,2)") *
        (lit(1.0) - $"l_discount").cast("decimal(18,2)")))
        .cast("double")).collect().head.getDouble(0)
    val totals = rows.map(_.getDouble(2)).sum
    assert(math.abs(totals - direct) < 1e-6,
      s"yearly totals $totals must reconstruct the direct PROMO revenue $direct")
  }

  test("l-diversity: achieved l and policy counts reconstruct from raw cells") {
    import spark.implicits._
    val rows = Relational.lDiversity(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.nonEmpty)
    // driver-side replay over the raw cells (sf0.001 is small)
    val cells = Tables.events(spark, sf)
      .select(to_date($"ts").as("day"), (hour($"ts") / 6).cast("int").as("q"),
        $"event_type")
      .collect().map(r => ((r.getDate(0).toString, r.getInt(1)), r.getString(2)))
      .groupBy(_._1).toSeq
      .map { case ((_, q), vs) => q -> vs.map(_._2).distinct.size }
    val expect = cells.groupBy(_._1).map { case (q, ls) =>
      val l = ls.map(_._2.toLong)
      q -> (l.size.toLong, l.min, l.count(_ < 3).toLong, l.count(_ < 5).toLong)
    }
    assert(rows === expect)
    rows.values.foreach { case (n, lMin, lt3, lt5) =>
      assert(lMin >= 1L && lt3 <= lt5 && lt5 <= n)
    }
  }

  test("t-closeness: exact TVD replay matches, policy counts integer-exact") {
    import spark.implicits._
    val rows = Relational.tCloseness(spark, sf).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.nonEmpty)
    // driver-side exact replay over the raw events
    val raw = Tables.events(spark, sf)
      .select(to_date($"ts").as("day"), (hour($"ts") / 6).cast("int").as("q"),
        $"event_type")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getString(2)))
    val g = raw.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val bigG = raw.size.toLong
    val cells = raw.groupBy(t => (t._1, t._2)).toSeq.map { case ((_, q), es) =>
      val c = es.groupBy(_._3).view.mapValues(_.size.toLong).toMap
      val ctot = es.size.toLong
      val d = g.map { case (tpe, gi) =>
        math.abs(c.getOrElse(tpe, 0L) * bigG - gi * ctot)
      }.sum
      (q, d, ctot)
    }
    val expect = cells.groupBy(_._1).map { case (q, cs) =>
      q -> (cs.size.toLong,
        cs.map { case (_, d, ctot) =>
          (d * 5000L / (ctot * bigG)).toDouble / 10000.0
        }.max,
        cs.count { case (_, d, ctot) => d * 5 > ctot * bigG * 2 }.toLong,
        cs.count { case (_, d, ctot) => d * 5 > ctot * bigG }.toLong)
    }
    assert(rows === expect)
    rows.values.foreach { case (n, t, gt02, gt01) =>
      assert(t >= 0.0 && t <= 1.0 && gt02 <= gt01 && gt01 <= n)
    }
  }

  test("incremental join: four delta branches partition the full join exactly") {
    import spark.implicits._
    val row = Relational.incrementalJoin(spark, sf).collect().head
    val (nb, no, ns, nboth, nt, rev) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getLong(4), row.getDouble(5))
    // every quadrant participates (staggered cutoffs) and the four
    // branches recombine to the full join, computed directly
    assert(nb > 0 && no > 0 && ns > 0 && nboth > 0)
    val full = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf),
        $"o_orderkey" === $"l_orderkey")
    assert(nt == nb + no + ns + nboth)
    assert(nt == full.count())
    val directRev = full
      .agg(sum($"l_extendedprice".cast("decimal(18,2)")).cast("double"))
      .head().getDouble(0)
    assert(rev == directRev, s"maintained revenue $rev != direct $directRev")
  }

  test("DP release: independent replay of cap, hash-noise, and Laplace transform") {
    import spark.implicits._
    val got = Relational.dpRelease(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getDouble(2)).toMap
    assert(got.nonEmpty)
    // independent md5 (java.security, not the Spark expression): the
    // noise stream and the whole release must replay driver-side
    def h32(key: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${Relational.DpSalt}:$key".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val raw = Tables.events(spark, sf)
      .select($"event_type", to_date($"ts").as("day"), $"user_id")
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val expect = raw.groupBy(t => (t._1, t._2)).map { case ((tpe, day), es) =>
      val capped = es.groupBy(_._3).values
        .map(v => math.min(v.size.toLong, Relational.DpCap.toLong)).sum
      val u = (h32(s"$tpe|$day") % 1048576L + 0.5) / 1048576.0
      val cen = u - 0.5
      val noise = -(Relational.DpCap / Relational.DpEpsilon) *
        math.signum(cen) * math.log(1.0 - 2.0 * math.abs(cen))
      (tpe, day) -> BigDecimal(capped.toDouble + noise)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got === expect)
    // the mechanism actually perturbs: no cell releases its exact
    // capped count (the hash-noise is never exactly zero)
    val cappedTrue = raw.groupBy(t => (t._1, t._2)).map { case (k, es) =>
      k -> es.groupBy(_._3).values
        .map(v => math.min(v.size.toLong, Relational.DpCap.toLong)).sum.toDouble
    }
    assert(got.forall { case (k, rel) => rel != cappedTrue(k) })
  }

  test("data skew report: stats replay from an independent key-frequency pass") {
    import spark.implicits._
    val rows = Relational.dataSkewReport(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    assert(rows.keySet == Set(("lineitem", "l_partkey"),
      ("lineitem", "l_suppkey"), ("events", "user_id")))
    // replay one branch driver-side
    val freq = Tables.lineitem(spark, sf)
      .groupBy($"l_suppkey").count().collect()
      .map(r => r.get(0).toString -> r.getLong(1))
    val (nr, nk, mx) = (freq.map(_._2).sum, freq.length.toLong, freq.map(_._2).max)
    val t8 = freq.sortBy { case (k, c) => (-c, k) }.take(8).map(_._2).sum
    val got = rows(("lineitem", "l_suppkey"))
    assert(got._1 == nr && got._2 == nk && got._3 == mx)
    assert(got._4 == (mx * nk * 10000L / nr).toDouble / 10000.0)
    assert(got._5 == (t8 * 10000L / nr).toDouble / 10000.0)
    // the deliberately skewed events.user_id reads as skewed
    assert(rows(("events", "user_id"))._4 >= 1.0)
  }

  test("market basket: counts bound pairs, lift replays, top-1 verified") {
    import spark.implicits._
    val rows = Relational.marketBasket(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty && rows.length <= 20)
    val op = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
    val nOrders = op.map(_._1).distinct.length.toLong
    val byPart = op.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (a, b, pc, ca, cb, lift) =>
      assert(a < b)
      assert(ca == byPart(a) && cb == byPart(b))
      assert(pc <= math.min(ca, cb), "a pair cannot outship its parts")
      assert(lift == pc.toDouble * nOrders / (ca * cb))
    }
    // the ranking is by pair count: replay the max co-occurrence
    val pairCnt = op.groupBy(_._1).values.flatMap { ps =>
      val parts = ps.map(_._2).sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).view.mapValues(_.size).toMap
    assert(rows.head._3 == pairCnt.values.max.toLong,
      "top row must carry the maximum pair count")
  }

  test("rfm segments: partition of customers, quartile fill exact, revenue conserved") {
    import spark.implicits._
    val rows = Relational.rfmSegments(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val cust = Tables.orders(spark, sf).groupBy($"o_custkey")
      .agg(sum($"o_totalprice".cast("decimal(18,2)")).cast("double")
        .as("m"))
      .as[(Long, Double)].collect()
    val n = cust.length.toLong
    assert(rows.map(_._4).sum == n, "every customer lands in one segment")
    rows.foreach { case (r, f, m, _, _) =>
      assert(Seq(r, f, m).forall(q => q >= 1 && q <= 4))
    }
    // the explicit bucket formula fills quartiles deterministically:
    // per dimension, bucket b holds |{rn : ((rn-1)*4) div n + 1 == b}|
    val expectPerBucket = (1L to n)
      .groupBy(rn => (rn - 1) * 4 / n + 1).view.mapValues(_.size.toLong).toMap
    Seq(rows.groupBy(_._1), rows.groupBy(_._2), rows.groupBy(_._3))
      .foreach { dim =>
        dim.foreach { case (b, rs) =>
          assert(rs.map(_._4).sum == expectPerBucket(b),
            s"bucket $b fill ${rs.map(_._4).sum} vs ${expectPerBucket(b)}")
        }
      }
    val totalRev = cust.map(_._2).sum
    assert(math.abs(rows.map(_._5).sum - totalRev) < 1e-6,
      "segment revenue must reconstruct the customer total")
  }

  test("CMS join-size estimate: overcount certificate and exact-at-fixture-density") {
    val r = Relational.cmsJoinSize(spark, sf).head()
    val (na, nb, exact, est, over) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    assert(na > 0 && nb > 0)
    // the CMS inner-product can only overcount (collision cross terms
    // are nonnegative products)
    assert(est >= exact && over == est - exact, s"est $est < exact $exact")
    // and it never exceeds the blind upper bound n_a * n_b
    assert(est <= na * nb)
    // second evaluation reproduces the sketch estimate bit-for-bit
    assert(Relational.cmsJoinSize(spark, sf).head().getLong(3) == est)
  }

  test("target encode: LOO arithmetic on a fixture, 1-row groups NULL, corpus audit sane") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // A: targets 10, 20, 40 -> LOO enc 30, 25, 15; B: single row -> NULL
    val o = Seq(("A", 10.0), ("A", 20.0), ("A", 40.0), ("B", 99.0))
      .toDF("segment", "t")
      .select($"segment", $"t".cast("decimal(18,2)").as("x"))
    val got = Relational.targetEncodeOf(o).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    assert(got == Seq(
      ("A", 3L, 23.3333, Some(15.0), Some(30.0)),
      ("B", 1L, 99.0, None, None)), s"got $got")
    // corpus: every segment's encodings bracket the group mean (LOO
    // encodings average back to the mean, so min <= mean <= max), and
    // no segment leaks its own row (enc != x identity is structural)
    val rows = Relational.targetEncode(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, mean) = (r.getLong(1), r.getDouble(2))
      if (n > 1) {
        val (lo, hi) = (r.getDouble(3), r.getDouble(4))
        assert(lo <= mean + 1e-4 && mean <= hi + 1e-4,
          s"mean $mean outside enc range [$lo,$hi]")
      }
    }
  }

  test("benford audit: expectations are the law, counts conserve, synthetic data flagged") {
    import spark.implicits._
    val rows = Relational.benfordAudit(spark, sf)
      .as[(String, Long, Double, Double, Double)].collect()
    // all nine digits reported, in order
    assert(rows.map(_._1).toSeq == (1 to 9).map(_.toString))
    // the embedded expectations ARE log10(1+1/d) at the 6-dp grid,
    // and they sum to 1 within grid error (log10 telescopes)
    rows.foreach { case (d, _, _, pb, _) =>
      val want = BigDecimal(math.log10(1.0 + 1.0 / d.toInt))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(pb == want, s"digit $d: $pb != $want") }
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-5)
    // counts conserve to the (all-positive) orders corpus
    val n = graft.sources.Tables.orders(spark, sf).count()
    assert(rows.map(_._2).sum == n)
    // dev replays as p_obs - p_benford exactly
    rows.foreach { case (_, _, po, pb, dev) => assert(dev == po - pb) }
    // the synthetic totals are band-limited, NOT Benford -- the
    // audit must flag them loudly (uniform-band data overweights a
    // few leading digits); genuine multi-magnitude data would sit
    // near zero here
    assert(rows.map(r => math.abs(r._5)).max > 0.02)
  }

  test("cohort ltv: hand-walked two-customer cohort, corpus curve monotone and consistent") {
    import spark.implicits._
    import java.sql.Timestamp
    val t = (s: String) => Timestamp.valueOf(s + " 00:00:00")
    // both customers first order 1995-01 (cohort size 2); c1 buys
    // again in Feb -> age-1 cum 350, ltv 175; c2 only Jan
    val orders = Seq(
      (1L, t("1995-01-10"), 100.0), (1L, t("1995-02-05"), 50.0),
      (2L, t("1995-01-20"), 200.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = Relational.cohortLtvOf(orders, maxAge = 6)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(("1995-01", 0L, 2L, 300.0, 150.0),
      ("1995-01", 1L, 2L, 350.0, 175.0)), s"got $got")
    // corpus: within each cohort the curve is non-decreasing in age,
    // ltv replays as floor-scaled cum/n, ages within horizon
    val corpus = Relational.cohortLtv(spark, sf)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(corpus.nonEmpty)
    corpus.groupBy(_._1).values.foreach { rows =>
      val byAge = rows.sortBy(_._2)
      byAge.sliding(2).foreach {
        case Array(p, q) => assert(q._4 >= p._4, s"cum dips in ${p._1}")
        case _ =>
      }
    }
    corpus.foreach { case (_, age, n, cum, ltv) =>
      assert(age >= 0 && age <= Relational.LtvMaxAge && n >= 1)
      val cents = BigDecimal(cum).setScale(2,
        BigDecimal.RoundingMode.HALF_UP) * 100
      assert(ltv == (cents.toLong * 100 / n).toDouble / 10000.0,
        s"ltv $ltv does not replay from $cum / $n")
    }
  }

  test("ab test: independent Welch replay on md5-recomputed arms, A/A null calibrated") {
    import spark.implicits._
    val row = Relational.abTest(spark, sf).collect().head
    val (na, nb, ma, mb, va, vb, t) = (row.getLong(0), row.getLong(1),
      row.getDouble(2), row.getDouble(3), row.getDouble(4),
      row.getDouble(5), row.getDouble(6))
    // independent arm assignment (java.security md5, not the Spark
    // expression) and a from-scratch Welch computation
    def arm(uid: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${Relational.AbSalt}:$uid".getBytes("UTF-8"))
      (java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
        % 2).toInt
    }
    val vals = Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"value").collect()
      .map(r => (arm(r.getLong(0)),
        BigDecimal(r.getDouble(1)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)))
    def stats(a: Int) = {
      val v = vals.filter(_._1 == a).map(_._2)
      val n = v.length.toLong
      val sx = v.sum; val sxx = v.map(x => x * x).sum
      (n, sx, sxx)
    }
    val (ena, sxa, sxxa) = stats(0); val (enb, sxb, sxxb) = stats(1)
    assert((na, nb) == (ena, enb))
    // floor-scaled display means replay exactly
    assert(ma == ((sxa * 100).toLong * 100 / ena).toDouble / 10000.0)
    assert(mb == ((sxb * 100).toLong * 100 / enb).toDouble / 10000.0)
    def welch(sxx: BigDecimal, sx: BigDecimal, n: Long): Double =
      (sxx.toDouble - sx.toDouble * sx.toDouble / n) / (n - 1)
    assert(math.abs(va - welch(sxxa, sxa, ena)) < 1e-9 * math.abs(va))
    assert(math.abs(vb - welch(sxxb, sxb, enb)) < 1e-9 * math.abs(vb))
    val tExp = (sxa.toDouble / ena - sxb.toDouble / enb) /
      math.sqrt(welch(sxxa, sxa, ena) / ena + welch(sxxb, sxb, enb) / enb)
    assert(math.abs(t - tExp) < 1e-9, s"t $t vs replay $tExp")
    // hash split of an unmanipulated metric is an A/A test: the
    // statistic must sit in the null's bulk
    assert(math.abs(t) < 4.0, s"A/A t-statistic implausibly large: $t")
  }

  test("conversion lag: fixture lags exact, corpus histogram conserves converters") {
    import spark.implicits._
    import java.sql.Timestamp
    val t = (s: String) => Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00"), "signup"),
      (1L, t("2024-01-04 09:00:00"), "purchase"),   // lag 3 days
      (1L, t("2024-01-06 09:00:00"), "purchase"),   // not first -> ignored
      (2L, t("2024-01-02 08:00:00"), "signup"),
      (2L, t("2024-01-02 08:00:00"), "purchase"),   // same instant -> lag 0
      (3L, t("2024-01-03 08:00:00"), "purchase"),   // before signup only
      (3L, t("2024-01-05 08:00:00"), "signup"))
      .toDF("user_id", "ts", "event_type")
    val got = Relational.conversionLagOf(ev)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L), (3L, 1L)), s"got $got")
    // corpus: histogram mass == independently counted converters
    val events = Tables.events(spark, sf)
    val s0 = events.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("t0"))
    val conv = events.filter($"event_type" === "purchase")
      .join(s0, "user_id").filter($"ts" >= $"t0")
      .select($"user_id").distinct().count()
    val hist = Relational.conversionLag(spark, sf).as[(Long, Long)].collect()
    assert(hist.map(_._2).sum == conv)
    assert(hist.forall(_._1 >= 0))
  }

  test("entity clusters: census equals the decade+incoming structure, derived independently") {
    import spark.implicits._
    val n = Tables.customer(spark, sf).count()
    assert(n % 10 == 0, s"spec assumes whole decades, got $n customers")
    // every decade of the registry plus its incoming (X-corrupted)
    // records is one cluster; an incoming record blocks to its whole
    // decade, registry records never merge directly
    val expect = (0L until n / 10).map { d =>
      10 + (10 * d to 10 * d + 9).count(_ % 7 == 0)
    }.groupBy(identity).map { case (size, ds) => (size.toLong, ds.size.toLong) }
    val got = Relational.entityClusters(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(got == expect, s"got $got want $expect")
  }

  test("pareto abc: classes partition parts, boundaries respected, shares conserve") {
    import spark.implicits._
    val rows = Relational.paretoAbc(spark, sf)
      .as[(String, Long, Double, Double)].collect()
    assert(rows.map(_._1).toSeq == Seq("A", "B", "C"))
    val byClass = rows.map(r => r._1 -> r).toMap
    // partition of the part dimension
    val nParts = Tables.lineitem(spark, sf)
      .select($"l_partkey").distinct().count()
    assert(rows.map(_._2).sum == nParts)
    // revenue conserves to the corpus total (cents-exact both sides)
    val total = Tables.lineitem(spark, sf)
      .agg(sum($"l_extendedprice".cast("decimal(18,2)")).cast("double"))
      .head().getDouble(0)
    assert(math.abs(rows.map(_._3).sum - total) < 1e-4)
    // boundary semantics: A stops at 80%, A+B at 95%, floor grid
    assert(byClass("A")._4 <= 0.80)
    assert(byClass("A")._4 + byClass("B")._4 <= 0.95)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 3e-6)
  }

  test("duplicate payments: window and key semantics hand-walked") {
    import spark.implicits._
    // k1/k2: same customer+amount 2 days apart -> flagged;
    // k3: same pair 5 days later -> outside the window;
    // k4: same amount, different customer -> never a candidate
    val tiny = Seq(
      (1L, 7L, java.sql.Date.valueOf("2024-01-01"), BigDecimal(100), "1-URGENT"),
      (2L, 7L, java.sql.Date.valueOf("2024-01-03"), BigDecimal(100), "1-URGENT"),
      (3L, 7L, java.sql.Date.valueOf("2024-01-08"), BigDecimal(100), "1-URGENT"),
      (4L, 8L, java.sql.Date.valueOf("2024-01-02"), BigDecimal(100), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
        "o_orderpriority")
    val dir = java.nio.file.Files.createTempDirectory("duppay").toString
    tiny.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Relational.duplicatePayments(spark, dir)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("1-URGENT", 1L, 1L, 100.0),
      ("__all__", 1L, 1L, 100.0)), s"got $got")
    // corpus: the __all__ row reconciles with the per-priority rows
    val rows = Relational.duplicatePayments(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    val (allR, prioR) = rows.partition(_._1 == "__all__")
    assert(allR.length == 1)
    assert(allR.head._2 == prioR.map(_._2).sum)
    assert(allR.head._3 <= prioR.map(_._3).sum) // a customer can span priorities
  }

  test("fd audit: key-determined pairs hold, fan-out pairs counted exactly") {
    import spark.implicits._
    // hand fixture: a->b holds; a->c violated by exactly one group
    val df = Seq((1L, 10L, "x"), (1L, 10L, "y"), (2L, 20L, "z"))
      .toDF("a", "b", "c")
    val hold = Relational.fdAuditOf("t: a->b", df, "a", "b")
      .as[(String, Long, Long, Boolean, Double)].head()
    assert(hold == (("t: a->b", 2L, 0L, true, 0.0)), s"got $hold")
    val viol = Relational.fdAuditOf("t: a->c", df, "a", "c")
      .as[(String, Long, Long, Boolean, Double)].head()
    assert(viol == (("t: a->c", 2L, 1L, false, 0.5)), s"got $viol")
    // corpus: the two key-determined pairs MUST hold; the fan-out
    // candidates must not (an order has many parts, etc.)
    val rows = Relational.fdAudit(spark, sf)
      .as[(String, Long, Long, Boolean, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows("customer: custkey->nationkey")._4)
    assert(rows("nation: nationkey->regionkey")._4)
    assert(!rows("lineitem: orderkey->partkey")._4)
    rows.values.foreach(r => assert(r._5 >= 0.0 && r._5 <= 1.0))
  }

  test("survival hazard: censoring hand-walked, life-table identities hold") {
    import spark.implicits._
    // c1 spans Jan..Mar (age 2, last month == edge -> CENSORED),
    // c2 only Jan (age 0, churned), c3 only Mar (age 0, censored)
    val tiny = Seq(
      (1L, java.sql.Date.valueOf("2024-01-05"), BigDecimal(10)),
      (1L, java.sql.Date.valueOf("2024-03-09"), BigDecimal(10)),
      (2L, java.sql.Date.valueOf("2024-01-20"), BigDecimal(10)),
      (3L, java.sql.Date.valueOf("2024-03-01"), BigDecimal(10)))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("surv").toString
    tiny.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Relational.survivalHazard(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((0L, 3L, 1L, 1L, 0.333333), (2L, 1L, 0L, 1L, 0.0)),
      s"got $got")
    // corpus life-table identities: exits partition the customers,
    // at-risk monotone non-increasing from n, hazards are rates
    val rows = Relational.survivalHazard(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect()
    val nCust = Tables.orders(spark, sf)
      .select($"o_custkey").distinct().count()
    assert(rows.map(r => r._3 + r._4).sum == nCust)
    // every customer's lifetime is >= the minimum observed exit age,
    // so the first life-table row puts the whole population at risk
    assert(rows.head._2 == nCust)
    rows.sliding(2).foreach {
      case Array(x, y) =>
        assert(x._2 > y._2, s"at-risk not decreasing: $x -> $y")
      case _ => ()
    }
    rows.foreach(r => assert(r._5 >= 0.0 && r._5 <= 1.0))
  }

  test("chi square: corpus grid complete, statistic and V bounded") {
    import spark.implicits._
    val (n, cells, dof, chi2, v) = Relational.chiSquare(spark, sf)
      .as[(Long, Long, Long, Double, Double)].head()
    // the grid is the FULL cross product (zero cells included)
    val li = Tables.orders(spark, sf)
    val r = li.select($"o_orderpriority").distinct().count()
    val c = li.select($"o_orderstatus").distinct().count()
    assert(cells == r * c, s"grid $cells != $r x $c")
    assert(n == li.count() && dof == (r - 1) * (c - 1))
    // chi2 >= 0 by construction; V in [0, 1] (floor grid can only
    // shave it down, never push it over)
    assert(chi2 >= 0.0, s"chi2 $chi2")
    assert(!v.isNaN && v >= 0.0 && v <= 1.0, s"V $v")
    // independence bound: chi2 <= n * min(r-1, c-1) exactly when V <= 1
    assert(chi2 <= n.toDouble * math.min(r - 1, c - 1))
  }

  test("referential integrity: dirty fixture counted, corpus is clean") {
    import spark.implicits._
    // child keys: 1 ok, 2 ok, 99 orphan, NULL — one of each class
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk_key")
    val parent = Seq(1L, 2L, 3L).toDF("pk_key")
    val row = Relational.fkAuditOf("t.fk", child, "fk_key", parent, "pk_key")
      .as[(String, Long, Long, Long)].head()
    assert(row == (("t.fk", 4L, 1L, 1L)), s"got $row")
    // the synthetic star schema is referentially clean: 7 rows, all
    // zero orphans/nulls, child row counts reconcile with the tables
    val rows = Relational.referentialIntegrity(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length == 7)
    rows.foreach { case (fk, n, nNull, nOrphan) =>
      assert(n > 0, s"$fk empty")
      assert(nNull == 0L && nOrphan == 0L, s"$fk dirty: $nNull/$nOrphan")
    }
    val liRows = Tables.lineitem(spark, sf).count()
    assert(rows.filter(_._1.startsWith("lineitem.")).forall(_._2 == liRows))
  }

  test("gini: corpus coefficient bounded and shares ordered sanely") {
    import spark.implicits._
    val (n, total, gini, bottom50, top10) = Relational.giniRevenue(spark, sf)
      .as[(Long, Double, Double, Double, Double)].head()
    val nCust = Tables.orders(spark, sf)
      .select($"o_custkey").distinct().count()
    assert(n == nCust)
    // revenue conserves (cents-exact on both sides of the check)
    val t = Tables.orders(spark, sf)
      .agg(sum($"o_totalprice".cast("decimal(18,2)")).cast("double"))
      .head().getDouble(0)
    assert(math.abs(total - t) < 1e-4)
    // a valid Lorenz geometry: G in [0,1), bottom half carries less
    // than half, the top decile at least its proportional tenth
    assert(gini >= 0.0 && gini < 1.0, s"gini $gini")
    assert(bottom50 < 0.5 && bottom50 > 0.0)
    assert(top10 >= 0.1 - 1e-9 && top10 < 1.0)
    // rank-form identity on a hand-walked frame: x = (1,1,2) ->
    // n=3, T=4, S = 1*1 + 2*1 + 3*2 = 9, G = (18 - 16)/12 = 1/6
    val tiny = Seq((1L, BigDecimal("0.01")), (2L, BigDecimal("0.01")),
      (3L, BigDecimal("0.02"))).toDF("o_custkey", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("gini").toString
    tiny.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val g = Relational.giniRevenue(spark, dir)
      .as[(Long, Double, Double, Double, Double)].head()
    assert(g._1 == 3L && g._3 == 2.0 / 12.0, s"got $g")
    // bottom50 = lowest 1 of 3 ranks = 1 cent of 4; top10 cut n//10=0
    assert(g._4 == 0.25 && g._5 == 0.0)
  }

  test("benford audit: zero-occurrence digits surface with n_obs=0 and dev=-p_benford") {
    import spark.implicits._
    // totals starting only with 1 and 9 — digits 2..8 are the
    // strongest possible Benford deviations and must appear in the
    // census, not vanish (round-10 advice)
    val orders = Seq(100.0, 150.0, 900.0).toDF("o_totalprice")
    val rows = Relational.benfordAuditOf(orders)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(rows.map(_._1).toSeq == (1 to 9).map(_.toString))
    val byD = rows.map(r => r._1 -> r).toMap
    assert(byD("1")._2 == 2L && byD("9")._2 == 1L)
    (2 to 8).foreach { d =>
      val (_, n, po, pb, dev) = byD(d.toString)
      assert(n == 0L && po == 0.0 && dev == -pb, s"digit $d")
    }
    // degenerate: every row filtered → spine intact, all-zero census
    val empty = Relational.benfordAuditOf(Seq(-5.0).toDF("o_totalprice"))
      .as[(String, Long, Double, Double, Double)].collect()
    assert(empty.length == 9 && empty.forall(r => r._2 == 0L && r._3 == 0.0))
  }

  test("dp release: production path draws real noise, never the public hash stream") {
    import org.apache.spark.sql.Row
    val events = Tables.events(spark, sf)
    def m(rows: Array[Row]) = rows
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getDouble(2))
      .toMap
    val replay = m(Relational.dpReleaseOf(events).collect())
    val s1 = m(Relational.dpReleaseRandom(events, Some(1L)).collect())
    val s1b = m(Relational.dpReleaseRandom(events, Some(1L)).collect())
    val s2 = m(Relational.dpReleaseRandom(events, Some(2L)).collect())
    // same release cells; caller-seeded reproducibility; the seed
    // actually matters
    assert(s1.keySet == replay.keySet && s1 == s1b && s1 != s2)
    // and the production noise is NOT the hash stream — the advice's
    // attack was recomputing md5(key) and subtracting the noise off
    assert(s1 != replay && s2 != replay)
  }
}
