package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Cross-validation of independent near-dup pipelines at 10x the
  * other specs' scale (sf0.1, 5000 docs): MinHash-LSH (probabilistic
  * candidates, Jaccard >= 0.8 verify) and inverted-index n-gram
  * Jaccard (exhaustive candidates via shared shingles) must find the
  * SAME pair set at the same threshold — two disjoint code paths
  * agreeing is the scale-up recall check brute force can't give us
  * (12.5M pairs). */
class CrossScaleSpec extends AnyFunSuite with SparkSpec {
  test("MinHash-LSH pairs == exhaustive n-gram pairs at sf0.1, threshold 0.8") {
    val dir = "/root/testdata/sf0.1"
    val lsh = Dedup.minHashNearDups(spark, dir, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ngram = Dedup.ngramJaccardPairs(spark, dir, threshold = 0.8, dfCap = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == ngram, s"missed=${ngram.diff(lsh).size} extra=${lsh.diff(ngram).size}")
    assert(lsh.nonEmpty)
  }

  test("dedup chain scale curve: candidates and wall time grow near-linearly") {
    import org.apache.spark.sql.functions._
    // Empirical backing for the "bucket-bounded, not O(n²)" claim:
    // run the minhash→cluster→apply chain at three corpus sizes
    // spanning 100× and pin (a) LSH candidate pairs per document
    // stays bounded, (b) chain wall time grows far slower than
    // quadratic across each 10× data step. The measured curve is
    // committed to PLANS.md ("Dedup scale curve").
    case class Pt(dir: String, n: Long, cands: Long, secs: Double)
    def chainSecs(dir: String): Double = {
      val t0 = System.nanoTime()
      Dedup.minHashNearDups(spark, dir).count()
      Dedup.nearDupClusters(spark, dir).count()
      Dedup.dedupApply(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val pts = Seq("sf0.001", "sf0.01", "sf0.1").map { s =>
      val dir = s"/root/testdata/$s"
      val docs = graft.sources.Tables.documents(spark, dir)
      val n = docs.count()
      val buckets = Dedup.bandedBuckets(
        Dedup.minHashSignatures(Dedup.shingleSetsOf(docs)))
      val cands = buckets.as("ba")
        .join(buckets.as("bb"),
          col("ba.band") === col("bb.band") &&
            col("ba.bsig") === col("bb.bsig") &&
            col("ba.doc_id") < col("bb.doc_id"))
        .select(col("ba.doc_id"), col("bb.doc_id")).distinct().count()
      val secs = chainSecs(dir)
      info(f"$s%-8s n=$n%6d candidates=$cands%7d chain=${secs}%.2fs")
      Pt(dir, n, cands, secs)
    }
    pts.sliding(2).foreach { case Seq(lo, hi) =>
      val nRatio = hi.n.toDouble / lo.n
      // candidate growth ≤ 3× linear in the corpus step (quadratic
      // would be ~nRatio² = 100×)
      assert(hi.cands <= 3.0 * nRatio * math.max(lo.cands, 1),
        s"${hi.dir}: candidates ${hi.cands} vs ${lo.cands} at ${lo.dir} " +
          s"grew super-linearly for a ${nRatio}× corpus step")
      // wall time: 6×-linear guard. Wall time is the one
      // load-sensitive number here — the full suite runs ~20 Spark
      // suites concurrently, and a transient load spike on ONE
      // measurement trips any fixed ratio. If the first pass fails
      // the guard, re-measure BOTH points back-to-back (warm, equal
      // load) and judge the better pair: a genuine O(n²) chain
      // (~100× per step) fails every pass, a load artifact doesn't.
      def ok(loS: Double, hiS: Double) =
        hiS <= 6.0 * nRatio * math.max(loS, 0.5)
      val passed = ok(lo.secs, hi.secs) || {
        val (lo2, hi2) = (chainSecs(lo.dir), chainSecs(hi.dir))
        info(f"retry ${lo.dir}=${lo2}%.2fs ${hi.dir}=${hi2}%.2fs")
        ok(math.min(lo.secs, lo2), math.min(hi.secs, hi2))
      }
      assert(passed, s"${hi.dir}: chain ${hi.secs}s vs ${lo.secs}s at ${lo.dir}")
    }
  }

  test("pipeline scale curve: survivor rates stable, wall time near-linear") {
    // the composed chain must inherit its stages' near-linearity: a
    // 10× corpus step may not blow up the end-to-end build, and the
    // survivorship RATES (not counts) should be scale-stable because
    // the synthetic corpus is drawn from one distribution
    case class Pt(dir: String, n: Long, surv: Long, secs: Double)
    def run(dir: String): Pt = {
      val docs = graft.sources.Tables.documents(spark, dir)
      val t0 = System.nanoTime()
      val st = graft.operators.Pipeline.stagesOf(docs)
      val (n, surv) = (st.d0.count(), st.s4.count())
      Pt(dir, n, surv, (System.nanoTime() - t0) / 1e9)
    }
    val pts = Seq("sf0.01", "sf0.1").map { s =>
      val p = run(s"/root/testdata/$s")
      info(f"${p.dir}%-22s n=${p.n}%6d survivors=${p.surv}%6d build=${p.secs}%.2fs")
      p
    }
    pts.foreach { p =>
      val rate = p.surv.toDouble / p.n
      assert(rate > 0.4 && rate < 1.0, s"${p.dir}: survivor rate $rate")
    }
    val Seq(lo, hi) = pts
    val nRatio = hi.n.toDouble / lo.n
    // same 6×-linear guard + re-measure discipline as the dedup curve
    def ok(loS: Double, hiS: Double) = hiS <= 6.0 * nRatio * math.max(loS, 0.5)
    val passed = ok(lo.secs, hi.secs) || {
      // caches are keyed per input, so a re-run measures warm plans —
      // still a valid super-linearity probe (O(n²) stays 100×)
      val (lo2, hi2) = (run(lo.dir).secs, run(hi.dir).secs)
      info(f"retry ${lo.dir}=${lo2}%.2fs ${hi.dir}=${hi2}%.2fs")
      ok(math.min(lo.secs, lo2), math.min(hi.secs, hi2))
    }
    assert(passed, s"pipeline build ${hi.secs}s at ${hi.dir} vs ${lo.secs}s at ${lo.dir}")
  }

  test("graph scale curve: hub bound holds, wedges and wall time near-linear") {
    import org.apache.spark.sql.functions._
    // Empirical backing for the degree-orientation claims at two
    // corpus sizes spanning 10×: (a) the oriented out-degree never
    // exceeds √(2·|E|) (the hub bound that keeps the wedge self-join
    // from exploding), (b) the wedge count Σ C(outdeg, 2) grows
    // near-linearly with the edge count, (c) triangle-count and
    // 5-iteration PageRank wall time grow far slower than the
    // quadratic a naive all-pairs design would show. The measured
    // curve is committed to PLANS.md ("Graph scale curve").
    case class Pt(dir: String, edges: Long, wedges: Long,
                  triSecs: Double, prSecs: Double)
    def secs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def times(dir: String): (Double, Double) =
      (secs(graft.operators.Graph.triangleCount(spark, dir).count()),
        secs(graft.operators.Graph.pagerankActors(spark, dir).count()))
    val pts = Seq("sf0.01", "sf0.1").map { s =>
      val dir = s"/root/testdata/$s"
      // the spec's OWN oriented graph (independent of the operator):
      // distinct co-actor edges, degree-oriented low→high
      val sel = graft.sources.Tables.movies(spark, dir)
        .select(col("id"), explode(col("actors")).as("a"))
      val edges = sel.as("x").join(sel.as("y"), Seq("id"))
        .filter(col("x.a") =!= col("y.a"))
        .select(col("x.a").cast("long").as("src"),
          col("y.a").cast("long").as("dst"))
        .distinct()
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .select(col("src").as("v"), col("deg"))
      val oriented = edges
        .join(deg.select(col("v").as("src"), col("deg").as("ds")), "src")
        .join(deg.select(col("v").as("dst"), col("deg").as("dd")), "dst")
        .filter(col("ds") < col("dd") ||
          (col("ds") === col("dd") && col("src") < col("dst")))
        .select(col("src"), col("dst"))
      val od = oriented.groupBy(col("src")).agg(count(lit(1)).as("od")).cache()
      val nE = oriented.count()
      val (wedges, maxOd) = od
        .agg(sum(expr("od * (od - 1) DIV 2")), max(col("od")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).head
      od.unpersist()
      // the orientation theorem, measured: max out-degree ≤ √(2|E|)
      assert(maxOd <= math.sqrt(2.0 * nE) + 1,
        s"$s: hub out-degree $maxOd breaks the √(2·$nE) bound")
      val (triS, prS) = times(dir)
      info(f"$s%-8s edges=$nE%7d wedges=$wedges%8d maxOutDeg=$maxOd%4d " +
        f"triangle=${triS}%.2fs pagerank=${prS}%.2fs")
      Pt(dir, nE, wedges, triS, prS)
    }
    val Seq(lo, hi) = pts
    val eRatio = hi.edges.toDouble / lo.edges
    // wedge growth ≤ 3× linear in the edge step (a skew blow-up in
    // the self-join would show quadratically here)
    assert(hi.wedges <= 3.0 * eRatio * math.max(lo.wedges, 1),
      s"wedges ${hi.wedges} vs ${lo.wedges} grew super-linearly " +
        s"for a ${eRatio}× edge step")
    // wall time: 6×-linear guard with the dedup curve's retry
    // discipline (suite-concurrency spikes, not code, fail one pass)
    def ok(loS: Double, hiS: Double, loT: Double, hiT: Double) =
      hiS <= 6.0 * eRatio * math.max(loS, 0.5) &&
        hiT <= 6.0 * eRatio * math.max(loT, 0.5)
    val passed = ok(lo.triSecs, hi.triSecs, lo.prSecs, hi.prSecs) || {
      val (lo2t, lo2p) = times(lo.dir)
      val (hi2t, hi2p) = times(hi.dir)
      info(f"retry ${lo.dir} tri=${lo2t}%.2fs pr=${lo2p}%.2fs " +
        f"${hi.dir} tri=${hi2t}%.2fs pr=${hi2p}%.2fs")
      ok(math.min(lo.triSecs, lo2t), math.min(hi.triSecs, hi2t),
        math.min(lo.prSecs, lo2p), math.min(hi.prSecs, hi2p))
    }
    assert(passed, s"graph chain wall time grew super-linearly: $pts")
  }

  test("khop scale curve: hop work tracks the frontier, wall time near-linear") {
    // BFS cost is Σ per-hop frontier joins; on a 10× corpus the total
    // reached-node count grows at most with the graph, never
    // quadratically, and wall time tracks the edge step with the
    // suite's retry discipline.
    def run(dir: String): (Long, Double) = {
      val t0 = System.nanoTime()
      val reached = graft.operators.Graph.khopActors(spark, dir)
        .collect().map(_.getLong(1)).sum
      (reached, (System.nanoTime() - t0) / 1e9)
    }
    val (rLo, tLo) = run("/root/testdata/sf0.01")
    val (rHi, tHi) = run("/root/testdata/sf0.1")
    info(f"sf0.01 reached=$rLo in $tLo%.2fs; sf0.1 reached=$rHi in $tHi%.2fs")
    assert(rLo >= 1 && rHi >= 1)
    // nodes scale ~10×; reached can't exceed the node count, so a 30×
    // guard catches any combinatorial blow-up in frontier handling
    assert(rHi <= 30L * rLo, s"reached $rHi vs $rLo grew super-linearly")
    val passed = tHi <= 6.0 * 10 * math.max(tLo, 0.5) || {
      val (_, tLo2) = run("/root/testdata/sf0.01")
      val (_, tHi2) = run("/root/testdata/sf0.1")
      info(f"retry: sf0.01 $tLo2%.2fs sf0.1 $tHi2%.2fs")
      math.min(tHi, tHi2) <= 6.0 * 10 * math.max(math.min(tLo, tLo2), 0.5)
    }
    assert(passed, s"khop wall time grew super-linearly: $tLo -> $tHi")
  }

  test("semDedup pairs ⊆ exact cosine pairs at sf0.1, with bounded recall") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    val thr = 0.4
    val sem = graft.operators.Clustering.semDedup(spark, dir, thr)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // brute force all ~2M id pairs once at test scale (2k vectors) —
    // the ground truth the cluster-scoped candidates are judged by
    val e = graft.operators.Similarity.normalizeOf(
      graft.sources.Tables.embeddings(spark, dir)).cache()
    val cos = graft.functions.VectorExpressions
      .dot_product(col("a.v"), col("b.v"))
    val exact = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .filter(round(cos, 6) >= thr)
      .select(col("a.vec_id"), col("b.vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    e.unpersist()
    // precision 1.0: every emitted pair is a true near-dup (cosine is
    // verified exactly, candidates only bound WHICH pairs are seen)
    assert(sem.subsetOf(exact), s"false positives: ${sem.diff(exact).take(3)}")
    // recall is the cluster-scoping trade (cross-cell pairs unseen);
    // with k=8 cells over 10 latent labels it must stay material
    val recall = sem.size.toDouble / exact.size
    assert(recall >= 0.25, s"semdedup recall $recall at sf0.1")
  }

  test("classifier scale curve: train time near-linear, weights reused in-session") {
    // The GD trainer's 100-TB posture claim is "12 sequential 1-row
    // aggregates over one cached wide frame, driver holds 19 doubles"
    // — measured here across a 10× corpus step, with the same 6×-
    // linear wall-time guard + retry discipline as the other curves.
    import graft.operators.CorpusQuality
    def train(dir: String): (Array[Double], Double) = {
      val docs = graft.sources.Tables.documents(spark, dir)
      val t0 = System.nanoTime()
      val w = CorpusQuality.trainedWeights(docs)
      (w, (System.nanoTime() - t0) / 1e9)
    }
    val (wLo, tLo) = train("/root/testdata/sf0.01")
    val (wHi, tHi) = train("/root/testdata/sf0.1")
    info(f"sf0.01 train=${tLo}%.2fs sf0.1 train=${tHi}%.2fs")
    // trained model is non-degenerate at both scales: some signal
    // dimension moved away from 0 and the two corpora (same
    // distribution) broadly agree on the bias sign
    assert(wLo.exists(math.abs(_) > 1e-4) && wHi.exists(math.abs(_) > 1e-4))
    assert(wLo.length == wHi.length)
    // in-session reuse: the memo returns without re-running the loop
    // (same array instance — curationPipeline's second use is free)
    val docsLo = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    assert(CorpusQuality.trainedWeights(docsLo) eq wLo,
      "trainedWeights re-trained for a corpus already trained this session")
    // wall time: ≤6×-linear for the 10× step (job-latency dominates
    // at these sizes, so real super-linearity shows up hard)
    val passed = tHi <= 6.0 * 10 * math.max(tLo, 0.5)
    assert(passed, s"classifier train time grew super-linearly: $tLo -> $tHi")
  }

  test("split-leakage scale: pairs obey the df-cap's structural bound at 10x") {
    import graft.functions.TextAnalysis._
    import org.apache.spark.sql.functions._
    // The leakage audit's quadratic risk is the posting-list
    // self-join; the df cap's guarantee is STRUCTURAL — each surviving
    // shingle contributes at most C(dfCap, 2) pairs, so total pairs ≤
    // cappedGrams × 120, however the corpus grows. (A raw linearity
    // curve is the wrong check on THIS corpus: its deliberately tiny
    // vocabulary crosses the df≥2 saturation knee between sf0.01 and
    // sf0.1, so capped-gram COUNT itself grows super-linearly while
    // the per-gram bound — the thing the cap promises — still holds.)
    val capPairs = 16 * 15 / 2 // C(dfCap=16, 2)
    Seq("sf0.01", "sf0.1").foreach { s =>
      val dir = s"/root/testdata/$s"
      val docs = graft.sources.Tables.documents(spark, dir)
      val n = docs.count()
      val cappedGrams = docs
        .select(explode(array_distinct(shingles(tokens(col("text")), 3))).as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= 16).count()
      val pairs = graft.operators.CorpusQuality.splitLeakage(spark, dir)
        .agg(coalesce(sum(col("n_pairs")), lit(0L))).collect().head.getLong(0)
      info(f"$s%-7s n=$n%6d cappedGrams=$cappedGrams%7d pairs=$pairs%7d " +
        f"(bound ${cappedGrams * capPairs}%9d, all-pairs ${n * (n - 1) / 2}%10d)")
      assert(pairs <= cappedGrams.toDouble * capPairs,
        s"$s: $pairs pairs exceed the structural bound — the cap is not applied")
      assert(pairs <= 0.01 * n * (n - 1) / 2.0,
        s"$s: $pairs pairs is within 1% of all-pairs — effectively quadratic")
    }
  }

  test("round-9 suite scale curve: galaxy join, chunker, PCA near-linear") {
    // wall-time curves for the round-9 heavyweights across the 10×
    // corpus step, same 6×-linear guard + retry discipline as the
    // other curves (suite concurrency spikes fail one pass, O(n²)
    // fails every pass)
    def secs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(dir: String): (Double, Double, Double) = (
      secs(graft.operators.Relational.marketShare(spark, dir).count()),
      secs(graft.operators.CorpusQuality.rollingHashChunks(spark, dir).count()),
      secs(graft.operators.Similarity.embedPca(spark, dir).count()))
    val lo = run("/root/testdata/sf0.01")
    val hi = run("/root/testdata/sf0.1")
    info(f"sf0.01 q8=${lo._1}%.2fs chunks=${lo._2}%.2fs pca=${lo._3}%.2fs; " +
      f"sf0.1 q8=${hi._1}%.2fs chunks=${hi._2}%.2fs pca=${hi._3}%.2fs")
    def ok(l: (Double, Double, Double), h: (Double, Double, Double)) =
      h._1 <= 6.0 * 10 * math.max(l._1, 0.5) &&
        h._2 <= 6.0 * 10 * math.max(l._2, 0.5) &&
        h._3 <= 6.0 * 10 * math.max(l._3, 0.5)
    val passed = ok(lo, hi) || {
      val (lo2, hi2) = (run("/root/testdata/sf0.01"), run("/root/testdata/sf0.1"))
      info(f"retry sf0.01=${lo2}%s sf0.1=${hi2}%s")
      ok((math.min(lo._1, lo2._1), math.min(lo._2, lo2._2), math.min(lo._3, lo2._3)),
        (math.min(hi._1, hi2._1), math.min(hi._2, hi2._2), math.min(hi._3, hi2._3)))
    }
    assert(passed, s"round-9 op grew super-linearly: lo=$lo hi=$hi")
  }

  test("round-10 scale curve: basket pairs and chunk counts linear, spectrum and batch probes near-linear") {
    import org.apache.spark.sql.functions._
    // STRUCTURAL counts first (load-insensitive): the market-basket
    // pair generator is bounded by Σ C(parts-per-order, 2) — per-order
    // bounded, so corpus-linear — and the content-defined chunker
    // emits chunks in proportion to corpus bytes. 3×-linear guard,
    // the candidate-count discipline of the dedup curve.
    def structCounts(dir: String): (Long, Long, Long) = {
      import spark.implicits._
      val li = graft.sources.Tables.lineitem(spark, dir)
        .select($"l_orderkey", $"l_partkey").distinct()
      val pairs = li.as("a").join(li.as("b"), Seq("l_orderkey"))
        .filter($"a.l_partkey" < $"b.l_partkey").count()
      // TOTAL emitted chunks (the per-source report is bounded rows;
      // its n_chunks column carries the real volume)
      val chunks = graft.operators.CorpusQuality.rollingHashChunks(spark, dir)
        .agg(sum($"n_chunks")).head().getLong(0)
      val rows = li.count()
      (rows, pairs, chunks)
    }
    val (nLo, pairsLo, chunksLo) = structCounts("/root/testdata/sf0.01")
    val (nHi, pairsHi, chunksHi) = structCounts("/root/testdata/sf0.1")
    val step = nHi.toDouble / nLo
    info(f"basket pairs $pairsLo -> $pairsHi, chunks $chunksLo -> $chunksHi over a $step%.1f× step")
    assert(pairsHi <= 3.0 * step * math.max(pairsLo, 1),
      s"basket pair generator grew super-linearly: $pairsLo -> $pairsHi")
    assert(chunksHi <= 3.0 * step * math.max(chunksLo, 1),
      s"chunk count grew super-linearly: $chunksLo -> $chunksHi")
    // wall-time curves for the round-10 heavyweights: block-iteration
    // spectrum and the batched multi-probe title query; same 6×-linear
    // guard + retry discipline as the other curves
    def secs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(dir: String): (Double, Double) = (
      secs(graft.operators.Similarity.embedSpectrum(spark, dir).count()),
      secs(graft.operators.ReferenceQueries.titleLevelsBatch(spark, dir,
        graft.operators.ReferenceQueries.DefaultBatchTitles).count()))
    val lo = run("/root/testdata/sf0.01")
    val hi = run("/root/testdata/sf0.1")
    info(f"sf0.01 spectrum=${lo._1}%.2fs batch=${lo._2}%.2fs; " +
      f"sf0.1 spectrum=${hi._1}%.2fs batch=${hi._2}%.2fs")
    def ok(l: (Double, Double), h: (Double, Double)) =
      h._1 <= 6.0 * 10 * math.max(l._1, 0.5) &&
        h._2 <= 6.0 * 10 * math.max(l._2, 0.5)
    val passed = ok(lo, hi) || {
      val (lo2, hi2) = (run("/root/testdata/sf0.01"), run("/root/testdata/sf0.1"))
      info(f"retry sf0.01=${lo2}%s sf0.1=${hi2}%s")
      ok((math.min(lo._1, lo2._1), math.min(lo._2, lo2._2)),
        (math.min(hi._1, hi2._1), math.min(hi._2, hi2._2)))
    }
    assert(passed, s"round-10 op grew super-linearly: lo=$lo hi=$hi")
  }

  test("KMV sketch scale invariants: fixed state and error band hold at 10x-100x") {
    import org.apache.spark.sql.functions._
    // the sketch's 100-TB contract is that GROWTH ONLY SHARPENS it:
    // state stays ≤ k longs per group however the corpus grows, and
    // the estimator error stays inside the ~3/√k band once sketches
    // are at capacity. Checked at 10× and 100× the unit-spec fixture.
    Seq("sf0.01", "sf0.1").foreach { dir0 =>
      val dir = s"/root/testdata/$dir0"
      import spark.implicits._
      val rows = graft.operators.TextAnalytics.approxDistinctKmv(spark, dir)
        .as[(String, Long, Option[Long], Long)].collect()
      assert(rows.nonEmpty && rows.forall(_._2 <= 256L),
        s"$dir0: sketch state exceeded k")
      val exact = graft.sources.Tables.documents(spark, dir)
        .select($"lang", explode(graft.functions.TextAnalysis.shingles(
          graft.functions.TextAnalysis.tokens($"text"), 3)).as("sh"))
        .select($"lang", graft.functions.Hashing.md5i32($"sh", 0).as("h"))
        .groupBy($"lang").agg(count_distinct($"h").as("nd"))
        .as[(String, Long)].collect().toMap
      rows.foreach { case (lang, nKept, _, est) =>
        val nd = exact(lang)
        if (nKept == 256L) {
          val err = math.abs(est - nd) / nd.toDouble
          info(f"$dir0 $lang%-4s est=$est%8d exact=$nd%8d err=$err%.4f")
          assert(err <= 3.0 / math.sqrt(256.0), s"$dir0 $lang: err $err out of band")
        } else assert(est == nd, s"$dir0 $lang: below-capacity estimate not exact")
      }
    }
  }

  test("quantile-sketch family scale invariants: bounded state, in-band estimates at 10x-100x") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    Seq("sf0.01", "sf0.1").foreach { dir0 =>
      val dir = s"/root/testdata/$dir0"
      // per-stratum quantile sketch: sample never exceeds s, and each
      // estimate's exact CDF rank stays inside 3σ + 1/m of its target
      val s = 256
      val est = graft.operators.TextAnalytics.quantileSketch(spark, dir, s)
        .as[(String, Long, Long, Long)].collect()
      assert(est.nonEmpty && est.forall(_._3 <= s), s"$dir0: sample exceeded s")
      val all = graft.sources.Tables.documents(spark, dir)
        .select($"lang", $"n_chars").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      est.foreach { case (lang, p, m, v) =>
        val xs = all(lang)
        val cdf = xs.count(_ <= v).toDouble / xs.length
        val pf = p / 100.0
        val tol = 3 * math.sqrt(pf * (1 - pf) / m) + 1.0 / m
        assert(math.abs(cdf - pf) <= tol,
          s"$dir0 $lang p$p: cdf=$cdf tol=$tol")
      }
      // range layout: buckets partition the corpus and stay balanced
      // as the corpus grows — the property a 100-TB range write needs
      val buckets = graft.sources.Ingest.rangeLayout(spark, dir)
        .as[(Long, Long, Long, Long)].collect().toSeq
      val n = all.values.map(_.length.toLong).sum
      assert(buckets.map(_._2).sum == n, s"$dir0: buckets lost rows")
      buckets.foreach { case (b, c, _, _) =>
        val frac = c.toDouble / n
        info(f"$dir0 bucket $b: ${100 * frac}%.1f%% of $n rows")
        assert(frac >= 0.15 && frac <= 0.35, s"$dir0 bucket $b at $frac")
      }
      // windowed value-quantile sketch: per-window state bounded and
      // quantiles monotone at every scale
      val wq = graft.streaming.EventStreams.eventsValueQuantiles(spark, dir)
        .as[(String, Long, Long, Double, Double, Double, Double)].collect()
      assert(wq.nonEmpty && wq.forall(_._3 <= 64L), s"$dir0: window state exceeded s")
      wq.foreach { case (day, _, _, a, b, c, d) =>
        assert(a <= b && b <= c && c <= d, s"$dir0 $day: non-monotone quantiles")
      }
    }
  }

  test("round-10 sketch/graph scale invariants: HLL band, CMS bound, F2 band, graph rounds at 10x-100x") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    Seq("sf0.01", "sf0.1").foreach { dir0 =>
      val dir = s"/root/testdata/$dir0"
      // HLL replay: state bounded by construction (m registers); the
      // estimate stays inside ~3σ = 3·1.04/√m ≈ 9.8% of exact at
      // every scale (both estimator branches admissible)
      val hll = graft.operators.TextAnalytics.approxDistinct(spark, dir)
        .as[(String, Long, Long, Double)].collect()
      val exact = graft.operators.TextAnalytics.exactDistinctShingles(spark, dir)
        .as[(String, Long)].collect().toMap
      assert(hll.nonEmpty)
      hll.foreach { case (lang, nZero, sScaled, est) =>
        val m = graft.operators.TextAnalytics.HllM.toLong
        assert(nZero >= 0 && nZero <= m && sScaled <= m * (1L << graft.operators.TextAnalytics.HllR))
        val err = math.abs(est - exact(lang)) / exact(lang).toDouble
        info(f"$dir0 HLL $lang%-4s est=$est%.0f exact=${exact(lang)}%d err=$err%.4f")
        assert(err <= 0.10, s"$dir0 $lang: HLL err $err out of band")
      }
      // Count-Min: per-sketch state ≤ depth·width and est ≥ exact on
      // every probe however the corpus grows
      val cms = graft.operators.TextAnalytics.countMinReplay(spark, dir)
      assert(cms.filter($"est" < $"n").count() == 0, s"$dir0: CMS bound violated")
      // F2: the 16-long state's mean estimate stays inside 3× (≈8σ)
      val f2 = graft.operators.TextAnalytics.f2Sketch(spark, dir).head()
      val (f2est, f2exact) = (f2.getLong(2), f2.getLong(3))
      info(f"$dir0 F2 est=$f2est exact=$f2exact")
      assert(f2est > f2exact / 3 && f2est < f2exact * 3, s"$dir0: F2 est out of band")
      // graph iterations: both converge inside GraphMaxRounds at every
      // scale (the operators REQUIRE it — a completed run is the
      // witness), census partitions the node set, core certifies itself
      val census = graft.operators.Graph.connectedComponents(spark, dir)
        .as[(Long, Long)].collect()
      val nActors = graft.sources.Tables.movies(spark, dir)
        .select(explode($"actors")).distinct().count()
      assert(census.map { case (s, n) => s * n }.sum == nActors,
        s"$dir0: census does not partition the actor set")
      val core = graft.operators.Graph.kcoreSummary(spark, dir).head()
      val (cn, cd) = (core.getLong(1), core.getLong(3))
      info(s"$dir0 CC comps=${census.map(_._2).sum} core_nodes=$cn min_core_deg=$cd")
      assert(cn == 0L || cd >= graft.operators.Graph.KCoreK.toLong)
    }
  }

  test("link-predict scale certificate: capped two-paths obey cap x |E| at 10x") {
    import spark.implicits._
    // the operator's whole 100-TB argument is the structural bound
    // |two-paths through sub-hub z| <= hubCap * |E| — check the
    // actual candidate volume against it at both scales (the
    // triangle-wedge discipline applied to the friend-of-friend join)
    def counts(dir: String): (Long, Long) = {
      val e = graft.sources.Tables.coActorEdgesBucketed(spark, dir)
        .select($"src", $"dst")
      val deg = e.groupBy($"src").agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("d"))
      val zok = deg.filter($"d" <= graft.operators.Graph.LinkPredHubCap)
        .select($"src")
      val e1 = e.join(zok, "src")
      val twoPaths = e1.select($"src".as("z"), $"dst".as("a"))
        .join(e1.select($"src".as("z"), $"dst".as("b")), Seq("z"))
        .filter($"a" < $"b").count()
      (e.count(), twoPaths)
    }
    val (eLo, tpLo) = counts("/root/testdata/sf0.01")
    val (eHi, tpHi) = counts("/root/testdata/sf0.1")
    info(s"edges $eLo -> $eHi, capped two-paths $tpLo -> $tpHi")
    val cap = graft.operators.Graph.LinkPredHubCap.toLong
    assert(tpLo <= cap * eLo, s"sf0.01 two-paths $tpLo exceed cap*|E| ${cap * eLo}")
    assert(tpHi <= cap * eHi, s"sf0.1 two-paths $tpHi exceed cap*|E| ${cap * eHi}")
  }

  test("batch-5 scale invariants: bounded grids bounded, CC wall time near-linear") {
    // STRUCTURAL pins first. The χ² contingency grid is bounded by
    // category cardinality, NOT corpus size: the cell count must be
    // IDENTICAL across the 10× step. The AUC's windowed frame is the
    // score grid — it may grow, but never past the document count.
    def chi(dir: String) = graft.operators.Relational.chiSquare(spark, dir)
      .select("n_cells").head().getLong(0)
    assert(chi("/root/testdata/sf0.01") == chi("/root/testdata/sf0.1"),
      "χ² grid grew with the corpus — the category model is broken")
    def aucScores(dir: String) = graft.operators.CorpusQuality
      .scoreAuc(spark, dir).head()
    val (sLo, sHi) = (aucScores("/root/testdata/sf0.01"),
      aucScores("/root/testdata/sf0.1"))
    assert(sLo.getLong(0) <= sLo.getLong(1) + sLo.getLong(2),
      s"sf0.01 score grid exceeds doc count: $sLo")
    assert(sHi.getLong(0) <= sHi.getLong(1) + sHi.getLong(2),
      s"sf0.1 score grid exceeds doc count: $sHi")
    // wall-time curve for the wedge-bounded clustering coefficient —
    // same 6×-linear guard + retry discipline as the other curves
    def secs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(dir: String): Double =
      secs(graft.operators.Graph.graphClusteringCoeff(spark, dir).count())
    val (lo, hi) = (run("/root/testdata/sf0.01"), run("/root/testdata/sf0.1"))
    info(f"clustering coeff sf0.01=$lo%.2fs sf0.1=$hi%.2fs")
    val passed = hi <= 6.0 * 10 * math.max(lo, 0.5) || {
      val (lo2, hi2) = (run("/root/testdata/sf0.01"), run("/root/testdata/sf0.1"))
      info(f"retry sf0.01=$lo2%.2fs sf0.1=$hi2%.2fs")
      math.min(hi, hi2) <= 6.0 * 10 * math.max(math.min(lo, lo2), 0.5)
    }
    assert(passed, s"clustering coefficient grew super-linearly: $lo -> $hi")
  }
}
