package graft

import graft.functions.TextAnalysis.tokens
import graft.operators.{CorpusQuality, Relational}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the corpus-curation operators: crafted
  * mini-corpora with hand-computed expectations, so the rules keep
  * meaning what the docstrings say even if the registered queries
  * stay hash-green by coincidence. */
class CorpusQualitySpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def rules(rows: Seq[(String, Long, Double)]): Map[String, Long] =
    rows.map(r => r._1 -> r._2).toMap

  test("gopher rules: each rule fires on its crafted violator") {
    val good = (1 to 60).map(i => s"the word$i of and").mkString(" ") // 240 words, letters, stopwords
    val short = "the tiny document of today"                          // fails word_count only
    val digits = (1 to 60).map(i => s"${i}000 4200").mkString(" ")    // all-digit tokens
    val docs = Seq((1L, good), (2L, short), (3L, digits))
      .toDF("doc_id", "text")
    val out = CorpusQuality.gopherRulesOf(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val byRule = rules(out.toIndexedSeq)
    assert(byRule("word_count") === 1L)       // only `short`
    assert(byRule("alpha_ratio") === 1L)      // only `digits`
    assert(byRule("digit_ratio") === 1L)      // only `digits`
    assert(byRule("stopwords") === 1L)        // only `digits` (no markers)
    assert(byRule("mean_word_length") === 0L) // everyone in [3,10]
    assert(byRule("any_rule") === 2L)         // short + digits
    val rates = out.map(r => r._1 -> r._3).toMap
    assert(rates("any_rule") === 2.0 / 3.0)
  }

  test("soft dedup: duplicated text is down-weighted, unique text is not") {
    // a1/a2 share every 3-gram (df=2 → dup=2 → weight 0.5 each);
    // b is unique (dup=1 → weight 1)
    val docs = Seq(
      (1L, "alpha beta gamma delta", "srcA"),
      (2L, "alpha beta gamma delta", "srcA"),
      (3L, "epsilon zeta eta theta", "srcB"))
      .toDF("doc_id", "text", "source")
    val out = CorpusQuality.softDedupWeightsOf(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(5))).toMap
    val (na, effA, dupA) = out("srcA")
    assert(na === 2L && effA === 1.0 && dupA === 2.0)
    val (nb, effB, dupB) = out("srcB")
    assert(nb === 1L && effB === 1.0 && dupB === 1.0)
  }

  test("soft dedup: shingle-less documents default to weight 1") {
    val docs = Seq((1L, "just two", "srcX")).toDF("doc_id", "text", "source")
    val row = CorpusQuality.softDedupWeightsOf(docs).collect().head
    assert(row.getDouble(3) === 1.0) // eff_docs
    assert(row.getDouble(5) === 1.0) // avg_dup
  }

  test("curriculum stages partition the corpus and order by difficulty") {
    val out = CorpusQuality.curriculumStages(spark, sf).collect()
    val stages = out.map(_.getString(0)).toSeq
    assert(stages === stages.sorted, "stages must come out ordered")
    assert(stages.toSet.subsetOf(
      Set("s1_easy", "s2_medium", "s3_hard", "s4_hardest")))
    val total = out.map(_.getLong(1)).sum
    val corpus = graft.sources.Tables.documents(spark, sf).count()
    assert(total === corpus, "every document lands in exactly one stage")
  }

  test("ngram novelty: exclusive source scores 1.0, mirrored sources 0.0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", "srcA"),
      (2L, "alpha beta gamma delta", "srcB"), // mirrors srcA exactly
      (3L, "epsilon zeta eta theta iota", "srcC"))
      .toDF("doc_id", "text", "source")
    val out = CorpusQuality.ngramNoveltyOf(docs)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("srcA") === 0.0 && out("srcB") === 0.0)
    assert(out("srcC") === 1.0)
  }

  test("tokenizer fertility: long words chunk, CJK counts per codepoint") {
    val docs = Seq(
      (1L, "en", "internationalization"), // 20 chars -> 5 subwords, 1 word
      (2L, "zh", "的 是 在"))             // 3 one-char words -> 3 subwords
      .toDF("doc_id", "lang", "text")
    val out = CorpusQuality.tokenizerFertilityOf(docs)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out("en") === ((1L, 5L, 5.0)))
    assert(out("zh") === ((3L, 3L, 1.0)))
  }

  test("span corruption: reproducible, position-keyed, spans <= masked") {
    val a = CorpusQuality.spanCorruption(spark, sf).collect()
    val b = CorpusQuality.spanCorruption(spark, sf).collect()
    assert(a.toSeq === b.toSeq, "masking must be deterministic across runs")
    a.foreach { r =>
      val (tok, masked, spans) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(spans <= masked && masked <= tok)
    }
    // corpus-wide rate ~1/6 (binomial, thousands of positions)
    val rate = a.map(_.getLong(2)).sum.toDouble / a.map(_.getLong(1)).sum
    assert(rate > 0.10 && rate < 0.24, s"mask rate $rate far from 1/6")
    // position-keyed: same text under different doc ids masks differently
    val twin = Seq((1L, "one two three four five six seven eight nine ten"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val rows = CorpusQuality.spanCorruptionOf(twin, rate = 2).collect()
    assert(rows.length === 2) // both docs present; masks derive from (id, pos)
  }

  test("char entropy: zero for a one-symbol doc, hand value for a small one") {
    val docs = Seq((1L, "aaaa"), (2L, "ab ab")).toDF("doc_id", "text")
    val out = CorpusQuality.charEntropyOf(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) === 0.0)
    // chars a,b,' ' with counts 2,2,1: ln5 - (2ln2+2ln2)/5 = 1.0549
    assert(out(2L) === 1.0549)
  }

  test("char entropy: expression fold == explode/aggregate reference") {
    // the one-pass CharEntropyStats operator must reproduce the old
    // explode → (doc, char) count → per-doc fold pipeline exactly —
    // on the corpus and on a multi-byte/empty/null fixture
    val fixture = Seq(
      (1L, "aaaa"), (2L, "ab ab"), (3L, ""),
      (4L, "日本語の文章を書くのは楽しいです"),
      (5L, "héllo wörld 😀😀"), (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val corpus = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
    for (docs <- Seq(fixture, corpus)) {
      val a = CorpusQuality.charEntropyOf(docs).collect().toSeq
      val b = CorpusQuality.charEntropyExplodeOf(docs).collect().toSeq
      assert(a === b)
    }
  }

  test("dataset card: hand-computed values on a two-doc corpus") {
    val docs = Seq(
      (1L, "en", "s1", "the cat sat on the mat", 22L),
      (2L, "fr", "s2", "le chat", 7L))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
    val card = CorpusQuality.datasetCardOf(docs)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(card("docs") === 2.0)
    assert(card("langs") === 2.0)
    assert(card("sources") === 2.0)
    assert(card("tokens") === 8.0)
    assert(card("mean_tokens_per_doc") === 4.0)
    assert(card("tokens_min") === 2.0 && card("tokens_max") === 6.0)
    assert(card("total_chars") === 29.0)
    assert(card("quality_pass_rate") === 0.0) // both under 30 words
  }

  test("chargram langid: perfect diagonal on a distinct-script fixture") {
    val docs = Seq(
      (1L, "aa", "karhu metsä järvi talvi karhu metsä"),
      (2L, "aa", "metsä järvi talvi karhu järvi metsä"),
      (3L, "bb", "dragon montagne rivière chateau dragon"),
      (4L, "bb", "montagne rivière chateau dragon rivière"),
      (5L, "cc", "日本語の文章を書くのは楽しいです"),
      (6L, "cc", "言語を学ぶことはとても楽しいです"))
      .toDF("doc_id", "lang", "text")
    val conf = CorpusQuality.langIdChargramOf(docs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    conf.foreach { case (lang, pred, _) =>
      assert(lang === pred, s"misclassified: $lang predicted as $pred")
    }
    assert(conf.map(_._3).sum === 6L)
  }

  test("chargram langid: expression probe == join/aggregate reference") {
    // the collected-profile + CountInGramSets scorer must reproduce
    // the exploded-stream ⋈ broadcast-profile route exactly — same
    // hits, same tie-breaks, same 'unknown' fills — on the corpus and
    // on a fixture with hitless, empty, and null documents
    val fixture = Seq(
      (1L, "aa", "karhu metsä järvi talvi karhu metsä"),
      (2L, "aa", "metsä järvi talvi karhu järvi metsä"),
      (3L, "bb", "dragon montagne rivière chateau dragon"),
      (4L, "bb", "montagne rivière chateau dragon rivière"),
      (5L, "cc", "日本語の文章を書くのは楽しいです"),
      (6L, "cc", "言語を学ぶことはとても楽しいです"),
      (7L, "dd", "zq"), // too short for any trigram ⇒ unknown
      (8L, "dd", ""), (9L, "dd", null.asInstanceOf[String]))
      .toDF("doc_id", "lang", "text")
    val corpus = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"text")
    for (docs <- Seq(fixture, corpus)) {
      val a = CorpusQuality.langIdChargramOf(docs).collect().toSeq
      val b = CorpusQuality.langIdChargramJoinOf(docs).collect().toSeq
      assert(a === b)
    }
  }

  test("quality classifier: deterministic weights that beat the majority class") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val w1 = CorpusQuality.qualityClassifierOf(docs).collect()
    val w2 = CorpusQuality.qualityClassifierOf(docs).collect()
    assert(w1.toSeq === w2.toSeq, "training must be deterministic")
    assert(w1.length === CorpusQuality.ClfDims + 3)
    val w = w1.map(_.getDouble(1))
    assert(w.exists(_ != 0.0), "3 GD iterations must move the weights")
    // apply the trained model to its own training labels: accuracy
    // must beat always-guessing-the-majority-class
    val labeled = docs
      .select($"doc_id",
        (size(tokens($"text")) >= 30 &&
          size(array_intersect(array_distinct(tokens($"text")),
            array(graft.functions.TextAnalysis.langMarkers
              .flatMap(_._2).map(lit): _*))) >= 2).as("y"))
    val scored = CorpusQuality.classifierScores(docs, w)
      .join(labeled, "doc_id")
      .select($"y", ($"p" >= 0.5).as("pred"))
      .collect()
    val acc = scored.count(r => r.getBoolean(0) == r.getBoolean(1)).toDouble / scored.length
    val majority = {
      val pos = scored.count(_.getBoolean(0)).toDouble / scored.length
      math.max(pos, 1 - pos)
    }
    assert(acc > majority,
      s"trained accuracy $acc does not beat majority baseline $majority")
  }

  test("curation pipeline: stages shrink monotonically and s1 matches the rule report") {
    val dir = "/root/testdata/sf0.01"
    val rows = CorpusQuality.curationPipeline(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val langs = rows.keys.filter(_._1 == "s0_raw").map(_._2)
    langs.foreach { l =>
      val s0 = rows(("s0_raw", l)); val s1 = rows(("s1_gopher", l))
      val s2 = rows.getOrElse(("s2_classifier", l), (0L, 0L))
      assert(s1._1 <= s0._1 && s2._1 <= s1._1, s"$l: stages must shrink")
      assert(s1._2 <= s0._2 && s2._2 <= s1._2, s"$l: token mass must shrink")
    }
    // gate survivors == total - any_rule failures from the rule report
    val anyFail = CorpusQuality.gopherRules(spark, dir).collect()
      .find(_.getString(0) == "any_rule").get.getLong(1)
    val total = rows.collect { case (("s0_raw", _), (n, _)) => n }.sum
    val s1Total = rows.collect { case (("s1_gopher", _), (n, _)) => n }.sum
    assert(s1Total === total - anyFail,
      "the pipeline's gopher gate must agree with llm_gopher_rules")
    // the high-confidence classifier cut must actually discriminate
    val s2Total = rows.collect { case (("s2_classifier", _), (n, _)) => n }.sum
    assert(s2Total < s1Total && s2Total > 0)
  }

  test("split leakage: exact duplicates cannot straddle the split") {
    val dups = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    assert(CorpusQuality.splitLeakageOf(dups).count() === 0L,
      "content-keyed split puts byte-identical docs in ONE split")
  }

  test("split leakage on the corpus: canonical pair order, nonzero signal") {
    val rows = CorpusQuality.splitLeakage(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty, "sf0.01 corpus is known to contain near-dups")
    rows.foreach(r => assert(r.getString(0) < r.getString(1),
      "split pairs must come out canonicalized lo < hi"))
  }

  test("global rank: range-partitioned route == window route, tier obeys conf") {
    val df = spark.range(0, 5000).toDF("id")
      .withColumn("k", (col("id") * 37 % 101).cast("long"))
    val window = graft.util.GlobalRank
      .withRowNumber(df, "r", rowBound = 5000, col("k").desc, col("id"))
      .orderBy(col("id")).collect().map(r => (r.getLong(0), r.getLong(2)))
    // force the scale route
    spark.conf.set(graft.util.GlobalRank.windowMaxRowsKey, "0")
    try {
      val ranged = graft.util.GlobalRank
        .withRowNumber(df, "r", rowBound = 5000, col("k").desc, col("id"))
        .orderBy(col("id")).collect().map(r => (r.getLong(0), r.getLong(2)))
      assert(window.toSeq === ranged.toSeq,
        "both routes must produce identical global ranks")
    } finally spark.conf.unset(graft.util.GlobalRank.windowMaxRowsKey)
    assert(window.map(_._2).sorted.toSeq === (1L to 5000L),
      "ranks are a permutation of 1..N")
  }

  test("bloom join: might_contain probe reaches the plan, result is exact") {
    val df = Relational.bloomJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom probe missing from the physical plan:\n$plan")
    // exactness: the bloom path must agree with the plain join
    val plain = graft.sources.Tables.lineitem(spark, sf)
      .join(graft.sources.Tables.orders(spark, sf)
          .filter($"o_orderpriority" === "1-URGENT"),
        $"l_orderkey" === $"o_orderkey")
      .count()
    assert(df.agg(org.apache.spark.sql.functions.sum($"n_items"))
      .collect().head.getLong(0) === plain)
  }

  test("threshold sweep: monotone survivorship, anchored at the production gate") {
    val rows = CorpusQuality.thresholdSweep(spark, sf).collect()
    assert(rows.map(_.getDouble(0)).toSeq == CorpusQuality.SweepThresholds)
    val passes = rows.map(_.getLong(1)).toSeq
    assert(passes.zip(passes.tail).forall { case (a, b) => a >= b },
      s"survivorship must fall as the gate tightens: $passes")
    // the 0.85 grid point IS the production gate: its count must equal
    // an independent score-and-threshold pass
    val docs = graft.sources.Tables.documents(spark, sf)
    val direct = CorpusQuality
      .classifierScores(docs, CorpusQuality.trainedWeights(docs))
      .filter(round(col("z"), 6) >= CorpusQuality.ClfDecisionZ).count()
    val atGate = rows.find(_.getDouble(0) == CorpusQuality.ClfDecisionZ).get
    assert(atGate.getLong(1) == direct)
    // rates are exact count ratios
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("epoch allocation: equal budget split, cap respected, decay bounded") {
    val rows = CorpusQuality.epochAllocation(spark, sf).collect()
    val n = rows.length
    assert(n > 1)
    val total = rows.map(_.getLong(1)).sum
    val expectedAlloc = CorpusQuality.EpochBudgetX * total / n
    rows.foreach { r =>
      val (u, alloc, epochs, eff) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(alloc == expectedAlloc, "uniform split: every source gets B/n")
      val expEpochs = math.min((CorpusQuality.EpochCap * 10000).toLong,
        alloc * 10000L / math.max(u, 1L)).toDouble / 10000.0
      assert(epochs == expEpochs)
      // decay value is positive, bounded by the U*R asymptote, and
      // never exceeds the naively repeated token count
      assert(eff > 0.0 && eff <= u * CorpusQuality.EpochDecayR + 1e-6)
      assert(eff <= u * epochs + 0.01,
        "effective tokens cannot beat undecayed repetition")
    }
    // small sources run more epochs than big ones under a uniform split
    val byU = rows.sortBy(_.getLong(1))
    assert(byU.head.getDouble(3) >= byU.last.getDouble(3))
  }

  test("context fit: monotone in the window, replayed from raw token counts") {
    val rows = CorpusQuality.contextLenFit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == CorpusQuality.CtxWindows.map(_.toLong))
    // monotone: a bigger window fits more docs and burns fewer tokens
    rows.sliding(2).foreach { case Array((_, f1, t1, k1), (_, f2, t2, k2)) =>
      assert(f2 >= f1 && t2 <= t1 && k2 >= k1)
    }
    // exact replay from the per-doc token counts
    val ns = graft.sources.Tables.documents(spark, sf)
      .select(size(tokens(col("text"))).cast("long")).collect().map(_.getLong(0))
    rows.foreach { case (ctx, nFit, trunc, kept) =>
      assert(nFit == ns.count(_ <= ctx).toLong)
      assert(trunc == ns.map(n => math.max(0L, n - ctx)).sum)
      val keptT = ns.map(n => math.min(n, ctx)).sum
      assert(kept == keptT.toDouble / ns.sum)
    }
  }

  test("rolling-hash chunks: content-defined boundaries make shared tails dedup") {
    import spark.implicits._
    // two docs sharing a long tail behind different heads: position-
    // based chunking would misalign every shared chunk; content-
    // defined boundaries re-synchronize after the first boundary, so
    // the tail chunks fingerprint identically across the two docs
    val tail = (1 to 400).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $tail", "s1"),
      (2L, s"gamma $tail", "s1"),
      (3L, "totally different content here", "s2")
    ).toDF("doc_id", "text", "source")
    val got = CorpusQuality.rollingHashChunksOf(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val (n1, d1, frac1) = got("s1")
    assert(n1 > d1, "shared tail chunks must collapse to one fingerprint")
    assert(frac1 > 0.3, s"most of s1's chunks are shared: $frac1")
    val (n3, d3, _) = got("s2")
    assert(n3 == d3, "no duplication within the distinct doc")
    // replay the boundary rule: chunk count = boundaries-before-last+1
    def chunksOf(toks: Seq[String]): Long = {
      val bits = toks.map(t => graft.functions.Md5Int32.hash(
        s"${CorpusQuality.CdcSalt}:", 0,
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
        % CorpusQuality.CdcBoundaryMod == 0)
      1L + bits.dropRight(1).count(identity)
    }
    val expected = Seq(s"alpha beta $tail", s"gamma $tail")
      .map(t => chunksOf(t.split(" ").toSeq)).sum
    assert(n1 == expected, s"chunk count $n1 vs replay $expected")
  }

  test("mixture temperature: weights normalize, tau=1 is proportional, low tau flattens") {
    val rows = CorpusQuality.mixtureTemperature(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val byTau = rows.groupBy(_._1)
    assert(byTau.keySet == CorpusQuality.MixTaus.toSet)
    byTau.values.foreach { g =>
      assert(math.abs(g.map(_._4).sum - 1.0) < 1e-4, "weights sum to 1")
    }
    // tau = 1 reproduces the raw token-mass shares
    val total = byTau(1.0).map(_._3).sum.toDouble
    byTau(1.0).foreach { case (_, _, n, w) =>
      assert(math.abs(w - n / total) < 1e-5)
    }
    // temperature < 1 compresses the spread toward uniform
    def spread(tau: Double) = {
      val ws = byTau(tau).map(_._4); ws.max - ws.min
    }
    assert(spread(0.3) < spread(0.7) && spread(0.7) < spread(1.0),
      "lower temperature must flatten the mix")
  }

  test("blocklist filter: word-boundary hits on a fixture, corpus attribution brackets any") {
    import spark.implicits._
    // "bigger" must NOT match the term "big" -- whole-token
    // membership, not substring; "Slow," matches despite the comma
    // and capitalization (the round-10 advice case the space-padded
    // containment missed); doc 4 hits two terms but counts once in
    // __any__
    val docs = Seq(
      (1L, "big data pipelines"), (2L, "a Slow, rainy day"),
      (3L, "nothing bigger here"), (4L, "stream of vector values"))
      .toDF("doc_id", "text")
    val got = CorpusQuality.blocklistFilterOf(docs)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("__any__", 3L, 0.75), ("big", 1L, 0.25),
      ("slow", 1L, 0.25), ("stream", 1L, 0.25), ("vector", 1L, 0.25)),
      s"got $got")
    // corpus: any-row brackets the per-term rows (max <= any <= sum)
    val corpus = CorpusQuality.blocklistFilter(spark, sf)
      .as[(String, Long, Double)].collect()
    val (anyRows, termRows) = corpus.partition(_._1 == "__any__")
    assert(anyRows.length == 1 &&
      termRows.map(_._1).toSeq == CorpusQuality.BlocklistTerms)
    val anyN = anyRows.head._2
    assert(anyN >= termRows.map(_._2).max && anyN <= termRows.map(_._2).sum)
    corpus.foreach { case (_, n, s) =>
      assert(n >= 0 && s >= 0.0 && s <= 1.0) }
  }

  test("score auc: rank-sum hand-walked (separation, ties, reversal)") {
    import spark.implicits._
    def auc(rows: (Double, Boolean)*): (Long, Long, Long, Double) =
      CorpusQuality.aucOf(rows.toDF("score", "label"))
        .as[(Long, Long, Long, Double)].head()
    // perfect separation: every positive above every negative
    assert(auc((1.0, false), (2.0, true)) == ((2L, 1L, 1L, 1.0)))
    // full tie: AUC = 1/2 by the half-credit convention
    assert(auc((1.0, true), (1.0, false)) == ((1L, 1L, 1L, 0.5)))
    // perfect reversal
    assert(auc((2.0, false), (1.0, true)) == ((2L, 1L, 1L, 0.0)))
    // mixed, hand-computed: pos at 3 beats negs at 1,2; pos at 2
    // ties the neg at 2 -> U = 2 + 1 + 0.5 + 0 = wait, pos = {3, 2},
    // neg = {1, 2}: U = (2 beats 1, half vs 2) + (3 beats both)
    //   = 1.5 + 2 = 3.5 of P*N = 4 -> 0.875
    assert(auc((1.0, false), (2.0, false), (2.0, true), (3.0, true))
      == ((3L, 2L, 2L, 0.875)))
    // degenerate single-class input surfaces NaN, not a crash
    assert(auc((1.0, true), (2.0, true))._4.isNaN)
    // corpus: the label census reconciles with the gopher any_rule
    // count and AUC is a genuine probability
    val (nScores, nPos, nNeg, a) = CorpusQuality.scoreAuc(spark, sf)
      .as[(Long, Long, Long, Double)].head()
    assert(nScores > 1 && nPos > 0 && nNeg > 0)
    assert(a >= 0.0 && a <= 1.0, s"auc $a")
    // calibration: bands partition the scoreable docs, rates bounded
    val cal = CorpusQuality.scoreCalibration(spark, sf)
      .as[(Long, Long, Double, Double)].collect()
    assert(cal.map(_._2).sum == nPos + nNeg)
    assert(cal.forall(b => b._1 >= 0 && b._1 <= 9))
    assert(cal.forall(b => b._4 >= 0.0 && b._4 <= 1.0))
    // mean surprisal rises with the band index (equal-width bands)
    val means = cal.sortBy(_._1).map(_._3)
    assert(means.zip(means.tail).forall { case (x, y) => x <= y })
  }
}
