package graft

import graft.functions.Hashing._
import graft.functions.TextAnalysis._
import graft.operators.TextAnalytics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite with SparkSpec {
  import java.security.MessageDigest

  private def refMd5i32(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16)
  }

  test("md5i32 matches an independent JVM MD5 computation") {
    import spark.implicits._
    val got = Seq("abc", "spark graft", "").toDF("s")
      .select(md5i32($"s", 7).as("h")).as[Long].collect()
    val want = Seq("abc", "spark graft", "").map(s => refMd5i32(s"7:$s"))
    assert(got.toSeq == want)
  }

  test("Md5Int32 expression == hex-substring built-in composition, incl. unicode") {
    import spark.implicits._
    // the codegen'd digest-to-long path must be bit-identical to the
    // conv(substring(md5(...))) formulation the DuckDB oracles use
    val data = Seq("abc", "", "héllo wörld", "的是在了我", "a b c d e",
      "x" * 500).toDF("s")
    val bad = data.select(
      md5i32($"s", 7).as("n1"),
      conv(substring(md5(concat(lit("7:"), $"s")), 1, 8), 16, 10)
        .cast("long").as("o1"),
      md5PairA($"s").as("n2"),
      conv(substring(md5($"s"), 1, 8), 16, 10).cast("long").as("o2"),
      md5PairB($"s").as("n3"),
      conv(substring(md5($"s"), 9, 8), 16, 10).cast("long")
        .bitwiseOR(lit(1L)).as("o3"))
      .filter($"n1" =!= $"o1" || $"n2" =!= $"o2" || $"n3" =!= $"o3")
      .count()
    assert(bad == 0)
  }

  test("shingle + hash kernels actually whole-stage-compile (no silent fallback)") {
    import spark.implicits._
    // a generated-code bug (e.g. calling a static forwarder scalac
    // never emitted) makes janino reject the stage and Spark silently
    // run it interpreted — results stay right, the optimization
    // silently dies. fallback=false turns that into a hard error.
    val key = "spark.sql.codegen.fallback"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val n = graft.sources.Tables.documents(spark, sf)
        .select(explode(shingles(tokens($"text"), 3)).as("sh"))
        .withColumn("p", graft.functions.Md5Pair.md5_pair($"sh"))
        .select(md5i32($"sh", 0).as("h"), md5PairA($"sh").as("a"),
          md5PairB($"sh").as("b"), $"p.a".as("pa"))
        .agg(sum($"h" + $"a" + $"b" + $"pa")).head().getLong(0)
      assert(n != 0)
    } finally spark.conf.set(key, prev)
  }

  test("CountTokenEq expression == size(filter(...)) HOF on real docs") {
    import spark.implicits._
    // the codegen'd term-frequency kernel must count exactly what the
    // interpreted higher-order form it replaced counted — including
    // zero-hit docs, empty arrays, and repeated terms
    val terms = TextAnalytics.bm25DefaultQuery :+ "no_such_token_xyz"
    val bad = graft.sources.Tables.documents(spark, sf)
      .select(tokens($"text").as("tk"))
      .filter(terms.map(t =>
        graft.functions.CountTokenEq.count_token_eq($"tk", t) =!=
          size(filter($"tk", x => x === lit(t))).cast("long"))
        .reduce(_ || _))
      .count()
    assert(bad == 0)
  }

  test("CountTokenEq whole-stage-compiles and handles null rows/elements") {
    import spark.implicits._
    val key = "spark.sql.codegen.fallback"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val got = Seq(
        Some(Seq(Some("a"), Some("b"), Some("a"), None)),
        Some(Seq.empty[Option[String]]),
        None
      ).toDF("tk")
        .select(graft.functions.CountTokenEq.count_token_eq($"tk", "a").as("c"))
        .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSeq
      // null element never matches (HOF parity); null array ⇒ null out
      assert(got == Seq(2L, 0L, -1L))
    } finally spark.conf.set(key, prev)
  }

  test("Shingles expression == higher-order formulation on real docs") {
    import spark.implicits._
    // the codegen'd shingler must produce byte-identical arrays to
    // the transform/slice/array_join composition it replaced
    val bad = graft.sources.Tables.documents(spark, sf)
      .select(tokens($"text").as("ts"))
      .filter(!(shingles($"ts", 3) <=> graft.functions.TextAnalysis.shinglesHof($"ts", 3)) ||
        !(shingles($"ts", 2) <=> graft.functions.TextAnalysis.shinglesHof($"ts", 2)))
      .count()
    assert(bad == 0)
  }

  test("CharNgrams expression == split/slice/shingles composition, incl. unicode") {
    import spark.implicits._
    val key = "spark.sql.codegen.fallback"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      // the native char-gram walk must produce byte-identical arrays
      // to the split('')+slice+Shingles composition it replaced, for
      // the per-char (n=1) and trigram (n=3) forms both — across
      // multi-byte UTF-8 (CJK, combining, emoji/surrogate pairs),
      // newlines, empties, and null
      val fixture = Seq(Some("abc"), Some(""), Some("héllo wörld"),
        Some("的是在了我"), Some("a b  c"), Some("x" * 500),
        Some("日本語の文章 😀 emoji"), Some("\nnew\nlines\n"),
        None).toDF("text")
      val corpus = graft.sources.Tables.documents(spark, sf).select($"text")
      for (data <- Seq(fixture, corpus)) {
        val comp = expr("slice(split(text, ''), 1, length(text))")
        val bad = data.select(
          graft.functions.CharNgrams.char_ngrams($"text", 1).as("n1"),
          comp.as("o1"),
          graft.functions.CharNgrams.char_ngrams($"text", 3).as("n3"),
          shingles(comp, 3).as("o3"))
          .filter(!($"n1" <=> $"o1") || !($"n3" <=> $"o3"))
          .count()
        assert(bad == 0)
      }
    } finally spark.conf.set(key, prev)
  }

  test("WordTokens expression == regexp_extract_all(lower) composition, incl. unicode classes") {
    import spark.implicits._
    val key = "spark.sql.codegen.fallback"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      // the native tokenizer must produce byte-identical arrays to
      // the regex route across: Nl (Ⅻ) and No (²) numerals the
      // isDigit shortcut would miss, Nd beyond ASCII (٣), full-case
      // lowering that changes length (İ → i + combining dot), CJK,
      // emoji (non-members), underscores, empty, and null
      val fixture = Seq(Some("The cat_9 sat"), Some(""), Some("  \t\n"),
        Some("Ⅻ legions, ² squared, ٣ three"), Some("İstanbul DİŞ"),
        Some("的是在了我 mixed 语言"), Some("😀 a😀b"), Some("___"),
        Some("ẞß Σσς MIXED"), None).toDF("text")
      val corpus = graft.sources.Tables.documents(spark, sf).select($"text")
      for (data <- Seq(fixture, corpus)) {
        val bad = data.select(tokens($"text").as("n"),
          graft.functions.TextAnalysis.tokensRegex($"text").as("o"))
          .filter(!($"n" <=> $"o")).count()
        assert(bad == 0)
      }
    } finally spark.conf.set(key, prev)
  }

  test("CharEntropyStats: hand values, empty and null text") {
    import spark.implicits._
    val key = "spark.sql.codegen.fallback"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val got = Seq(Some("aaaa"), Some("ab ab"), Some(""), None)
        .toDF("text")
        .select(graft.functions.CharEntropyStats
          .char_entropy_stats($"text").as("st"))
        .select($"st.n_chars", $"st.uniq_chars", $"st.entropy_raw")
        .collect()
      assert(got(0).getLong(0) == 4L && got(0).getLong(1) == 1L
        && got(0).getDouble(2) == 0.0)
      // a,b,' ' with counts 2,2,1: ln5 - (2ln2 + 2ln2 + 1ln1)/5
      assert(got(1).getLong(0) == 5L && got(1).getLong(1) == 3L
        && math.abs(got(1).getDouble(2)
          - (math.log(5) - 4 * math.log(2) / 5)) < 1e-12)
      assert(got(2).getLong(0) == 0L && got(2).getLong(1) == 0L)
      assert(got(3).isNullAt(0) && got(3).isNullAt(2))
    } finally spark.conf.set(key, prev)
  }

  test("Token/Shingle dup-stat folds == explode/aggregate references") {
    import spark.implicits._
    // the one-pass stat folds must reproduce the explode → count per
    // (doc, key) → per-doc aggregate route exactly, including the
    // dropped rows (empty token arrays; < 3 tokens for shingles) —
    // all-fields integer, so equality is exact
    val fixture = Seq(
      (1L, "the the the cat"), (2L, "a b c a b c a b c"),
      (3L, ""), (4L, "x y"), (5L, null.asInstanceOf[String]),
      (6L, "的是 的是 在了 wörld wörld"))
      .toDF("doc_id", "text")
    val corpus = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
    for (docs <- Seq(fixture, corpus)) {
      val t = docs.select($"doc_id", tokens($"text").as("ts"))
      val got = TextAnalytics.qualityStats(t)
        .collect().map(r => r.getLong(0) -> r.toSeq).toMap
      // reference: the old two-frame join — short docs' null shingle
      // stats map to the fused frame's n_sh = 0 / d_sh = 0
      val ref = TextAnalytics.qualityWordStatsAgg(t)
        .join(TextAnalytics.qualityShingleStatsAgg(t), Seq("doc_id"), "left")
        .na.fill(Map("n_sh" -> 0L, "d_sh" -> 0L))
        .collect().map(r => r.getLong(0) -> r.toSeq).toMap
      assert(got === ref)
    }
  }

  test("shingles: 3-grams in order, duplicates kept, short docs empty") {
    import spark.implicits._
    val got = Seq("a b c d a b c", "a b", "").toDF("text")
      .select(shingles(tokens($"text"), 3).as("sh")).as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d", "c d a", "d a b", "a b c"))
    assert(got(1).isEmpty && got(2).isEmpty)
  }

  test("langScore counts distinct marker hits") {
    import spark.implicits._
    val dt = array_distinct(tokens($"text"))
    val row = Seq("The cat and the dog of a house").toDF("text")
      .select(langScore(dt, "en").as("en"), langScore(dt, "de").as("de"))
      .head()
    assert(row.getInt(0) == 4) // the, and, of, a
    assert(row.getInt(1) == 0)
  }

  test("fingerprint n_shingles == word_tokens - 2 (cross-query consistency)") {
    import spark.implicits._
    val fp = TextAnalytics.fingerprint(spark, sf).select($"doc_id", $"n_shingles")
    val tc = TextAnalytics.tokenCount(spark, sf).select($"doc_id", $"word_tokens")
    val bad = fp.join(tc, "doc_id")
      .filter($"n_shingles" =!= $"word_tokens" - 2)
      .count()
    assert(bad == 0)
  }

  test("HLL replay: within 5% of exact, partition-invariant, both estimator branches") {
    import spark.implicits._
    // error bound vs the test-only exact twin (the shipped query is
    // sketch-only; exact distinct is the scale-killer it replaces)
    val bad = TextAnalytics.approxDistinct(spark, sf)
      .join(TextAnalytics.exactDistinctShingles(spark, sf), "lang")
      .filter(abs($"est_distinct" - $"exact_shingles")
        > $"exact_shingles" * 0.05)
      .count()
    assert(bad == 0)
    // register state is a MAX-merge: partitioning cannot change it
    val docsDf = graft.sources.Tables.documents(spark, sf)
    val a = TextAnalytics.approxDistinctOf(docsDf).collect().toSeq
    val b = TextAnalytics.approxDistinctOf(docsDf.repartition(13)).collect().toSeq
    assert(a == b, "sketch not partition-invariant")
    // at sf0.001 every lang sits below 2.5m -> linear-counting branch;
    // force the raw branch with a synthetic high-cardinality corpus
    // (4000 distinct shingles > 2.5 * 1024) and re-check the bound
    val wide = (1 to 4000).map(i => (i.toLong, "en", s"w$i x$i y$i"))
      .toDF("doc_id", "lang", "text")
    val row = TextAnalytics.approxDistinctOf(wide)
      .select($"n_zero", $"est_distinct").head()
    val est = row.getDouble(1)
    assert(math.abs(est - 4000.0) <= 4000.0 * 0.10,
      s"raw-branch estimate $est off >10% from 4000")
    // raw branch really taken: raw > 2.5m means the LC guard is false
    assert(est > 2.5 * TextAnalytics.HllM)
  }

  test("token counts are consistent: subword >= word >= ws tokens") {
    import spark.implicits._
    val bad = TextAnalytics.tokenCount(spark, sf)
      .filter(!($"subword_tokens" >= $"word_tokens" && $"word_tokens" >= $"ws_tokens"))
      .count()
    assert(bad == 0)
  }

  test("repetition signals: one row per doc, fractions in [0,1]") {
    import spark.implicits._
    val rep = TextAnalytics.repetitionSignals(spark, sf).cache()
    val docs = graft.sources.Tables.documents(spark, sf).count()
    assert(rep.count() == docs)
    val bad = rep.filter(
      !($"top_word_frac".between(0, 1) && $"dup_word_frac".between(0, 1) &&
        $"dup_3gram_frac".between(0, 1)) ||
        !$"flagged".isin(0L, 1L)).count()
    assert(bad == 0)
    // duplicate-word fraction must exceed the 3-gram fraction on
    // word-salad text (3-grams are much more distinctive than words)
    val inverted = rep.filter($"dup_3gram_frac" > $"dup_word_frac").count()
    assert(inverted < docs / 10)
    rep.unpersist()
  }

  test("unigram logprob: surprisal positive, ppl = exp(mean), bounded by vocab") {
    import spark.implicits._
    val lp = TextAnalytics.unigramLogprob(spark, sf).cache()
    val vocab = TextAnalytics.tfidf(spark, sf).select($"term").distinct().count()
    val bad = lp.filter($"avg_surprisal" <= 0 ||
      abs($"ppl" - exp($"avg_surprisal")) > 1e-3).count()
    assert(bad == 0)
    // per-doc ppl is unbounded (a doc of corpus-rare tokens scores
    // high), but the TOKEN-WEIGHTED corpus mean surprisal is the
    // corpus unigram entropy, which cannot exceed ln(vocab)
    val h = lp.agg(
      (sum($"n_tokens" * $"avg_surprisal") / sum($"n_tokens")).as("h"))
      .head().getDouble(0)
    assert(h <= math.log(vocab.toDouble) + 1e-3,
      s"corpus entropy $h above ln($vocab)")
    lp.unpersist()
  }

  test("decontamination: shared-ngram counts verified against plain Scala") {
    import spark.implicits._
    val flagged = TextAnalytics.decontaminate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(flagged.nonEmpty, "no contamination found at test scale")
    val ids = flagged.flatMap(t => Seq(t._1, t._2)).distinct
    val texts = graft.sources.Tables.documents(spark, sf)
      .filter($"doc_id".isin(ids: _*))
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    def grams5(s: String): Set[String] =
      "[\\p{L}\\p{N}_]+".r.findAllIn(s.toLowerCase).toSeq
        .sliding(5).filter(_.size == 5).map(_.mkString(" ")).toSet
    flagged.foreach { case (doc, bench, shared) =>
      assert(doc != bench, "benchmark doc flagged against itself")
      val want = grams5(texts(doc)).intersect(grams5(texts(bench))).size
      assert(shared == want, s"pair ($doc,$bench): got $shared want $want")
    }
  }

  test("source cap: kept counts within cap and within doc counts") {
    import spark.implicits._
    val cap = 15
    val sc = TextAnalytics.sourceCap(spark, sf, cap).cache()
    val bad = sc.filter($"n_kept" > cap || $"n_kept" > $"n_docs" ||
      ($"n_docs" >= cap && $"n_kept" =!= cap)).count()
    assert(bad == 0)
    // budget accounting: kept tokens never exceed the corpus total
    val total = TextAnalytics.tokenCount(spark, sf)
      .agg(sum($"ws_tokens")).head().getLong(0)
    val kept = sc.agg(sum($"kept_tokens")).head().getLong(0)
    assert(kept <= total && kept > 0)
    sc.unpersist()
  }

  test("Md5Pair struct words == separate Md5Int32 reads, incl. unicode") {
    import spark.implicits._
    val data = Seq("abc", "", "héllo wörld", "的是在了我", "x" * 500).toDF("s")
    val bad = data
      .withColumn("p", graft.functions.Md5Pair.md5_pair($"s"))
      .select(
        $"p.a".as("pa"), md5PairA($"s").as("oa"),
        $"p.b".bitwiseOR(lit(1L)).as("pb"), md5PairB($"s").as("ob"))
      .filter($"pa" =!= $"oa" || $"pb" =!= $"ob")
      .count()
    assert(bad == 0)
  }

  test("bloom decontamination == exact decontamination, probe is native") {
    val exact = TextAnalytics.decontaminate(spark, sf)
      .collect().map(_.toSeq).toSeq
    val bloomed = TextAnalytics.decontaminateBloom(spark, sf)
    assert(bloomed.collect().map(_.toSeq).toSeq == exact,
      "bloom prefilter changed the decontamination result")
    assert(exact.nonEmpty, "no contaminated docs at test scale")
    // the probe must be the codegen'd BloomFilterMightContain
    // expression, not a UDF wrapper
    val plan = bloomed.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"), s"bloom probe missing:\n$plan")
  }

  test("langId plan evaluates the tokenizer once and each score once") {
    // Round-3 bench regression: inlining langScore into the CASE
    // planted up to 15 copies of the tokenize+intersect subtree in
    // one projection. The hoisted form must keep exactly one
    // tokenizer (the native wordtokens walk) and one array_intersect
    // per language in the optimized plan — if CollapseProject ever
    // starts re-inlining them, this fails before the bench does.
    val plan = TextAnalytics.langId(spark, sf)
      .queryExecution.optimizedPlan.toString
    val nTok = "wordtokens".r.findAllIn(plan).length
    val nInt = "array_intersect".r.findAllIn(plan).length
    assert(nTok == 1, s"expected 1 wordtokens, got $nTok")
    assert(nInt == langMarkers.size,
      s"expected ${langMarkers.size} array_intersect, got $nInt")
  }

  test("bigram surprisal: n_bigrams = n_tokens - 1, ppl = exp(avg)") {
    import spark.implicits._
    val bi = TextAnalytics.bigramLogprob(spark, sf)
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    val toks = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", size(graft.functions.TextAnalysis.tokens($"text"))
        .cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(bi.nonEmpty)
    bi.values.foreach { case (doc, nBg, avg, ppl) =>
      assert(nBg == toks(doc) - 1, s"doc $doc: $nBg bigrams, ${toks(doc)} tokens")
      assert(math.abs(ppl - math.exp(avg)) < 1e-3)
      assert(avg >= 0) // p(w|prev) ≤ 1 always
    }
  }

  test("PMI collocations: hand-computed fixture, floor and ordering on the corpus") {
    import spark.implicits._
    // 6 identical docs "zig zag w<i> zig": c(zig zag)=6, c(zig)=12,
    // c(zag)=6, N=24 tokens, B=18 bigrams; every other bigram is
    // unique per doc, so minCount=2 keeps exactly the one collocation
    val fixture = (1 to 6)
      .map(i => (i.toLong, s"zig zag w$i zig"))
      .toDF("doc_id", "text")
    val got = TextAnalytics.pmiCollocationsOf(fixture, minCount = 2, k = 10)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(got.length == 1)
    val (a, b, cab, ca, cb, pmi) = got.head
    assert((a, b, cab, ca, cb) == ("zig", "zag", 6L, 12L, 6L))
    val want = BigDecimal(math.log((6.0 / 18) / ((12.0 / 24) * (6.0 / 24))))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(pmi == want, s"pmi $pmi != $want")
    // corpus: bounded at k, floored at PmiMinCount, sorted by pmi desc
    val corpus = TextAnalytics.pmiCollocations(spark, sf)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(corpus.length <= TextAnalytics.PmiTopK)
    assert(corpus.forall(_._3 >= TextAnalytics.PmiMinCount))
    assert(corpus.map(_._6).toSeq == corpus.map(_._6).toSeq.sortBy(-(_: Double)))
  }

  test("feature hashing conserves token mass and bounds nnz") {
    import spark.implicits._
    val fh = TextAnalytics.featureHash(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    val toks = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", size(graft.functions.TextAnalysis.tokens($"text"))
        .cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(fh.nonEmpty)
    fh.foreach { case (doc, nnz, l1, _) =>
      assert(l1 == toks(doc), s"doc $doc: L1 $l1 vs ${toks(doc)} tokens")
      assert(nnz <= math.min(64L, l1) && nnz >= 1)
    }
  }

  test("corpus split: partition of the corpus, stable under growth") {
    import spark.implicits._
    val splits = TextAnalytics.corpusSplit(spark, sf)
      .as[(String, String, Long, Long)].collect()
    val total = graft.sources.Tables.documents(spark, sf).count()
    assert(splits.map(_._3).sum == total, "every doc in exactly one split")
    assert(splits.map(_._1).distinct.sorted.toSeq == Seq("test", "train", "val"))
    // content-keyed: growing the corpus never reassigns an old doc
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"text", $"lang")
    def assign(d: org.apache.spark.sql.DataFrame) =
      TextAnalytics.corpusSplitOf(d)
        .as[(String, String, Long, Long)].collect().toSet
    val half = docs.filter(graft.functions.Hashing.md5i32($"text", 3) % 2 === 0)
    val fromHalf = assign(half)
    val fromAll = assign(docs)
    // per-(split, lang) counts over the half-corpus are bounded by the
    // full corpus's (a doc's split never depends on the other docs)
    fromHalf.foreach { case (s, l, n, _) =>
      val full = fromAll.find(r => r._1 == s && r._2 == l)
      assert(full.exists(_._3 >= n), s"($s, $l) shrank when corpus grew")
    }
  }

  test("bpe train: step 1 == pair-stats argmax, freqs non-increasing") {
    import spark.implicits._
    val merges = TextAnalytics.bpeTrain(spark, sf, steps = 3)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(merges.length == 3)
    // round 1 maximizes exactly the statistic bpePairStats reports
    val top1 = TextAnalytics.bpePairStats(spark, sf, topN = 1)
      .as[(String, Long)].head()
    assert((merges(0)._2, merges(0)._3) == top1)
    // a later round's max can never exceed an earlier one's (merged
    // symbols inherit at most their constituents' counts), and no
    // pair is ever selected twice (it no longer exists once merged)
    merges.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3, s"freq grew: $a -> $b")
    }
    assert(merges.map(_._2).distinct.length == 3)
    // every selected pair is two space-joined non-empty symbols
    merges.foreach { case (_, p, _) =>
      assert(p.split(" ").count(_.nonEmpty) == 2, s"malformed pair '$p'")
    }
  }

  test("bpe merge is exact greedy BPE: adjacent occurrences all merge") {
    import spark.implicits._
    // 'abab': pair (a,b) occurs twice DISJOINTLY; true greedy BPE
    // yields [ab, ab] (4 symbols over freq 2). A single-space sentinel
    // encoding would eat the shared separator and leave [ab, a, b].
    val docs = Seq((1L, "abab abab")).toDF("doc_id", "text")
    val enc = TextAnalytics.bpeEncodeOf(docs, steps = 1)
      .as[(Long, Long, Double)].head()
    assert(enc == ((8L, 4L, 2.0)), s"got $enc")
    // overlapping run 'aaa' with pair (a,a): greedy left-to-right
    // merges the first two only -> [aa, a]
    val run = TextAnalytics.bpeEncodeOf(
      Seq((1L, "aaa aaa")).toDF("doc_id", "text"), steps = 1)
      .as[(Long, Long, Double)].head()
    assert(run == ((6L, 4L, 2.0)), s"got $run")
    // exhausting all pairs stops training early instead of crashing
    val single = TextAnalytics.bpeTrainOf(
      Seq((1L, "a b c")).toDF("doc_id", "text"), steps = 3)
    assert(single.count() == 0)
  }

  test("bpe encode: char mass preserved, reduction bounded by merge counts") {
    import spark.implicits._
    val (before, after, avg) = TextAnalytics.bpeEncode(spark, sf, steps = 3)
      .as[(Long, Long, Double)].head()
    // merging never changes characters, only groups them
    val chars = graft.sources.Tables.documents(spark, sf)
      .select(explode(graft.functions.TextAnalysis.tokens($"text")).as("t"))
      .agg(sum(length($"t")).cast("long")).as[Long].head()
    assert(before == chars, s"char mass $before vs corpus $chars")
    // each replace removes exactly one symbol per merged occurrence;
    // greedy overlap means replaces <= the selected pair's count
    val maxReduction = TextAnalytics.bpeTrain(spark, sf, steps = 3)
      .agg(sum($"freq")).as[Long].head()
    assert(after < before && after >= before - maxReduction,
      s"after=$after before=$before maxReduction=$maxReduction")
    val nWords = graft.sources.Tables.documents(spark, sf)
      .select(explode(graft.functions.TextAnalysis.tokens($"text")))
      .count()
    assert(math.abs(avg - after.toDouble / nWords) < 1e-5)
  }

  test("seq pack: bin accounting identity and shard-invariant totals") {
    import spark.implicits._
    val ctx = 512
    val packed = TextAnalytics.seqPack(spark, sf, ctx, shards = 4)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(packed.nonEmpty)
    // independent token mass per lang
    val mass = graft.sources.Tables.documents(spark, sf)
      .groupBy($"lang")
      .agg(sum(size(graft.functions.TextAnalysis.tokens($"text"))
        .cast("long")).as("t"))
      .as[(String, Long)].collect().toMap
    packed.foreach { case (lang, nDocs, toks, bins, pad, crossers) =>
      assert(toks == mass(lang), s"$lang token mass")
      // every consumed bin is ctx tokens of capacity, exactly
      assert(bins * ctx == toks + pad, s"$lang bin accounting")
      assert(crossers >= 0 && crossers <= nDocs)
    }
    // sharding reorders the streams but cannot change doc/token totals,
    // and the per-stream ceil costs at most (shards-1) extra bins
    val one = TextAnalytics.seqPack(spark, sf, ctx, shards = 1)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    packed.foreach { case (lang, nDocs, toks, bins, _, _) =>
      val (_, nDocs1, toks1, bins1, _, _) = one(lang)
      assert(nDocs == nDocs1 && toks == toks1)
      assert(bins >= bins1 && bins <= bins1 + 3, s"$lang bins $bins vs $bins1")
    }
  }

  test("seq pack bins: materialized bins reconcile with the audit") {
    import spark.implicits._
    val ctx = 512
    val bins = TextAnalytics.seqPackBins(spark, sf, ctx)
      .as[(String, Long, Long, Long, String)].collect()
    val audit = TextAnalytics.seqPack(spark, sf, ctx, shards = 1)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(bins.nonEmpty)
    bins.groupBy(_._1).foreach { case (lang, bs) =>
      val (_, nDocs, total, nBins, _, _) = audit(lang)
      // a bin appears in the materialized view only when a doc STARTS
      // in it — a doc spanning >2 windows leaves interior bins with no
      // starter — so the view holds at most the audit's bin count and
      // its ids live in the audit's range
      assert(bs.length <= nBins, s"$lang bin count")
      assert(bs.map(_._3).sum == nDocs && bs.map(_._4).sum == total)
      assert(bs.forall(b => b._2 >= 0 && b._2 < nBins && b._4 > 0))
      assert(bs.map(_._2).distinct.length == bs.length)
      assert(bs.exists(_._2 == 0L), s"$lang stream must start at bin 0")
    }
  }

  test("doc chunk: hand-computed windows and corpus ceil identity") {
    import spark.implicits._
    // 150 known tokens, chunk 64 / stride 48 → starts 1,49,97,145
    val text = (1 to 150).map(i => s"t$i").mkString(" ")
    val rows = TextAnalytics.docChunkOf(
      Seq((1L, text)).toDF("doc_id", "text"), chunk = 64, stride = 48)
      .select($"chunk_idx", $"start_tok", $"n_chunk_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows == Seq((0L, 1L, 64L), (1L, 49L, 64L), (2L, 97L, 54L),
      (3L, 145L, 6L)))
    // real corpus: chunks per doc == ceil(tokens/stride); final chunk
    // reaches exactly the last token
    val byDoc = TextAnalytics.docChunk(spark, sf)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        max($"start_tok" + $"n_chunk_tokens" - 1).as("last_tok"))
    val toks = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", size(graft.functions.TextAnalysis.tokens($"text"))
        .cast("long").as("n"))
    val joined = byDoc.join(toks, "doc_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (doc, nChunks, lastTok, n) =>
      assert(nChunks == (n + 47) / 48, s"doc $doc chunk count")
      assert(lastTok == n, s"doc $doc coverage")
    }
  }

  test("dup spans: hand-built cross-doc duplicates, bounds on real corpus") {
    import spark.implicits._
    // doc 1 and 2 share one 5-token span ("a b c d e"); doc 3 is
    // unique; doc 4 too short for any span
    val docs = Seq(
      (1L, "a b c d e x y z"),   // 4 spans, 1 duplicated
      (2L, "q a b c d e"),       // 2 spans, 1 duplicated
      (3L, "u v w p r s t"),     // 3 spans, 0 duplicated
      (4L, "one two")            // no spans
    ).toDF("doc_id", "text")
    val got = TextAnalytics.dupSpansOf(docs, k = 5)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 1L, 0.25), (2L, 2L, 1L, 0.5), (3L, 3L, 0L, 0.0)))
    // within-doc repeats do NOT count as cross-doc duplicates
    val solo = TextAnalytics.dupSpansOf(
      Seq((1L, "a b c d e f a b c d e f")).toDF("doc_id", "text"), k = 5)
      .as[(Long, Long, Long, Double)].head()
    assert(solo == ((1L, 8L, 0L, 0.0)))
    // real corpus: 0 <= dup <= total per doc, and the synthetic
    // near-dup documents guarantee SOME duplicated spans exist
    val real = TextAnalytics.dupSpans(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(real.nonEmpty)
    real.foreach { case (doc, tot, dup, frac) =>
      assert(dup >= 0 && dup <= tot, s"doc $doc bounds")
      assert(math.abs(frac - math.rint(dup.toDouble / tot * 1e6) / 1e6) < 1e-9,
        s"doc $doc fraction")
    }
    assert(real.exists(_._3 > 0), "expected some cross-doc duplicate spans")
    // the inspection companion: exactly the one shared span, df = 2
    val top = TextAnalytics.topDupSpansOf(docs, k = 5)
      .as[(String, Long)].collect().toSeq
    assert(top == Seq(("a b c d e", 2L)))
    // real corpus: every reported span is shared by >= 2 docs, sorted
    val topReal = TextAnalytics.topDupSpans(spark, sf)
      .as[(String, Long)].collect().toSeq
    assert(topReal.nonEmpty && topReal.forall(_._2 >= 2))
    assert(topReal.map(_._2) == topReal.map(_._2).sortBy(-_))
  }

  test("mix weights: normalized, monotone in size, budget conserved") {
    import spark.implicits._
    val r = TextAnalytics.mixWeights(spark, sf)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(r.nonEmpty)
    // weights form a distribution and expected docs re-spend the budget
    assert(math.abs(r.map(_._4).sum - 1.0) < 1e-4)
    assert(math.abs(r.map(_._5).sum - 100000.0) < 1.0)
    // alpha < 1 tempering: weight order follows token-count order,
    // but ratios compress — the largest source is downweighted vs its
    // proportional share, the smallest upweighted
    val bySize = r.sortBy(_._3)
    assert(bySize.map(_._4).toSeq == bySize.map(_._4).sorted.toSeq)
    val totalToks = r.map(_._3).sum.toDouble
    val (small, big) = (bySize.head, bySize.last)
    assert(small._4 > small._3 / totalToks - 1e-9, "small source upweighted")
    assert(big._4 < big._3 / totalToks + 1e-9, "large source downweighted")
    // alpha = 1 recovers proportional sampling exactly
    val prop = TextAnalytics.mixWeights(spark, sf, alpha = 1.0)
      .as[(String, Long, Long, Double, Double)].collect()
    prop.foreach { case (_, _, toks, w, _) =>
      assert(math.abs(w - toks / totalToks) < 5e-7)
    }
  }

  test("bm25 matches an independent driver-side replay") {
    import spark.implicits._
    val query = TextAnalytics.bm25DefaultQuery
    val got = TextAnalytics.bm25(spark, sf, query, k = 15)
      .as[(Long, Double)].collect().toSeq
    // replay: same tokenizer, same formula, same rounding, driver-side
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val tok = "[\\p{L}\\p{N}_]+".r
    val toks = docs.map { case (id, t) => id -> tok.findAllIn(t.toLowerCase).toVector }
    val n = toks.length.toDouble
    val avgdl = toks.map(_._2.length.toLong).sum.toDouble / toks.length
    val dfm = query.map(q => q -> toks.count(_._2.contains(q)).toDouble).toMap
    val k1 = 1.2; val b = 0.75
    def score(tk: Vector[String]): Double = {
      val dl = tk.length
      val raw = query.foldLeft(0.0) { (acc, q) =>
        val tf = tk.count(_ == q).toDouble
        val df = dfm(q)
        acc + math.log((n - df + 0.5) / (df + 0.5) + 1.0) *
          (tf * (k1 + 1)) / (tf + k1 * ((1 - b) + b * dl / avgdl))
      }
      BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = toks.map { case (id, tk) => (id, score(tk)) }
      .filter(_._2 > 0).sortBy { case (id, s) => (-s, id) }.take(15).toSeq
    assert(got == want)
    // degenerate guards
    intercept[IllegalArgumentException](TextAnalytics.bm25Of(
      Seq((1L, "a")).toDF("doc_id", "text"), Seq.empty))
    // a term absent from the corpus contributes nothing: df = 0 makes
    // every tf 0 → excluded rows only
    val none = TextAnalytics.bm25Of(
      Seq((1L, "alpha beta")).toDF("doc_id", "text"), Seq("zzz_missing"))
    assert(none.count() == 0)
  }

  test("vocab coverage: hand fixture, and oov rate monotone in vocab size") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "a a b"),
      (2L, "en", "a c"),
      (3L, "fr", "b b d e"),
      (4L, "de", "")
    ).toDF("doc_id", "lang", "text")
    // top-2 vocab = {a, b} (3 each; ties broken by term)
    val got = TextAnalytics.vocabCoverageOf(docs, v = 2)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("en", 2L, 5L, 1L, 0.2),    // doc 2's "c" is OOV
      ("fr", 1L, 4L, 2L, 0.5)))   // "d e" OOV; empty de doc drops out
    // real corpus: rates in [0,1] and shrinking the vocab can only
    // raise (or keep) each language's OOV rate
    val wide = TextAnalytics.vocabCoverage(spark, sf, v = 100)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._5).toMap
    val narrow = TextAnalytics.vocabCoverage(spark, sf, v = 10)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(wide.nonEmpty && wide.keySet == narrow.keySet)
    wide.foreach { case (lang, r) =>
      assert(r >= 0.0 && r <= 1.0, s"$lang rate in range")
      assert(narrow(lang) >= r - 1e-9, s"$lang monotone under smaller vocab")
    }
  }

  test("zipf fit matches a driver-side least-squares replay") {
    import spark.implicits._
    val got = TextAnalytics.zipfFit(spark, sf)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got.nonEmpty)
    // replay: same tokenizer, same rank cut, plain least squares
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"lang", $"text").as[(String, String)].collect()
    val tok = "[\\p{L}\\p{N}_]+".r
    val counts = docs.flatMap { case (l, t) =>
      tok.findAllIn(t.toLowerCase).map(l -> _)
    }.groupBy(identity).view.mapValues(_.length).toMap
    got.foreach { case (lang, nTerms, slope, intercept, r2) =>
      val ranked = counts.collect { case ((l, term), n) if l == lang => (term, n) }
        .toSeq.sortBy { case (term, n) => (-n, term) }.take(500)
      assert(nTerms == ranked.length)
      val xy = ranked.zipWithIndex.map { case ((_, n), i) =>
        (math.log(i + 1.0), math.log(n.toDouble)) }
      val (mx, my) = (xy.map(_._1).sum / xy.length, xy.map(_._2).sum / xy.length)
      val sxx = xy.map(p => (p._1 - mx) * (p._1 - mx)).sum
      val sxy = xy.map(p => (p._1 - mx) * (p._2 - my)).sum
      val syy = xy.map(p => (p._2 - my) * (p._2 - my)).sum
      assert(math.abs(slope - sxy / sxx) < 1e-4, s"$lang slope")
      assert(math.abs(intercept - (my - sxy / sxx * mx)) < 1e-4, s"$lang intercept")
      assert(math.abs(r2 - sxy * sxy / (sxx * syy)) < 1e-4, s"$lang r2")
      // freq is non-increasing in rank by construction, so the fit
      // slopes down; R² stays a valid fraction (the synthetic corpus
      // is deliberately NOT Zipfian — near-flat heads give small R²,
      // which is exactly the drift signal the operator exists to show)
      assert(slope < 0, s"$lang slope $slope should be negative")
      assert(r2 >= 0.0 && r2 <= 1.0, s"$lang r2 $r2")
    }
  }

  test("weighted sample matches the A-ES replay and excludes zero weights") {
    import spark.implicits._
    val got = TextAnalytics.weightedSample(spark, sf, k = 20)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(got.length == 20)
    // driver replay: same md5-derived uniform, same key, same order
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)].collect()
    val tok = "[\\p{L}\\p{N}_]+".r
    val md = java.security.MessageDigest.getInstance("MD5")
    def u32(s: String): Long = {
      val hex = md.digest(s"11:$s".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val want = docs.flatMap { case (id, lang, t) =>
      val w = tok.findAllIn(t.toLowerCase).length
      if (w == 0) None else {
        val key = -math.log((u32(t) + 1.0) / 4294967296.0) / w
        Some((id, lang, w.toLong, key))
      }
    }.sortBy { case (id, _, _, key) => (key, id) }.take(20)
      .map { case (id, lang, w, key) =>
        (id, lang, w, BigDecimal(key).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSeq
    assert(got == want)
    // deterministic: a second run returns the identical sample
    assert(TextAnalytics.weightedSample(spark, sf, k = 20)
      .as[(Long, String, Long, Double)].collect().toSeq == got)
    // zero-weight docs can never be drawn
    val fixture = Seq((1L, "en", "some words here"), (2L, "en", ""))
      .toDF("doc_id", "lang", "text")
    assert(TextAnalytics.weightedSampleOf(fixture, k = 10)
      .as[(Long, String, Long, Double)].collect().map(_._1).toSeq == Seq(1L))
  }

  test("prefix groups: fixture savings arithmetic and short-doc grouping") {
    import spark.implicits._
    // docs 1-3 share a 4-token prefix; 4-5 are identical 2-token docs
    // (shorter than p, grouped on whole text); 6 is unique; 7 is empty
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox sleeps today"),
      (3L, "the quick brown fox"),
      (4L, "hello world"),
      (5L, "hello world"),
      (6L, "entirely different text"),
      (7L, "")
    ).toDF("doc_id", "text")
    val got = TextAnalytics.prefixGroupsOf(docs, p = 4, k = 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    // group A: 3 docs × 4-token prefix → saves 2·4 = 8
    // group B: 2 docs × 2-token prefix → saves 1·2 = 2
    assert(got.map(g => (g._2, g._3, g._4)) == Seq((4L, 3L, 8L), (2L, 2L, 2L)))
    // the empty and unique docs never form groups
    assert(got.map(_._3).sum == 5L)
    // corpus smoke: savings are positive multiples of the group size
    val real = TextAnalytics.prefixGroups(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    real.foreach { case (_, len, n, saved) =>
      assert(n >= 2 && saved == (n - 1) * len)
    }
  }

  test("length buckets: fixture ladder walk and corpus accounting") {
    import spark.implicits._
    def text(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(10, 16, 17, 100, 5000).zipWithIndex
      .map { case (n, i) => (i.toLong, text(n)) }.toDF("doc_id", "text")
    val got = TextAnalytics.lengthBucketsOf(docs, batch = 2)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (16L, 2L, 1L, 26L, 32L, 0.1875),     // 10 and 16 share a batch
      (32L, 1L, 1L, 17L, 32L, 0.46875),    // 17 rounds up to 32
      (128L, 1L, 1L, 100L, 128L, 0.21875),
      // 5000 tokens truncate to the 4096 top rung: zero pad waste
      (4096L, 1L, 1L, 4096L, 4096L, 0.0)))
    // real corpus: every doc lands in exactly one bucket, padding
    // never loses tokens, batch counts are the ceilings they claim
    val real = TextAnalytics.lengthBuckets(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(real.map(_._2).sum == nDocs)
    real.foreach { case (bucket, nd, nb, tot, pad, waste) =>
      assert(pad == nd * bucket && pad >= tot)
      assert(nb == (nd - 1) / 8 + 1)
      assert(waste >= 0.0 && waste < 1.0)
    }
  }

  test("ppl buckets: per-lang terciles partition docs, tail dropped, ranges ordered") {
    import spark.implicits._
    val got = TextAnalytics.pplBuckets(spark, sf)
      .as[(String, Long, Long, Double, Double, Long, Boolean)].collect().toSeq
    val langs = got.map(_._1).distinct
    val docsPerLang = graft.sources.Tables.documents(spark, sf)
      .groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    langs.foreach { lang =>
      val rows = got.filter(_._1 == lang).sortBy(_._2)
      // exactly the three ntile buckets, in order, tail flagged drop
      assert(rows.map(_._2) == Seq(1L, 2L, 3L), s"$lang buckets")
      assert(rows.map(_._7) == Seq(true, true, false), s"$lang keep flags")
      // buckets partition the language's docs with ntile's ±1 balance
      val sizes = rows.map(_._3)
      assert(sizes.sum == docsPerLang(lang), s"$lang doc total")
      assert(sizes.max - sizes.min <= 1, s"$lang tercile balance $sizes")
      // perplexity ranges are internally sane and non-overlapping
      // across ordered buckets (ties may touch at the boundary)
      rows.foreach { r => assert(r._4 <= r._5, s"$lang bucket ${r._2} bounds") }
      rows.sliding(2).foreach {
        case Seq(a, b) => assert(a._5 <= b._4, s"$lang ${a._2}->${b._2} overlap")
        case _ =>
      }
    }
  }

  test("dsir select: exact top-N cut, ranks a permutation, target lang favored") {
    import spark.implicits._
    val got = TextAnalytics.dsirSelect(spark, sf)
      .as[(Long, String, Long, Double, Long, Boolean)].collect().toSeq
    val n = got.size
    // ranks are a permutation of 1..n and the keep flag IS the rank cut
    assert(got.map(_._5).sorted == (1L to n).toSeq)
    assert(got.count(_._6) == math.min(TextAnalytics.DsirSelectN, n))
    got.foreach { r => assert(r._6 == (r._5 <= TextAnalytics.DsirSelectN)) }
    // rank order agrees with the (rounded) weight order
    val byRank = got.sortBy(_._5)
    byRank.sliding(2).foreach {
      case Seq(a, b) => assert(a._4 > b._4 || (a._4 == b._4 && a._1 < b._1))
      case _ =>
    }
    // the importance weight does its job: the target slice scores
    // higher on average and is over-represented in the keep set
    val (en, rest) = got.partition(_._2 == TextAnalytics.DsirTargetLang)
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    assert(mean(en.map(_._4)) > mean(rest.map(_._4)))
    val enKeepRate = en.count(_._6).toDouble / en.size
    val restKeepRate = rest.count(_._6).toDouble / rest.size
    assert(enKeepRate > restKeepRate)
  }

  test("shuffle shards: partition, dense sequences, balanced, deterministic, salt-sensitive") {
    import spark.implicits._
    val got = TextAnalytics.shuffleShards(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val total = graft.sources.Tables.documents(spark, sf).count()
    // every doc lands in exactly one shard
    assert(got.size.toLong == total)
    assert(got.map(_._3).distinct.size.toLong == total)
    val byShard = got.groupBy(_._1)
    assert(byShard.keySet == (0L until TextAnalytics.ShuffleShards).toSet)
    // within-shard sequences are dense 1..n_s
    byShard.foreach { case (s, rows) =>
      assert(rows.map(_._2).sorted == (1L to rows.size).toSeq, s"shard $s")
    }
    // a 32-bit hash spreads 500 docs roughly evenly: no shard may
    // hold more than twice the ideal share (a lax bound that still
    // catches a broken modulus or constant hash)
    val ideal = total.toDouble / TextAnalytics.ShuffleShards
    assert(byShard.values.map(_.size).max <= ideal * 2)
    // deterministic: a second run is byte-identical
    val again = TextAnalytics.shuffleShards(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(again == got)
    // and the order is actually shuffled, not id order
    val shard0Docs = byShard(0L).sortBy(_._2).map(_._3)
    assert(shard0Docs != shard0Docs.sorted)
  }

  test("sentence stats: crafted segmentation matches hand counts") {
    import spark.implicits._
    val df = Seq(
      (1L, "One two. Three four five! Six?"),
      (2L, "no terminal punctuation here"),
      (3L, "!!!...")
    ).toDF("doc_id", "text")
    val got = TextAnalytics.sentenceStatsOf(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    assert(got(1L) == ((3L, 2.0, 3L)), s"doc1: ${got(1L)}")
    assert(got(2L) == ((1L, 4.0, 4L)), "punctuation-less text is one sentence")
    assert(got(3L) == ((0L, 0.0, 0L)), "pure punctuation has no sentences")
  }

  test("code detect: structural punctuation flags code, spares prose") {
    import spark.implicits._
    val code = (1 to 8).map(i =>
      s"def f$i(x) {\n  return x + $i;\n}").mkString("\n")
    val prose = "This is a long plain paragraph of ordinary text " * 8
    val df = Seq(
      (1L, code, "repo"), (2L, prose, "web"), (3L, prose, "web")
    ).toDF("doc_id", "text", "source")
    val got = TextAnalytics.codeDetectOf(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("repo") == ((1L, 1L)), s"code not flagged: ${got("repo")}")
    assert(got("web") == ((2L, 0L)), s"prose misflagged: ${got("web")}")
  }

  test("Kneser-Ney bigram: P(.|v) sums to 1 over the vocab, surprisal orders repetitive < scrambled") {
    import spark.implicits._
    // rebuild the model statistics exactly as the operator does, on
    // the corpus, and integrate P(w|v) over the FULL vocab (unseen
    // (v,w) pairs contribute only backoff mass) — the normalization
    // that makes KN a probability model, not a score
    val d = TextAnalytics.KnDiscount
    val bi = graft.sources.Tables.documents(spark, sf)
      .select(explode(graft.functions.TextAnalysis.shingles(
        graft.functions.TextAnalysis.tokens($"text"), 2)).as("bg"))
    val bf = bi.groupBy($"bg").agg(count(lit(1)).as("cb"))
      .select(split($"bg", " ").getItem(0).as("prev"),
        split($"bg", " ").getItem(1).as("nxt"), $"cb")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val ctx = bf.groupBy(_._1._1).map { case (v, m) =>
      v -> (m.values.sum, m.size) }
    val cont = bf.groupBy(_._1._2).map { case (w, m) => w -> m.size }
    val types = bf.size.toDouble
    // vocab of continuation words; 20 contexts suffice (exact check per context)
    ctx.take(20).foreach { case (v, (cp, nfol)) =>
      val total = cont.map { case (w, nprec) =>
        math.max(bf.getOrElse((v, w), 0L).toDouble - d, 0.0) / cp +
          (d * nfol / cp) * (nprec / types)
      }.sum
      assert(math.abs(total - 1.0) < 1e-9, s"context $v integrates to $total")
    }
    // surprisal separates repetition from noise, as for the MLE twin
    val out = TextAnalytics.knBigram(spark, sf)
    assert(out.count() > 0)
    assert(out.filter($"kn_ppl" <= 0.0 || $"avg_kn_surprisal".isNull).count() == 0)
  }

  test("F2 sketch: state is 16 longs, estimate within 3x of exact, partition-invariant") {
    import spark.implicits._
    val r = TextAnalytics.f2Sketch(spark, sf).head()
    val (n, sk, est, exact) = (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))
    assert(sk.split(" ").length == TextAnalytics.F2Sketches)
    // each |S_i| <= n_tokens (sum of +-1 over the stream)
    assert(sk.split(" ").forall(s => math.abs(s.toLong) <= n))
    assert(exact >= n, "F2 >= n always (each f_t^2 >= f_t)")
    // 16-sketch mean: stderr ~ 0.35*F2; 3x is ~8 sigma, deterministic anyway
    assert(est > exact / 3 && est < exact * 3, s"est $est vs exact $exact")
    // sign sums are plain addition: a second evaluation (fresh jobs,
    // different task scheduling) reproduces the state bit-for-bit
    val r1 = TextAnalytics.f2Sketch(spark, sf).head()
    assert(r1.getString(1) == sk && r1.getLong(2) == est)
  }

  test("count-min replay: CMS bound holds, estimates exact at fixture density, partition-invariant") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha alpha alpha beta gamma"),
      (2L, "alpha beta beta delta epsilon zeta"),
      (3L, "alpha gamma gamma gamma eta theta"),
      (4L, "beta beta iota kappa alpha")
    ).toDF("doc_id", "text")
    val rows = TextAnalytics.countMinReplayOf(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= TextAnalytics.CmsTopK)
    // the CMS contract: est >= exact for EVERY probe
    assert(rows.forall { case (_, n, est, over) => est >= n && over == est - n },
      s"CMS bound violated: ${rows.mkString(", ")}")
    // 10 distinct terms in 512 cells: no term collides on all 4 rows,
    // so every estimate is exact (deterministic given md5)
    assert(rows.forall(_._4 == 0L), s"unexpected collision: ${rows.mkString(", ")}")
    assert(rows.take(2).map(t => (t._1, t._2)).toSeq ==
      Seq(("alpha", 6L), ("beta", 5L)))
    // cell counts are a plain sum per cell — merge order can't matter
    val re = TextAnalytics.countMinReplayOf(df.repartition(7)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(re.toSeq == rows.toSeq, "sketch not partition-invariant")
  }

  test("inverted index: df band honored, postings bounded + ordered, native top-k == window route") {
    import spark.implicits._
    val df = Seq(
      (1L, "cat cat cat dog bird"),
      (2L, "cat dog dog fish"),
      (3L, "cat dog bird bird lion"),
      (4L, "cat wolf fish unique"),
      (5L, "cat bear")
    ).toDF("doc_id", "text")
    // dfCap=4 drops 'cat' (df=5, stopword-class); p=2 bounds postings
    val got = TextAnalytics.invertedIndexOf(df, dfCap = 4, p = 2, topTerms = 10)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byTerm = got.map(t => t._1 -> t).toMap
    assert(!byTerm.contains("cat"), "df cap must drop stopword-class terms")
    assert(!byTerm.contains("unique") && !byTerm.contains("wolf"),
      "df=1 terms retrieve nothing and must be dropped")
    // dog: tf 1@d1, 2@d2, 1@d3 -> top-2 postings (tf desc, doc asc) = 2:2, 1:1
    assert(byTerm("dog") == (("dog", 3L, 4L, "2:2 1:1")), s"${byTerm.get("dog")}")
    // bird: 1@d1, 2@d3 -> 3:2, 1:1
    assert(byTerm("bird") == (("bird", 2L, 3L, "3:2 1:1")))
    assert(got.forall(_._4.split(" ").length <= 2), "postings over cap")
    // the native bounded-heap route must match the window formulation
    val tf = df.select($"doc_id", explode(tokens($"text")).as("term"))
      .groupBy($"term", $"doc_id").agg(count(lit(1)).as("tf"))
    val stats = tf.groupBy($"term")
      .agg(count(lit(1)).as("df"), sum($"tf").cast("long").as("ttf"))
      .filter($"df".between(2, 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"term").orderBy($"tf".desc, $"doc_id".asc)
    val windowRoute = tf.join(stats, "term")
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 2)
      .groupBy($"term", $"df", $"ttf")
      .agg(array_join(transform(
        array_sort(collect_list(struct((-$"tf").as("negtf"), $"doc_id"))),
        x => concat(x.getField("doc_id").cast("string"), lit(":"),
          (-x.getField("negtf")).cast("string"))), " ").as("postings"))
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(got.toSet == windowRoute, "native top-k diverges from window route")
  }

  test("held-out ppl: token masses reconcile with the split report, ppls sane") {
    import spark.implicits._
    val rows = TextAnalytics.heldoutPpl(spark, sf)
      .as[(String, Long, Double, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    // the train/test token masses must be EXACTLY the split census's
    // (same salted hash, same tokenizer — shared by construction)
    val split = TextAnalytics.corpusSplit(spark, sf)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    rows.foreach { case (lang, nTr, pTr, nTe, pTe, gap) =>
      assert(nTr == split(("train", lang)), s"$lang train mass")
      assert(nTe == split(("test", lang)), s"$lang test mass")
      // add-1 unigram ppl is >= 1 and finite; vocab bounds it above
      // by N+V+1 (the uniform-OOV worst case)
      assert(pTr >= 1.0 && pTe >= 1.0, s"$lang ppl degenerate")
      assert(!pTr.isNaN && !pTe.isNaN && !pTr.isInfinite && !pTe.isInfinite)
      assert(gap == pTe - pTr, s"$lang gap not the plain difference")
      // held-out ppl should exceed train self-ppl on every language:
      // unseen tokens only ever cost MORE than seen ones on a corpus
      // this size (pinning the direction guards the join polarity —
      // a swapped train/test would flip it)
      assert(gap > 0.0, s"$lang held-out not above train: $pTr vs $pTe")
    }
  }

  test("held-out ppl: a language with no test split surfaces, not silently dropped") {
    import spark.implicits._
    // build the fixture FROM the operator's own salted hash: probe
    // candidate texts for their split bucket, then give lang xx
    // train-only texts and lang yy both sides (round-10 advice — the
    // inner join dropped exactly the coverage failure the operator
    // exists to catch)
    val withH = (0 until 400).map(i => s"word$i alpha beta").toDF("text")
      .select($"text", pmod(md5i32($"text", 17), lit(100)).as("h"))
      .as[(String, Long)].collect()
    val trainTexts = withH.filter(_._2 < 80).map(_._1)
    val testTexts = withH.filter(_._2 >= 90).map(_._1)
    assert(trainTexts.length >= 5 && testTexts.length >= 3)
    val docs = (trainTexts.take(5).map(("xx", _)) ++
      trainTexts.slice(5, 10).map(("yy", _)) ++
      testTexts.take(3).map(("yy", _))).toSeq.toDF("lang", "text")
    val rows = TextAnalytics.heldoutPplOf(docs).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("xx", "yy"))
    val xx = rows.find(_.getString(0) == "xx").get
    assert(xx.getLong(3) == 0L && xx.isNullAt(4) && xx.isNullAt(5),
      "missing test split must surface as an explicit zero/null row")
    val yy = rows.find(_.getString(0) == "yy").get
    assert(yy.getLong(3) > 0L && !yy.isNullAt(4) && !yy.isNullAt(5))
  }
}
