package graft

import org.scalatest.funsuite.AnyFunSuite

/** The facade must work on arbitrary caller frames — nothing here
  * touches the harness testdata layout. */
class GraftFacadeSpec extends AnyFunSuite with SparkSpec {

  test("reference queries + DOT run on a caller-provided movies frame") {
    import spark.implicits._
    val movies = Seq(
      (1L, "alpha", Seq("x", "y", "z")),
      (2L, "beta", Seq("x", "y")),
      (3L, "gamma", Seq("x"))
    ).toDF("id", "title", "actors")
    val levels = Graft.titleLevels(movies, "alpha")
    assert(levels.collect().map(_.getString(0)).toSeq == Seq("gamma", "beta"))
    val dot = Graft.dotGraph(levels, "alpha")
    assert(dot.startsWith("digraph MovieGraph {"))
    assert(Graft.actorCoactors(movies, "x").count() == 2) // y, z
    // batched forms: one scan, per-probe rows tagged by `probe`
    val tb = Graft.titleLevelsBatch(movies, Seq("alpha", "beta"))
      .select("probe", "name").collect().map(r => (r.getString(0), r.getString(1)))
    assert(tb.count(_._1 == "alpha") == 2 && tb.count(_._1 == "beta") == 2)
    assert(Graft.actorCoactorsBatch(movies, Seq("x", "z")).count() == 4) // x→{y,z}, z→{x,y}
  }

  test("quarantined movies ingest: planted bad rows surface, good side is the plain read") {
    import spark.implicits._
    // a caller CSV with malformed rows planted among the good ones:
    // a blank-ish all-comma line, a missing title, a missing id —
    // plus a quoted title containing a comma (must stay GOOD)
    val dir = java.nio.file.Files.createTempDirectory("graft_movies_q").toString
    val csv = Seq(
      "MovieID,Title,Actor1,Actor2",
      "1,alpha,x,y",
      ",,,",                    // all-empty → quarantine
      "2,,x,y",                 // missing title → quarantine
      ",beta,x,",               // missing id → quarantine
      "3,\"gamma, the movie\",z,", // quoted comma — good
      "4,delta,x,z").mkString("\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "movies.csv"),
      csv.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val (good, bad) = Graft.readMoviesCsvQuarantined(spark, dir)
    // good side == the plain front-door read, bit for bit
    val plain = Graft.readMoviesCsv(spark, dir)
    assert(good.collect().toSet == plain.collect().toSet)
    assert(good.count() == 3) // alpha, gamma, delta
    val gamma = good.filter($"id" === "3").head()
    assert(gamma.getString(1) == "gamma, the movie")
    assert(gamma.getSeq[String](2) == Seq("z"))
    // every planted bad row is in the dead-letter frame with content
    val q = bad.as[String].collect().sorted.toSeq
    assert(q.size == 3, s"quarantine rows: $q")
    assert(q.exists(_.contains("beta")) && q.exists(_.startsWith("2,")))
    // the split is a partition of the scan: good + bad == raw lines
    assert(good.count() + bad.count() == 7 - 1) // minus header
    // downstream reference query runs unchanged on the good side
    assert(Graft.titleLevels(good, "alpha").count() == 1) // delta shares x
  }

  test("near-dedup pipeline runs on a caller-provided docs frame") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away home"
    val docs = Seq(
      (1L, base),
      (2L, base + " tonight"),           // near-dup of 1
      (3L, "completely different words entirely unrelated to anything else here now")
    ).toDF("doc_id", "text")
    val pairs = Graft.nearDupPairs(docs, threshold = 0.5)
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    val clusters = Graft.dedupClusters(pairs)
    assert(clusters.collect().map(r => (r.getLong(0), r.getLong(1))).toMap ==
      Map(1L -> 1L, 2L -> 1L))
  }

  test("knn runs on a caller-provided embeddings frame") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val nn = Graft.knn(emb, numProbes = 1, k = 2).collect()
    // probe 0: nearest is 1 (same direction), then 2 (orthogonal)
    assert(nn.map(_.getLong(2)).toSeq == Seq(1L, 2L))
  }

  test("k-means + semantic dedup run on a caller-provided embeddings frame") {
    import spark.implicits._
    // two tight direction clusters in 2-D
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.95f, 0.05f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(0.05f, 0.95f))
    ).toDF("vec_id", "embedding")
    val model = Graft.trainKmeans(emb, k = 2, iters = 3)
    assert(model.nonEmpty && model.forall(_.cv.length == 2))
    val obj = Graft.kmeansObjective(emb, model)
    assert(obj >= -1e-9 && obj < 0.5, s"objective $obj not tight")
    val pairs = Graft.semanticDedupPairs(emb, model, threshold = 0.9)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // within-direction pairs survive; cross-direction cosines ~0
    assert(pairs == Set((0L, 1L), (2L, 3L)), s"pairs $pairs")
  }

  test("attribution pairs run on caller-provided event frames") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val clicks = Seq((1L, 10L, t("2024-01-01 10:00:00"), 0.0))
      .toDF("user_id", "event_id", "ts", "value")
    val purchases = Seq(
      (1L, 20L, t("2024-01-01 10:10:00"), 5.0),  // within 30 min
      (1L, 21L, t("2024-01-01 11:10:00"), 7.0),  // outside
      (2L, 22L, t("2024-01-01 10:10:00"), 9.0))  // other user
      .toDF("user_id", "event_id", "ts", "value")
    val got = Graft.attributionPairs(clicks, purchases).collect()
    assert(got.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((10L, 20L)))
  }

  test("CDC applyChanges merges U/D/I on a caller-provided base") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val changes = Seq(
      (2L, "U", null.asInstanceOf[String], 25.0), // payload subset override
      (3L, "D", null.asInstanceOf[String], 0.0),
      (4L, "I", "d", 40.0))
      .toDF("k", "op", "name", "v")
    val merged = Graft.applyChanges(base, changes, "k")
      .orderBy($"k").as[(Long, String, Double)].collect().toSeq
    assert(merged == Seq((1L, "a", 10.0), (2L, "b", 25.0), (4L, "d", 40.0)))
  }

  test("pagerank runs on a caller-provided edge frame") {
    import spark.implicits._
    // star: hub 0 pointed at by 1,2,3 (and back) — hub must rank top
    val edges = Seq(("0", "1"), ("1", "0"), ("0", "2"), ("2", "0"),
      ("0", "3"), ("3", "0")).toDF("src", "dst")
    val nodes = Seq("0", "1", "2", "3").toDF("a")
    val r = Graft.pagerank(edges, nodes).orderBy($"r".desc)
      .as[(String, Double)].collect()
    assert(r.head._1 == "0" && r.head._2 > r(1)._2)
    assert(math.abs(r.map(_._2).sum - 1.0) < 1e-4) // no dangling: mass conserved
  }

  test("gap-fill and range join run on caller-provided frames") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq((1L, t("2024-02-01 09:00:00"), 4.0),
      (1L, t("2024-02-03 09:00:00"), 6.0))
      .toDF("user_id", "ts", "value")
    val filled = Graft.gapFillDaily(ev).as[(Long, String, Long, Double)].collect()
    assert(filled.map(_._2).toSeq ==
      Seq("2024-02-01", "2024-02-02", "2024-02-03"))
    assert(filled(1)._3 == 0L && filled(1)._4 == 4.0)
    val iv = Seq((7L, t("2024-02-01 00:00:00"), t("2024-02-02 00:00:00")))
      .toDF("iv", "s", "e")
    val hits = Graft.rangeJoin(ev, "ts", iv, "s", "e", bucketDays = 1).collect()
    assert(hits.length == 1 && hits.head.getAs[Long]("user_id") == 1L)
  }

  test("winnowing fingerprints run on a caller-provided docs frame") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "totally other words that never overlap with the first document text"))
      .toDF("doc_id", "text")
    val fp = Graft.winnowFingerprints(docs).as[(Long, Long, Long, Long)].collect()
    assert(fp.length == 2 && fp.forall(_._2 >= 1))
  }

  test("round-5 batch-3 facade entries run on caller frames") {
    import spark.implicits._
    import java.sql.Timestamp
    val docs = Seq(
      (1L, "aa bb aa bb cc", "en"),
      (2L, "aa bb aa", "en"),
      (3L, "dd ee dd ee dd", "de")).toDF("doc_id", "text", "lang")
    // packing: 5+3 en tokens in ctx=4 bins; token mass conserved
    val pack = Graft.seqPackStats(docs, ctx = 4, shards = 1)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(pack("en")._3 == 8 && pack("de")._3 == 5)
    assert(pack("en")._4 * 4 == pack("en")._3 + pack("en")._5)
    // chunking: doc 1 has 5 tokens -> chunks at 1 and 4 (stride 3)
    val ch = Graft.docChunks(docs.select($"doc_id", $"text"),
      chunk = 4, stride = 3)
      .filter($"doc_id" === 1L).select($"start_tok", $"n_chunk_tokens")
      .as[(Long, Long)].collect().toSeq
    assert(ch == Seq((1L, 4L), (4L, 2L)))
    // profiling on an arbitrary frame
    val prof = Graft.profileColumns(
      Seq((1.0, "a"), (2.0, "b")).toDF("v", "s"), Seq("v"), Seq("s"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(prof == Map("v" -> 2L, "s" -> 2L))
    // SCD2 over a caller change log
    val hist = Graft.scd2History(Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "a"),
      (1L, Timestamp.valueOf("2024-01-02 00:00:00"), 2L, "b"))
      .toDF("key", "ts", "seq", "attr"))
      .select($"version", $"attr", $"is_current")
      .as[(Long, String, Boolean)].collect().toSeq
    assert(hist == Seq((1L, "a", false), (2L, "b", true)))
    // quantized knn ~ exact knn on a trivially separable frame
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    assert(Graft.knnQuantized(emb, numProbes = 1, k = 2)
      .collect().map(_.getLong(2)).toSeq == Seq(1L, 2L))
    // BPE: 'aa' repeated most -> first merge is its char pair; encode
    // then spends one symbol less per merged occurrence
    val merges = Graft.bpeMerges(docs, steps = 1)
      .as[(Long, String, Long)].collect()
    assert(merges.head._2 == "a a" && merges.head._3 == 4L)
    val enc = Graft.bpeEncodeStats(docs, steps = 1)
      .as[(Long, Long, Double)].head()
    assert(enc._1 == 26L && enc._2 == 26L - 4L)
  }

  test("dup spans + mix weights run on caller-provided frames") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "w x y z q a b"),
      (2L, "en", "p w x y z q r"),
      (3L, "de", "k l m n o")
    ).toDF("doc_id", "lang", "text")
    // docs 1 and 2 share exactly one 5-token span "w x y z q"
    val ds = Graft.dupSpans(docs.select($"doc_id", $"text"), k = 5)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(ds == Map(1L -> ((3L, 1L)), 2L -> ((3L, 1L)), 3L -> ((1L, 0L))))
    val top = Graft.topDupSpans(docs.select($"doc_id", $"text"), k = 5)
      .as[(String, Long)].collect().toSeq
    assert(top == Seq(("w x y z q", 2L)))
    val mw = Graft.mixWeights(docs, alpha = 1.0)
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    // α=1: proportional to tokens (en 14, de 5)
    assert(math.abs(mw("en") - 14.0 / 19) < 1e-6)
    assert(math.abs(mw("de") - 5.0 / 19) < 1e-6)
  }

  test("bm25, vocab coverage, and length buckets run on caller frames") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "spark spark join fast"),
      (2L, "en", "join window"),
      (3L, "fr", "entirely unrelated words")
    ).toDF("doc_id", "lang", "text")
    // doc 1 hits "spark" twice + "join"; doc 2 hits "join" once with
    // a shorter dl — both rank, doc 3 never appears
    val hits = Graft.bm25(docs.select($"doc_id", $"text"),
      Seq("spark", "join"), k = 10).as[(Long, Double)].collect()
    assert(hits.map(_._1).toSet == Set(1L, 2L))
    assert(hits.head._1 == 1L, "two-term doc outranks one-term doc")
    assert(hits.forall(_._2 > 0))
    // v = 3 vocab: {join (2), fast/spark... ties by term} — just
    // assert the accounting identity on a caller frame
    val vc = Graft.vocabCoverage(docs, v = 3)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(vc.map(_._1).toSeq.sorted == Seq("en", "fr"))
    vc.foreach { case (_, nd, tot, oov, rate) =>
      assert(oov <= tot && nd >= 1)
      assert(math.abs(rate - math.rint(oov.toDouble / tot * 1e6) / 1e6) < 1e-9)
    }
    val lb = Graft.lengthBuckets(docs.select($"doc_id", $"text"), batch = 2)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    // all three docs are <= 16 tokens: one bucket, two batches
    assert(lb.toSeq == Seq((16L, 3L, 2L, 9L, 48L, 0.8125)))
  }

  test("zipf fit and weighted sample run on caller frames") {
    import spark.implicits._
    // "a" appears 4×, "b" 2×, "c" 1× in en — a strictly decreasing
    // head, so the fit slopes down with a defined R²
    val docs = Seq(
      (1L, "en", "a a b c"),
      (2L, "en", "a a b")
    ).toDF("doc_id", "lang", "text")
    val zf = Graft.zipfFit(docs, v = 10)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(zf.map(_._1) == Seq("en") && zf.head._2 == 3L)
    assert(zf.head._3 < 0 && zf.head._5 >= 0 && zf.head._5 <= 1)
    val ws = Graft.weightedSample(docs, k = 1)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(ws.length == 1 && Set(1L, 2L).contains(ws.head._1))
    assert(ws.head._4 > 0)
    // per-stratum reservoir on the same frame: k=1 keeps exactly the
    // smallest-keyed doc per language
    val rs = Graft.reservoirPerKey(docs, k = 1)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(rs.length == 1 && rs.head._1 == "en" && rs.head._2 == 1L)
    assert(rs.head._3 == ws.head._1) // same A-ES keys → same winner
  }

  test("quantile sketch runs on a caller frame; exact below capacity") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", 10L), (2L, "en", 20L), (3L, "en", 30L), (4L, "en", 40L)
    ).toDF("doc_id", "lang", "n_chars")
    val qs = Graft.quantileSketch(docs, s = 16)
      .as[(String, Long, Long, Long)].collect().toSeq
    // m=4 < s: the sample is the whole group, so ranks ⌈4p/100⌉ pick
    // 10 (p25), 20 (p50), 30 (p75), 40 (p90) exactly
    assert(qs == Seq(("en", 25L, 4L, 10L), ("en", 50L, 4L, 20L),
      ("en", 75L, 4L, 30L), ("en", 90L, 4L, 40L)))
  }

  test("PQ train + compressed search run on a caller embeddings frame") {
    import spark.implicits._
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    val books = Graft.trainPq(emb)
    assert(books.length == graft.operators.Similarity.PqSubspaces)
    books.foreach { cs =>
      assert(cs.nonEmpty && cs.length <= graft.operators.Similarity.PqCodes)
      cs.foreach(c => assert(c.cv.length == graft.operators.Similarity.PqSubDims))
    }
    val got = Graft.knnCompressed(emb, books, numProbes = 20, k = 5)
    // the facade route IS the catalog operator: same frame, same
    // cached training inputs → identical rows
    val catalog = graft.operators.Similarity.knnPq(spark, sf, numProbes = 20, k = 5)
    assert(got.collect().toSeq == catalog.collect().toSeq)
  }

  test("corpus-curation facade entries run on caller frames") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the big cat sat on the warm mat and the dog ran", "en", "s1", 47L),
      (2L, "the big cat sat on the warm mat and the dog ran", "en", "s1", 47L),
      (3L, "le chat le chien le jardin et la maison", "fr", "s2", 39L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Graft.gopherRules(docs).count() === 6L)
    val soft = Graft.softDedupWeights(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(soft("s1") === 1.0 && soft("s2") === 1.0) // dups halve, unique keeps
    assert(Graft.curriculumStages(docs)
      .agg(org.apache.spark.sql.functions.sum($"n_docs"))
      .collect().head.getLong(0) === 3L)
    assert(Graft.ngramNovelty(docs).count() === 2L)
    assert(Graft.tokenizerFertility(docs).count() === 2L)
    assert(Graft.spanCorruption(docs).count() === 3L)
    assert(Graft.charEntropy(docs).count() === 3L)
    assert(Graft.splitLeakage(docs).count() === 0L) // dups share a split
    assert(Graft.trainQualityClassifier(docs).count() ===
      graft.operators.CorpusQuality.ClfDims + 3L)
    assert(Graft.langIdChargram(docs)
      .agg(org.apache.spark.sql.functions.sum($"n_docs"))
      .collect().head.getLong(0) === 3L)
    val card = Graft.datasetCard(docs)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(card("docs") === 3.0 && card("sources") === 2.0)
    val ewma = Graft.ewmaSmooth(Seq(
      ("P", java.sql.Date.valueOf("2024-01-01"), 50.0),
      ("P", java.sql.Date.valueOf("2024-01-02"), 50.0))
      .toDF("priority", "day", "revenue")).collect()
    assert(ewma.forall(_.getDouble(3) === 50.0))
  }

  test("round-10 batch facade entries run on caller frames") {
    import spark.implicits._
    import java.sql.Timestamp
    // graph pair: square diagonals predicted, perfect-partition Q
    val und = Seq((1, 2), (2, 3), (3, 4), (4, 1))
    val edges = (und ++ und.map(_.swap)).map { case (a, b) => (a.toLong, b.toLong) }
      .toDF("src", "dst")
    assert(Graft.linkPredict(edges).count() === 2L)
    val labels = Seq(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L).toDF("a", "lbl")
    assert(Graft.modularity(edges, labels).columns.toSeq ===
      Seq("n_arcs", "n_communities", "largest_comm", "q"))
    // events: two-step timeline -> one transition row
    val ev = Seq((1L, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "A"),
      (1L, Timestamp.valueOf("2024-01-01 00:01:00"), 2L, "B"))
      .toDF("user_id", "ts", "event_id", "event_type")
    assert(Graft.markovTransitions(ev).count() === 1L)
    // orders: single-cohort curve
    val orders = Seq((1L, Timestamp.valueOf("1995-01-10 00:00:00"), 100.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    assert(Graft.cohortLtv(orders).count() === 1L)
    // docs: tuning card has one row per grid point; denylist shape
    val docs = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    assert(Graft.lshTuning(docs).count() ===
      graft.operators.Dedup.LshGrid.length.toLong)
    assert(Graft.blocklistFilter(docs).count() ===
      graft.operators.CorpusQuality.BlocklistTerms.length + 1L)
    // batch-3/4 entries: A/B + conversion over events, forecast over
    // a daily frame, assortativity over the square (regular -> NaN)
    val ev2 = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), "signup", 1.0),
      (1L, Timestamp.valueOf("2024-01-02 00:00:00"), "purchase", 5.0),
      (2L, Timestamp.valueOf("2024-01-01 00:00:00"), "purchase", 7.0))
      .toDF("user_id", "ts", "event_type", "value")
    assert(Graft.conversionLag(ev2).count() === 1L)
    assert(Graft.abTest(ev2).columns.contains("t_stat"))
    val daily = Seq(
      (java.sql.Date.valueOf("2024-01-01"), BigDecimal(100)),
      (java.sql.Date.valueOf("2024-01-08"), BigDecimal(120)))
      .toDF("day", "rev")
      .select($"day", $"rev".cast("decimal(18,2)").as("rev"))
    assert(Graft.forecastBaseline(daily).count() === 1L)
    assert(Graft.assortativity(edges).as[(Long, Long, Long, Double)]
      .head()._4.isNaN) // square is 2-regular: zero variance
    // square: 4 wedges, 0 triangles, both coefficients exactly 0
    assert(Graft.clusteringCoeff(edges)
      .as[(Long, Long, Double, Double)].head() === ((4L, 0L, 0.0, 0.0)))
    // perfectly separated scores: AUC = 1
    val scored = Seq((1.0, false), (2.0, false), (3.0, true))
      .toDF("score", "label")
    assert(Graft.auc(scored)
      .as[(Long, Long, Long, Double)].head() === ((3L, 1L, 2L, 1.0)))
    // batch-6 facade entries on caller frames
    val cat = Seq(("a", "x"), ("a", "x"), ("b", "y")).toDF("c1", "c2")
    assert(Graft.chiSquare(cat, "c1", "c2").count() === 1L)
    assert(Graft.fdCheck(cat, "c1", "c2")
      .as[(String, Long, Long, Boolean, Double)].head()._4) // c1 -> c2 holds
    val evs = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "a"),
      (1L, Timestamp.valueOf("2024-01-01 00:01:00"), 2L, "b"),
      (1L, Timestamp.valueOf("2024-01-01 00:02:00"), 3L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    assert(Graft.eventPaths(evs).as[(String, Long, Double)].head() ===
      (("a>b>c", 1L, 1.0)))
    val act = Seq((1L, java.sql.Date.valueOf("2024-01-01")),
      (1L, java.sql.Date.valueOf("2024-02-01")),
      (2L, java.sql.Date.valueOf("2024-01-15"))).toDF("id", "d")
    // id 1 censored at age 1 (active in the final month), id 2
    // churned at age 0
    assert(Graft.survivalHazard(act).count() === 2L)
    val dailyAcf = (1 to 4).map(i =>
      (java.sql.Date.valueOf(f"2024-01-0$i"),
        BigDecimal(if (i % 2 == 1) 100 else 200)))
      .toDF("day", "rev")
      .select($"day", $"rev".cast("decimal(18,2)").as("rev"))
    assert(Graft.acf(dailyAcf, maxLag = 1)
      .as[(Long, Long, Double)].head() === ((1L, 3L, -0.75)))
  }

  test("facade dpRelease is the production-randomness path, not the oracle replay") {
    import spark.implicits._
    val t = (s: String) => java.sql.Timestamp.valueOf(s)
    val events = Seq(
      ("click", t("2024-01-01 10:00:00"), 1L),
      ("click", t("2024-01-01 11:00:00"), 1L),
      ("click", t("2024-01-02 09:00:00"), 2L),
      ("view", t("2024-01-01 09:30:00"), 3L))
      .toDF("event_type", "ts", "user_id")
    val a = Graft.dpRelease(events, seed = Some(7L)).collect().toSeq
    val b = Graft.dpRelease(events, seed = Some(7L)).collect().toSeq
    assert(a == b, "caller-seeded release must be reproducible")
    val replay = graft.operators.Relational.dpReleaseOf(events).collect().toSeq
    assert(a.map(r => (r.getString(0), r.getDate(1))) ==
      replay.map(r => (r.getString(0), r.getDate(1))), "same release cells")
    assert(a != replay, "facade must not use the public hash-noise stream")
  }
}
