package graft

import graft.operators.{Dedup, ReferenceQueries}
import graft.functions.TextAnalysis._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate inputs must degrade to empty results, not errors — the
  * behavior a pipeline stage needs when an upstream filter leaves
  * nothing. */
class DegenerateInputSpec extends AnyFunSuite with SparkSpec {

  test("near-dedup over an empty corpus yields no pairs") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val sets = empty.select($"doc_id",
      array_distinct(shingles(tokens($"text"), 3)).as("shs"))
      .filter(size($"shs") > 0)
    assert(Dedup.minHashSignatures(sets).count() == 0)
    assert(Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")).count() == 0)
  }

  test("round-5 operators degrade to empty on empty inputs") {
    import spark.implicits._
    import java.sql.Timestamp
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.operators.TextAnalytics.winnowFingerprintOf(noDocs).count() == 0)
    val noEvents = Seq.empty[(Long, Timestamp, Double)]
      .toDF("user_id", "ts", "value")
    assert(graft.operators.TimeSeries.gapFillDailyOf(noEvents).count() == 0)
    val iv = Seq((1L, Timestamp.valueOf("2024-01-01 00:00:00"),
      Timestamp.valueOf("2024-01-02 00:00:00"))).toDF("iv", "s", "e")
    assert(graft.operators.TimeSeries.rangeJoinOf(
      noEvents, "ts", iv, "s", "e").count() == 0)
    // empty change batch: merge is the identity
    val base = Seq((1L, "a")).toDF("k", "name")
    val noChanges = Seq.empty[(Long, String, String)].toDF("k", "op", "name")
    assert(graft.operators.Relational.applyChanges(base, noChanges, "k")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a")))
    // pagerank with no edges: every node is dangling, so its mass
    // redistributes uniformly right back — the uniform 1/n is the
    // fixed point (pre-round-6 the dangling mass leaked and every
    // node decayed to the bare teleport (1−d)/n)
    val nodes = Seq("x", "y").toDF("a")
    val noEdges = Seq.empty[(String, String)].toDF("src", "dst")
    val r = graft.operators.Graph.pagerankOf(noEdges, nodes, iters = 2)
      .as[(String, Double)].collect().toMap
    assert(r.keySet == Set("x", "y") && r.values.forall(v => math.abs(v - 0.5) < 1e-9))
  }

  test("round-6 operators degrade to empty on empty inputs") {
    import spark.implicits._
    val noDocs = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "lang", "text")
    val dt = noDocs.select($"doc_id", $"text")
    assert(graft.operators.TextAnalytics.bm25Of(dt, Seq("anything")).count() == 0)
    assert(graft.operators.TextAnalytics.vocabCoverageOf(noDocs).count() == 0)
    assert(graft.operators.TextAnalytics.lengthBucketsOf(dt).count() == 0)
    assert(graft.operators.TextAnalytics.zipfFitOf(noDocs).count() == 0)
    assert(graft.operators.TextAnalytics.weightedSampleOf(noDocs).count() == 0)
    assert(graft.operators.TextAnalytics.prefixGroupsOf(dt).count() == 0)
    assert(graft.operators.Dedup.containmentPairsOf(dt).count() == 0)
    // BFS from a seed with no edges: the seed itself, nothing else
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val khop = graft.operators.Graph.khopOf(noEdges, Seq(1L).toDF("a"), 3)
      .as[(Long, Long)].collect().toSeq
    assert(khop == Seq((1L, 0L)))
  }

  test("round-5 batch-3 operators degrade on empty/trivial inputs") {
    import spark.implicits._
    import java.sql.Timestamp
    val noDocs = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "lang")
    assert(graft.operators.TextAnalytics.seqPackOf(noDocs).count() == 0)
    assert(graft.operators.TextAnalytics
      .docChunkOf(noDocs.select($"doc_id", $"text")).count() == 0)
    // a doc with NO tokens produces no chunks but still packs (0 bins)
    val punct = Seq((1L, "!!! ...", "en")).toDF("doc_id", "text", "lang")
    assert(graft.operators.TextAnalytics
      .docChunkOf(punct.select($"doc_id", $"text")).count() == 0)
    val packed = graft.operators.TextAnalytics.seqPackOf(punct)
      .as[(String, Long, Long, Long, Long, Long)].head()
    assert(packed == (("en", 1L, 0L, 0L, 0L, 0L)))
    // SCD2 over an empty change log / a single change
    val noChanges = Seq.empty[(Long, Timestamp, Long, String)]
      .toDF("key", "ts", "seq", "attr")
    assert(graft.operators.TimeSeries.scd2Of(noChanges).count() == 0)
    val one = Seq((7L, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "a"))
      .toDF("key", "ts", "seq", "attr")
    val row = graft.operators.TimeSeries.scd2Of(one)
      .select($"version", $"valid_to".isNull, $"is_current").head()
    assert((row.getLong(0), row.getBoolean(1), row.getBoolean(2))
      == ((1L, true, true)))
    // profiling an all-null column reports n distinct = 0, null moments
    val nulls = Seq[(java.lang.Long, String)]((null, "x"), (null, "y"))
      .toDF("v", "s")
    val prof = graft.operators.Relational
      .columnProfileOf(nulls, Seq("v"), Nil).head()
    assert(prof.getLong(2) == 2L && prof.getLong(3) == 0L && prof.isNullAt(4))
  }

  test("title query over an empty movies frame is empty, not an error") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, Seq[String])].toDF("id", "title", "actors")
    assert(ReferenceQueries.titleLevelsOn(empty, "anything").count() == 0)
    assert(ReferenceQueries.actorCoactorsOn(empty, "anybody").count() == 0)
  }

  test("k-means degrades gracefully on tiny corpora, rejects empty ones") {
    import spark.implicits._
    import graft.operators.{Clustering, Similarity}
    // corpus smaller than k: the model just has corpus-many centroids
    val tiny = Similarity.normalizeOf(Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)), (3L, Seq(0.7f, 0.7f))
    ).toDF("vec_id", "embedding"))
    val m3 = Clustering.trainKmeansOf(tiny, k = 8, iters = 2)
    assert(m3.nonEmpty && m3.length <= 3)
    assert(Clustering.wcssOf(tiny, m3) >= -1e-9)
    // single-vector corpus: one centroid, unconditional assignment
    val one = Similarity.normalizeOf(
      Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding"))
    val m1 = Clustering.trainKmeansOf(one, k = 8, iters = 1)
    assert(m1.length == 1)
    assert(Clustering.semDedupOf(one, m1, 0.5).count() == 0)
    // empty corpus: rejected up front with a clear message
    val empty = Similarity.normalizeOf(
      Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding"))
    val e = intercept[IllegalArgumentException] {
      Clustering.trainKmeansOf(empty)
    }
    assert(e.getMessage.contains("non-empty corpus"))
  }

  test("PQ degrades gracefully on tiny corpora, rejects empty ones") {
    import spark.implicits._
    import graft.operators.Similarity
    // corpus smaller than the per-subspace code count: each
    // sub-codebook just has corpus-many centroids, search still works
    val emb = Seq(
      (0L, Array.fill(64)(1.0f).toSeq),
      (1L, Array.tabulate(64)(i => if (i < 32) 1.0f else 0.0f).toSeq),
      (2L, Array.tabulate(64)(i => if (i >= 32) 1.0f else 0.0f).toSeq)
    ).toDF("vec_id", "embedding")
    val books = Similarity.trainPqOf(Similarity.normalizeOf(emb))
    assert(books.length == Similarity.PqSubspaces)
    books.foreach(cs => assert(cs.nonEmpty && cs.length <= 3))
    val got = Similarity.knnPqOf(emb, books, numProbes = 2, k = 5)
      .select($"probe_id", $"neighbor_id").collect()
    // 2 probes over a 3-vector corpus: each sees the other 2 at most
    assert(got.nonEmpty && got.length <= 4)
    got.foreach(r => assert(r.getLong(0) != r.getLong(1)))
    // empty corpus: rejected up front by the training require
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.trainPqOf(Similarity.normalizeOf(empty))
    }
    assert(e.getMessage.contains("non-empty corpus"))
  }

  test("round-7 operators degrade to empty on empty inputs") {
    import spark.implicits._
    // the composed pipeline on an empty corpus: every stage is empty,
    // the accounting report has no rows, and nothing throws — the
    // contract a chained curation run needs when a source is dry
    val noDocs = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "lang", "text")
    assert(graft.operators.Pipeline.pipelineOf(noDocs).count() == 0)
    // skew-join demo over an empty fact side: empty join, empty rollup
    val noLi = Seq.empty[(Long, Double)].toDF("l_orderkey", "l_quantity")
    assert(graft.operators.Relational.skewJoinAqeOf(noLi).count() == 0)
  }

  test("documents shorter than the shingle width produce no shingles") {
    import spark.implicits._
    val got = Seq("one", "two words", "").toDF("text")
      .select(shingles(tokens($"text"), 3).as("s"))
      .select(size($"s")).as[Int].collect()
    assert(got.toSeq == Seq(0, 0, 0))
  }

  test("empty search input is rejected up front (P8)") {
    import spark.implicits._
    val m = Seq((1L, "t", Seq("a"))).toDF("id", "title", "actors")
    intercept[IllegalArgumentException](ReferenceQueries.titleLevelsOn(m, "  "))
    intercept[IllegalArgumentException](ReferenceQueries.actorCoactorsOn(m, ""))
  }

  test("curation operators degrade to empty/neutral on empty inputs") {
    import graft.operators.CorpusQuality
    import spark.implicits._
    val none = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // per-doc / per-key reports: empty in, empty out
    assert(CorpusQuality.spanCorruptionOf(none).count() == 0)
    assert(CorpusQuality.charEntropyOf(none).count() == 0)
    assert(CorpusQuality.softDedupWeightsOf(none).count() == 0)
    assert(CorpusQuality.ngramNoveltyOf(none).count() == 0)
    assert(CorpusQuality.splitLeakageOf(none).count() == 0)
    assert(CorpusQuality.tokenizerFertilityOf(none).count() == 0)
    assert(CorpusQuality.langIdChargramOf(none).count() == 0)
    assert(CorpusQuality.curriculumStagesOf(none).count() == 0)
    // corpus-level cards keep their fixed row shape with null/zero
    // values — a dashboards' empty state, not an error
    assert(CorpusQuality.gopherRulesOf(none).count() == 6)
    assert(CorpusQuality.datasetCardOf(none).count() == 9)
    // one-token docs: no shingles anywhere, everything still total
    val tiny = Seq((1L, "word", "en", "s", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(CorpusQuality.softDedupWeightsOf(tiny).collect().head.getDouble(3) == 1.0)
    assert(CorpusQuality.splitLeakageOf(tiny).count() == 0)
    assert(CorpusQuality.spanCorruptionOf(tiny).count() == 1)
  }

  test("round-9 operators degrade gracefully on empty / constant inputs") {
    import spark.implicits._
    val noDocs = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
    // mixing / budget / fit / chunking cards: empty in, empty out
    assert(graft.operators.CorpusQuality.mixtureTemperatureOf(noDocs).count() == 0)
    assert(graft.operators.CorpusQuality.epochAllocationOf(noDocs).count() == 0)
    assert(graft.operators.CorpusQuality.contextLenFitOf(noDocs).count() == 0)
    assert(graft.operators.CorpusQuality.rollingHashChunksOf(noDocs).count() == 0)
    assert(graft.operators.Dedup.crossSourceDupesOf(
      noDocs.select($"doc_id", $"text", $"source")).count() == 0)
    // an untrainable corpus (all empty text) yields the zero model,
    // and the sweep then reports full survivorship at z <= 0 of the
    // zero scores — not a crash
    val blank = Seq((1L, "", "en", "s")).toDF("doc_id", "text", "lang", "source")
    val w = graft.operators.CorpusQuality.trainedWeights(blank)
    assert(w.forall(_ == 0.0))
    assert(graft.operators.CorpusQuality.thresholdSweepOf(blank).count() ==
      graft.operators.CorpusQuality.SweepThresholds.size ||
      graft.operators.CorpusQuality.thresholdSweepOf(blank).count() == 0)
    // PCA family: empty cloud -> empty report; constant cloud -> zero
    // eigenvalue, zero explained fraction, no NaN anywhere
    val noVecs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(graft.operators.Similarity.embedPcaOf(noVecs).count() == 0)
    assert(graft.operators.Similarity.embedSpectrumOf(noVecs).count() == 0)
    val const = Seq((1L, Seq(1f, 2f, 3f)), (2L, Seq(1f, 2f, 3f)))
      .toDF("vec_id", "embedding")
    val pca = graft.operators.Similarity.embedPcaOf(const).collect()
    assert(pca.length == 3)
    pca.foreach { r =>
      assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0)
      assert(!r.getDouble(1).isNaN)
    }
  }

  test("round-10 batch operators degrade on empty/trivial inputs") {
    import spark.implicits._
    // empty frames: no crash, empty (or single NULL-aggregate) output
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val cc = graft.operators.Graph.clusteringCoeffOf(noEdges)
      .as[(Long, Long, Double, Double)].head()
    assert(cc._1 == 0L && cc._2 == 0L && cc._3.isNaN && cc._4.isNaN)
    val noScores = Seq.empty[(Double, Boolean)].toDF("score", "label")
    assert(graft.operators.CorpusQuality.aucOf(noScores).count() == 1L)
    val noDaily = Seq.empty[(java.sql.Date, BigDecimal)].toDF("day", "rev")
      .select($"day", $"rev".cast("decimal(18,2)").as("rev"))
    assert(graft.operators.TimeSeries.acfOf(noDaily).count() == 0)
    assert(graft.operators.TimeSeries.forecastBaselineOf(noDaily).count() == 0)
    val noEvents = Seq.empty[(Long, java.sql.Timestamp, Long, String)]
      .toDF("user_id", "ts", "event_id", "event_type")
    assert(graft.operators.TimeSeries.eventPathsOf(noEvents).count() == 0)
    val noActivity = Seq.empty[(Long, java.sql.Date)].toDF("id", "d")
    assert(graft.operators.Relational.survivalHazardOf(noActivity).count() == 0)
    // single-category chi-square: V is the guarded NaN, chi2 is zero
    val oneCat = Seq(("a", "x"), ("a", "y")).toDF("c1", "c2")
    val chi = graft.operators.Relational.chiSquareOf(oneCat, "c1", "c2")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(chi._3 == 0L && chi._4 == 0.0 && chi._5.isNaN)
    // single-day series: no interior candidate -> empty changepoint
    // frame is impossible by construction (k < n needs n >= 2), and
    // a 1-row ACF input yields zero lag pairs
    val oneDay = Seq((java.sql.Date.valueOf("2024-01-01"), BigDecimal(5)))
      .toDF("day", "rev")
      .select($"day", $"rev".cast("decimal(18,2)").as("rev"))
    assert(graft.operators.TimeSeries.acfOf(oneDay).count() == 0)
    // FD audit of an empty frame: zero groups, trivially holds
    val noRows = Seq.empty[(Long, Long)].toDF("a", "b")
    val fd = graft.operators.Relational.fdAuditOf("t", noRows, "a", "b")
      .as[(String, Long, Long, Boolean, Double)].head()
    assert(fd._2 == 0L && fd._4)
  }
}
