package graft

import org.apache.spark.sql.{Column, DataFrame}

/** User-facing facade: the library's operator surface over CALLER
  * frames, independent of the test harness's `(spark, sfDir)` layout.
  * A user of the reference engine switches by pointing these at their
  * own tables:
  *
  * {{{
  *   import graft.Graft
  *   val movies = Graft.readMoviesCsv(spark, "imdb.csv")   // (id, title, actors)
  *   Graft.titleLevels(movies, "The Matrix")               // the Title query
  *   Graft.actorCoactors(movies, "Keanu Reeves")           // the Actor query
  *   Graft.dotGraph(Graft.titleLevels(movies, t), t)       // the PNG-able DOT text
  *
  *   val docs = spark.read.parquet("docs")                  // (doc_id, text)
  *   Graft.nearDupPairs(docs)                               // MinHash+LSH, verified
  *   Graft.dedupClusters(Graft.nearDupPairs(docs))          // survivors per cluster
  *   Graft.knn(spark.read.parquet("emb"), numProbes = 8)    // cosine top-k
  * }}}
  *
  * Every delegate is documented (semantics, oracle, 100 TB posture)
  * at its implementation site.
  */
object Graft {

  // -- reference-parity queries ------------------------------------

  /** Quote-aware CSV → `(id, title, actors: array<string>)`. */
  def readMoviesCsv(spark: org.apache.spark.sql.SparkSession, path: String,
                    hasHeader: Boolean = true): DataFrame =
    sources.Ingest.readMoviesCsv(spark, path, hasHeader)

  /** [[readMoviesCsv]] plus a dead-letter frame: `(good, quarantined)`
    * — `good` is bit-for-bit the plain read; `quarantined` carries one
    * `_quarantined` raw-content row per line the ingest filter
    * rejected (missing id/title), so malformed rows are reviewable
    * instead of silently dropped at the library's front door. */
  def readMoviesCsvQuarantined(spark: org.apache.spark.sql.SparkSession,
                               path: String, hasHeader: Boolean = true): (DataFrame, DataFrame) =
    sources.Ingest.readMoviesCsvQuarantined(spark, path, hasHeader)

  /** Movies sharing cast with `title`, leveled by overlap (≤4). */
  def titleLevels(movies: DataFrame, title: String): DataFrame =
    operators.ReferenceQueries.titleLevelsOn(movies, title)

  /** Co-actors of `actor`, leveled by shared-movie count (≤4). */
  def actorCoactors(movies: DataFrame, actor: String): DataFrame =
    operators.ReferenceQueries.actorCoactorsOn(movies, actor)

  /** N title probes in ONE corpus scan (`(probe, name, cnt, level)`):
    * the explode+equi-join serve shape — probe casts tier-gated
    * broadcast, overlap as a per-(probe, movie) count. */
  def titleLevelsBatch(movies: DataFrame, titles: Seq[String]): DataFrame =
    operators.ReferenceQueries.titleLevelsBatchOn(movies, titles)

  /** N actor probes in ONE corpus scan (`(probe, name, cnt, level)`). */
  def actorCoactorsBatch(movies: DataFrame, actors: Seq[String]): DataFrame =
    operators.ReferenceQueries.actorCoactorsBatchOn(movies, actors)

  /** Reference-shaped DOT digraph text for a leveled result. */
  def dotGraph(levels: DataFrame, rootLabel: String): String =
    sinks.DotGraph.fromLevels(levels, rootLabel)

  // -- dedup over (doc_id, text) frames ----------------------------

  /** Exact dedup groups on a content hash; min-`idCol` survivor. */
  def exactDedupGroups(df: DataFrame, key: Column, idCol: Column): DataFrame =
    operators.Dedup.exactDedupGroups(df, key, idCol)

  /** Verified near-duplicate pairs via banded MinHash LSH. */
  def nearDupPairs(docs: DataFrame, threshold: Double = 0.8): DataFrame =
    operators.Dedup.minHashNearDupsOf(docs, threshold)

  /** SimHash candidate pairs within a Hamming radius. */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    operators.Dedup.simHashNearDupsOf(docs, maxHamming)

  /** Exhaustive n-gram Jaccard pairs (inverted index, df cap). */
  /** Directed containment pairs |A∩B|/min(|A|,|B|) ≥ `threshold`
    * over df-capped shingles (catches short-doc-inside-long-doc dups
    * Jaccard misses). */
  def containmentPairs(docs: DataFrame, threshold: Double = 0.8,
                       dfCap: Int = 50): DataFrame =
    operators.Dedup.containmentPairsOf(docs, threshold, dfCap)

  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.5,
                        dfCap: Int = 50): DataFrame =
    operators.Dedup.ngramJaccardPairsOf(docs, threshold, dfCap)

  /** Connected components over a pair frame → `(id, label)`. */
  def dedupClusters(pairs: DataFrame): DataFrame =
    operators.Dedup.connectedComponents(pairs)

  /** Winnowing (MOSS) fingerprints per document: distinct window-min
    * shingle hashes, `(doc_id, n_fp, fp_min, fp_sum)`. */
  def winnowFingerprints(docs: DataFrame, w: Int = 4): DataFrame =
    operators.TextAnalytics.winnowFingerprintOf(docs, w)

  /** Sequence-packing audit over `(doc_id, text, lang)`: per-language
    * context-window bins, padding, and boundary-straddling docs when
    * each (lang, shard) stream is packed in doc_id order. */
  def seqPackStats(docs: DataFrame, ctx: Int = 512,
                   shards: Int = 4): DataFrame =
    operators.TextAnalytics.seqPackOf(docs, ctx, shards)

  /** Overlapping token-window chunks of `(doc_id, text)` — one row
    * per chunk with token count and md5 content hash. */
  def docChunks(docs: DataFrame, chunk: Int = 64,
                stride: Int = 48): DataFrame =
    operators.TextAnalytics.docChunkOf(docs, chunk, stride)

  /** BPE tokenizer training, `steps` merge rounds over the corpus's
    * word-frequency dictionary → the `(step, pair, freq)` merge table. */
  def bpeMerges(docs: DataFrame, steps: Int = 3): DataFrame =
    operators.TextAnalytics.bpeTrainOf(docs, steps)

  /** Encode the corpus with `steps` trained BPE merges and report
    * the compression (symbols before/after, avg symbols per word). */
  def bpeEncodeStats(docs: DataFrame, steps: Int = 3): DataFrame =
    operators.TextAnalytics.bpeEncodeOf(docs, steps)

  /** Deterministic content-hash train/val/test split accounting —
    * reproducible under resharding/incremental growth, and exact dups
    * can never straddle the train/eval boundary. */
  def corpusSplit(docs: DataFrame, trainPct: Int = 80,
                  valPct: Int = 10): DataFrame =
    operators.TextAnalytics.corpusSplitOf(docs, trainPct, valPct)

  /** Cross-document duplicate-span signal per doc: of its `k`-token
    * spans, how many appear verbatim in at least one OTHER document
    * (`doc_id, n_spans, n_dup_spans, dup_fraction`). */
  def dupSpans(docs: DataFrame, k: Int = 5): DataFrame =
    operators.TextAnalytics.dupSpansOf(docs, k)

  /** The most-shared `k`-token span texts with distinct-doc counts —
    * the boilerplate list read when tuning exact-substring dedup. */
  def topDupSpans(docs: DataFrame, k: Int = 5, topN: Int = 20): DataFrame =
    operators.TextAnalytics.topDupSpansOf(docs, k, topN)

  /** Temperature-tempered source sampling weights (p_i ∝ tokens_i^α)
    * and expected per-epoch document draws at `budget`. */
  def mixWeights(docs: DataFrame,
                 alpha: Double = operators.TextAnalytics.MixAlphaDefault,
                 budget: Long = 100000L): DataFrame =
    operators.TextAnalytics.mixWeightsOf(docs, alpha, budget)

  /** The composed preprocessing chain (quality → exact dedup →
    * MinHash near-dedup → decontaminate → mix+pack accounting) over
    * any `(doc_id, lang, text)` frame: one survivorship row per
    * (stage, lang) — the audit log a curation run is judged by. */
  def preprocessingPipeline(docs: DataFrame): DataFrame =
    operators.Pipeline.pipelineOf(docs)

  /** Okapi BM25 top-`k` doc ids + scores for a lexical query. */
  def bm25(docs: DataFrame, query: Seq[String], k: Int = 15): DataFrame =
    operators.TextAnalytics.bm25Of(docs, query, k)

  /** Per-language OOV accounting against the corpus's top-`v` vocab. */
  def vocabCoverage(docs: DataFrame, v: Int = 100): DataFrame =
    operators.TextAnalytics.vocabCoverageOf(docs, v)

  /** Fixed-ladder sequence-length bucket plan (docs, batches, pad
    * waste per rung) for inference batching. */
  def lengthBuckets(docs: DataFrame, batch: Int = 8): DataFrame =
    operators.TextAnalytics.lengthBucketsOf(docs, batch)

  /** Top-`k` shared-`p`-token-prefix groups ranked by KV-cache
    * token savings (prefix-cache batch planning). */
  def prefixGroups(docs: DataFrame, p: Int = 16, k: Int = 20): DataFrame =
    operators.TextAnalytics.prefixGroupsOf(docs, p, k)

  /** Per-language Zipf fit (ln freq vs ln rank slope/intercept/R²)
    * over each language's top-`v` terms. */
  def zipfFit(docs: DataFrame, v: Int = 500): DataFrame =
    operators.TextAnalytics.zipfFitOf(docs, v)

  /** Deterministic weighted sample (Efraimidis–Spirakis, weight =
    * token count, md5-derived uniforms) of `k` documents. */
  def weightedSample(docs: DataFrame, k: Int = 20): DataFrame =
    operators.TextAnalytics.weightedSampleOf(docs, k)

  /** Weighted reservoir PER stratum: `k` Efraimidis–Spirakis winners
    * per language via the native bounded-heap top-k operator (one
    * shuffle on `lang`, no per-partition sort, ≤ k·strata rows out). */
  def reservoirPerKey(docs: DataFrame, k: Int = 10): DataFrame =
    operators.TextAnalytics.reservoirPerKeyOf(docs, k)

  /** Per-language `n_chars` quantile estimates (p25/50/75/90) from a
    * bounded bottom-`s`-by-hash sample — mergeable like KMV, exact
    * oracle replay unlike `approx_percentile`; O(s·strata) state. */
  def quantileSketch(docs: DataFrame, s: Int = 256): DataFrame =
    operators.TextAnalytics.quantileSketchOf(docs, s)

  // -- corpus curation over (doc_id, text[, lang, source]) frames ---

  /** Gopher rule suite: per-rule failure counts/rates + `any_rule`. */
  def gopherRules(docs: DataFrame): DataFrame =
    operators.CorpusQuality.gopherRulesOf(docs)

  /** SoftDeDup down-weighting: per-source effective docs/tokens from
    * reciprocal n-gram-commonness weights. Needs a `source` column. */
  def softDedupWeights(docs: DataFrame, n: Int = 3): DataFrame =
    operators.CorpusQuality.softDedupWeightsOf(docs, n)

  /** Curriculum staging by z-cut lexical difficulty. Needs `lang`. */
  def curriculumStages(docs: DataFrame): DataFrame =
    operators.CorpusQuality.curriculumStagesOf(docs)

  /** Per-source n-gram novelty (exclusive-vocabulary fraction).
    * Needs a `source` column. */
  def ngramNovelty(docs: DataFrame, n: Int = 3): DataFrame =
    operators.CorpusQuality.ngramNoveltyOf(docs, n)

  /** Per-language tokenizer fertility (subwords/word, chars/subword).
    * Needs `lang`. */
  def tokenizerFertility(docs: DataFrame): DataFrame =
    operators.CorpusQuality.tokenizerFertilityOf(docs)

  /** T5 span-corruption mask accounting (hash-keyed, reproducible). */
  def spanCorruption(docs: DataFrame, rate: Int = 6): DataFrame =
    operators.CorpusQuality.spanCorruptionOf(docs, rate)

  /** Per-document character-entropy quality signal. */
  def charEntropy(docs: DataFrame): DataFrame =
    operators.CorpusQuality.charEntropyOf(docs)

  /** All-pairs source-overlap estimates from per-source KMV sketches
    * — a |sources|-row sketch join, never a corpus pair join. Needs
    * `source, text`. */
  def kmvSourceOverlap(docs: DataFrame, k: Int = 256): DataFrame =
    operators.TextAnalytics.kmvSourceOverlapOf(docs, k)

  /** Kneser-Ney smoothed bigram surprisal per document — integer
    * model statistics, probabilities oracle-exact. */
  def knBigram(docs: DataFrame): DataFrame =
    operators.TextAnalytics.knBigramOf(docs)

  /** AMS F₂ (self-join size) sketch of the term stream — 16 longs of
    * addition-merged state, exact twin included as the diagnostic. */
  def f2Sketch(docs: DataFrame): DataFrame =
    operators.TextAnalytics.f2SketchOf(docs)

  /** Count-Min frequency sketch with md5 rows (every counter
    * oracle-replayable); estimates for the exact top-k terms. */
  def countMinReplay(docs: DataFrame): DataFrame =
    operators.TextAnalytics.countMinReplayOf(docs)

  /** df-capped inverted index with bounded posting lists (native
    * per-key top-k heap). */
  def invertedIndex(docs: DataFrame, dfCap: Int = operators.TextAnalytics.IndexDfCap,
                    p: Int = operators.TextAnalytics.IndexPostings): DataFrame =
    operators.TextAnalytics.invertedIndexOf(docs, dfCap, p)

  /** HyperLogLog distinct-shingle estimate per language — md5
    * registers, state and estimate oracle-exact. */
  def hllDistinct(docs: DataFrame): DataFrame =
    operators.TextAnalytics.approxDistinctOf(docs)

  /** Leave-one-out target encoding audit over a `(segment, x)` frame
    * — the leakage-safe categorical encoder. */
  def targetEncode(rows: DataFrame): DataFrame =
    operators.Relational.targetEncodeOf(rows)

  /** Near-dup pairs straddling the content-hash train/val/test
    * boundary — the eval-leakage audit. */
  def splitLeakage(docs: DataFrame, n: Int = 3, dfCap: Int = 16,
                   minShared: Long = 2L): DataFrame =
    operators.CorpusQuality.splitLeakageOf(docs, n, dfCap, minShared)

  /** Train the logistic-regression quality classifier; returns the
    * `(dim, weight)` model rows. Needs `doc_id, text`. */
  def trainQualityClassifier(docs: DataFrame): DataFrame =
    operators.CorpusQuality.qualityClassifierOf(docs)

  /** Char-trigram (Cavnar–Trenkle) language-ID confusion matrix.
    * Needs `lang` (profiles are learned from the labels). */
  def langIdChargram(docs: DataFrame): DataFrame =
    operators.CorpusQuality.langIdChargramOf(docs)

  /** One-query dataset card: (metric, value) datasheet rows. Needs
    * `lang, source, n_chars`. */
  def datasetCard(docs: DataFrame): DataFrame =
    operators.CorpusQuality.datasetCardOf(docs)

  /** Model-in-the-loop curation chain: Gopher gate → trained
    * classifier at the high-confidence margin, per-(stage, lang)
    * survivorship rows. Needs `doc_id, text, lang`. */
  def curationPipeline(docs: DataFrame): DataFrame =
    operators.CorpusQuality.curationPipelineOf(docs)

  /** Gate-sensitivity sweep: survivorship at each candidate
    * classifier decision threshold (trains once per session via the
    * weight memo). Needs `doc_id, text, lang`. */
  def thresholdSweep(docs: DataFrame): DataFrame =
    operators.CorpusQuality.thresholdSweepOf(docs)

  /** Data-constrained epoch allocation: per-source epochs and
    * decayed effective-token value under a fixed training budget.
    * Needs `source, text`. */
  def epochAllocation(docs: DataFrame): DataFrame =
    operators.CorpusQuality.epochAllocationOf(docs)

  /** Context-window budget card: fit/truncation accounting per
    * candidate window. Needs `text`. */
  def contextLenFit(docs: DataFrame): DataFrame =
    operators.CorpusQuality.contextLenFitOf(docs)

  /** Content-defined chunking report: per-source chunk counts and
    * duplicated-chunk fraction. Needs `doc_id, text, source`. */
  def rollingHashChunks(docs: DataFrame): DataFrame =
    operators.CorpusQuality.rollingHashChunksOf(docs)

  /** Cross-source near-dup matrix over the MinHash pair stream.
    * Needs `doc_id, text, source`. */
  def crossSourceDupes(docs: DataFrame, threshold: Double = 0.8): DataFrame =
    operators.Dedup.crossSourceDupesOf(docs, threshold)

  /** Temperature-scaled source mixture weights (w ∝ p^τ).
    * Needs `source, text`. */
  def mixtureTemperature(docs: DataFrame): DataFrame =
    operators.CorpusQuality.mixtureTemperatureOf(docs)

  /** Top principal component of an embedding cloud by distributed
    * power iteration. Needs `embedding: array<float|double>`. */
  def embedPca(embeddings: DataFrame): DataFrame =
    operators.Similarity.embedPcaOf(embeddings)

  /** Top-2 covariance spectrum (deflated power iteration) with the
    * λ₂/λ₁ isotropy ratio. Needs `embedding`. */
  def embedSpectrum(embeddings: DataFrame): DataFrame =
    operators.Similarity.embedSpectrumOf(embeddings)

  /** Per-document sentence-structure stats (count / mean / max words
    * per sentence). Needs `doc_id, text`. */
  def sentenceStats(docs: DataFrame): DataFrame =
    operators.TextAnalytics.sentenceStatsOf(docs)

  /** Code-vs-prose census per source (structural-punctuation gate).
    * Needs `text, source`. */
  def codeDetect(docs: DataFrame): DataFrame =
    operators.TextAnalytics.codeDetectOf(docs)

  /** MinHash dedup threshold-sensitivity sweep over the verified
    * pair stream. Needs `doc_id, text`. */
  def dedupSweep(docs: DataFrame): DataFrame =
    operators.Dedup.dedupSweepOf(docs)

  /** LSH banding planner card: for each (bands, rows) factorization
    * of the signature budget, the soft threshold and the expected
    * caught-pair mass over the corpus's own similarity distribution —
    * pick (b, r) from 5 numbers instead of 5 dedup re-runs. */
  def lshTuning(docs: DataFrame): DataFrame =
    operators.Dedup.lshTuningOf(docs)

  /** Denylist screen: per-term whole-word document hit counts plus
    * the `__any__` row a remove-on-any policy would drop. */
  def blocklistFilter(docs: DataFrame): DataFrame =
    operators.CorpusQuality.blocklistFilterOf(docs)

  /** ROC-AUC of any `(score: double, label: boolean)` frame via the
    * grouped rank-sum — exact BIGINT U statistic, tie-aware, one
    * window over the score grid (never the corpus). */
  def auc(scored: DataFrame): DataFrame =
    operators.CorpusQuality.aucOf(scored)

  /** Top word pairs by pointwise mutual information over corpus
    * bigrams (min-count floored) — collocation / MWE mining. Needs
    * `doc_id, text`. */
  def pmiCollocations(docs: DataFrame,
                      minCount: Int = operators.TextAnalytics.PmiMinCount,
                      k: Int = operators.TextAnalytics.PmiTopK): DataFrame =
    operators.TextAnalytics.pmiCollocationsOf(docs, minCount, k)

  // -- relational / time-series over caller frames ------------------

  /** Truncated-EWMA smoothing of a `(priority, day, revenue)`
    * series (adjust=True, 14 trailing observations). */
  def ewmaSmooth(daily: DataFrame): DataFrame =
    operators.TimeSeries.ewmaOf(daily)

  /** CDC apply: merge a `U`/`D`/`I` change batch into `base` on
    * `key` with one full-outer join (the MERGE INTO shape). */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String,
                   opCol: String = "op"): DataFrame =
    operators.Relational.applyChanges(base, changes, key, opCol)

  /** One-pass column census: null count, exact distinct cardinality,
    * and numeric min/max/mean per chosen column. */
  def profileColumns(df: DataFrame, numericCols: Seq[String],
                     categoricalCols: Seq[String] = Nil): DataFrame =
    operators.Relational.columnProfileOf(df, numericCols, categoricalCols)

  /** ε-DP noisy-count histogram release over `(event_type, ts,
    * user_id)` events: per-user-per-cell contribution capping bounds
    * the sensitivity, then Laplace noise from REAL randomness
    * (`rand()`, or the caller's seed for run-to-run reproducibility —
    * a released seed voids the guarantee) — the released frame never
    * carries the true counts. The deterministic hash-seeded variant
    * (`Relational.dpReleaseOf`) exists ONLY for the differential
    * oracle: its noise is a public function of the cell key, so it
    * provides no privacy. */
  def dpRelease(events: DataFrame, seed: Option[Long] = None): DataFrame =
    operators.Relational.dpReleaseRandom(events, seed)

  /** SCD type-2 history build from an append-only `(key, ts, seq,
    * attr)` change log: one version row per change with
    * [valid_from, valid_to) validity and an is_current flag. */
  def scd2History(changes: DataFrame): DataFrame =
    operators.TimeSeries.scd2Of(changes)

  /** Daily calendar gap-fill + forward fill over `(user_id, ts,
    * value)`; each key expands only to its OWN [min, max] span. */
  def gapFillDaily(events: DataFrame): DataFrame =
    operators.TimeSeries.gapFillDailyOf(events)

  /** First-order Markov transition matrix of an event stream
    * `(user_id, ts, event_id, event_type)` → per (prev, cur) pair
    * the step count and row-normalized probability. */
  def markovTransitions(events: DataFrame): DataFrame =
    operators.TimeSeries.markovTransitionsOf(events)

  /** Cumulative LTV curve by first-order-month cohort over
    * `(o_custkey, o_orderdate, o_totalprice)` → (cohort, age,
    * n_customers, cum_revenue, ltv) for ages 0..`maxAge` months. */
  def cohortLtv(orders: DataFrame,
                maxAge: Int = operators.Relational.LtvMaxAge): DataFrame =
    operators.Relational.cohortLtvOf(orders, maxAge)

  /** Welch two-sample A/B readout over `(user_id, event_type,
    * value)`: deterministic hash-split arms, decimal-exact moment
    * sums, bit-identical t statistic. */
  def abTest(events: DataFrame): DataFrame =
    operators.Relational.abTestOf(events)

  /** Signup→purchase time-to-convert histogram (whole days) over
    * `(user_id, ts, event_type)`. */
  def conversionLag(events: DataFrame): DataFrame =
    operators.Relational.conversionLagOf(events)

  /** Seasonal-naive (ŷ = y₋₇ by DATE) backtest of a `(day, rev)`
    * daily series → per-ISO-weekday n/|err|/MAPE/sMAPE. */
  def forecastBaseline(daily: DataFrame): DataFrame =
    operators.TimeSeries.forecastBaselineOf(daily)

  /** Pearson χ² independence test (+ Cramér's V) between two
    * categorical columns of any frame; the full R×C grid including
    * empty cells, floor-scaled cell contributions. */
  def chiSquare(df: DataFrame, colA: String, colB: String): DataFrame =
    operators.Relational.chiSquareOf(df, colA, colB)

  /** Autocorrelation of a `(day, rev: decimal)` daily series at
    * calendar lags 1..maxLag (floor-mean centered, exact moments). */
  def acf(daily: DataFrame, maxLag: Int = operators.TimeSeries.AcfMaxLag): DataFrame =
    operators.TimeSeries.acfOf(daily, maxLag)

  /** Top-k 3-step event-type journeys over `(user_id, ts, event_id,
    * event_type)`. */
  def eventPaths(events: DataFrame, k: Int = 20): DataFrame =
    operators.TimeSeries.eventPathsOf(events, k)

  /** Censoring-aware discrete-time churn life-table over an
    * `(id, d)` activity frame: at-risk/churned/censored/hazard per
    * age month. */
  def survivalHazard(activity: DataFrame): DataFrame =
    operators.Relational.survivalHazardOf(activity)

  /** One functional-dependency audit row: does `det` determine
    * `dep` in this frame, and how badly not? */
  def fdCheck(df: DataFrame, det: String, dep: String): DataFrame =
    operators.Relational.fdAuditOf(s"$det->$dep", df, det, dep)

  /** Interval join without the cartesian: rows of `probe` whose
    * `tsCol` falls in `[startCol, endCol)` of `intervals`, via
    * fixed-width bucket decomposition + residual predicate. */
  def rangeJoin(probe: DataFrame, tsCol: String, intervals: DataFrame,
                startCol: String, endCol: String, bucketDays: Int = 7): DataFrame =
    operators.TimeSeries.rangeJoinOf(probe, tsCol, intervals, startCol, endCol, bucketDays)

  /** PageRank over a distinct directed edge frame `(src, dst)` and a
    * node frame `(a)` → `(a, r)`; deterministic-replay rounding.
    * `eps > 0` enables early exit once the per-iteration L1 rank
    * delta converges below it (iterations dominate cost at scale). */
  def pagerank(edges: DataFrame, nodes: DataFrame,
               iters: Int = 5, damping: Double = 0.85,
               eps: Double = 0.0): DataFrame =
    operators.Graph.pagerankOf(edges, nodes, iters, damping, eps)

  /** Degree-oriented exact triangle count over a directed edge frame
    * holding both arcs → one row (n_nodes, n_edges, n_triangles). */
  def triangleCount(edges: DataFrame, nodes: DataFrame): DataFrame =
    operators.Graph.triangleCountOf(edges, nodes)

  /** Frontier-iteration BFS: minimum hop distance (≤ `hops`) from the
    * `seed` node frame `(a)` over a directed edge frame → `(a, hop)`. */
  def khop(edges: DataFrame, seed: DataFrame, hops: Int): DataFrame =
    operators.Graph.khopOf(edges, seed, hops)

  /** Connected components by min-label propagation over a directed
    * edge frame `(src, dst)` (both arcs) and node frame `(a)` →
    * `(a, lbl)` with `lbl` the component's minimum node id. Fails
    * loudly if the fixpoint needs more than `maxRounds` rounds. */
  def connectedComponents(edges: DataFrame, nodes: DataFrame,
                          maxRounds: Int = operators.Graph.GraphMaxRounds): DataFrame =
    operators.Graph.ccOf(edges, nodes, maxRounds)

  /** k-core: iteratively peel nodes of remaining degree < k; returns
    * the surviving edge frame (empty when no k-core exists). */
  def kcore(edges: DataFrame, k: Int = operators.Graph.KCoreK,
            maxRounds: Int = operators.Graph.GraphMaxRounds): DataFrame =
    operators.Graph.kcoreOf(edges, k, maxRounds)

  /** Connected components by alternating large-star/small-star
    * contraction — same `(a, lbl)` contract as
    * [[connectedComponents]] but O(log n) rounds instead of
    * O(diameter); prefer it when the graph's diameter is unknown. */
  def connectedComponentsContract(edges: DataFrame, nodes: DataFrame,
                                  maxRounds: Int = operators.Graph.GraphMaxRounds): DataFrame =
    operators.Graph.ccContractOf(edges, nodes, maxRounds)

  /** Synchronous label-propagation communities over a directed edge
    * frame (both arcs) + nodes `(a)` → `(a, lbl)` after exactly
    * `rounds` rounds (min tie-break — fully deterministic). Splits
    * dense regions WITHIN a component, where [[connectedComponents]]
    * only answers reachability. */
  def labelPropagation(edges: DataFrame, nodes: DataFrame,
                       rounds: Int = operators.Graph.LpaRounds): DataFrame =
    operators.Graph.lpaOf(edges, nodes, rounds)

  /** Personalized PageRank: teleport (and dangling mass) go to the
    * `seeds` frame `(a)` instead of uniformly → `(a, r)`. The
    * "related to X" ranking; unreachable nodes score exactly 0. */
  def personalizedPagerank(edges: DataFrame, nodes: DataFrame,
                           seeds: DataFrame, iters: Int = 5,
                           damping: Double = 0.85): DataFrame =
    operators.Graph.pprOf(edges, nodes, seeds, iters, damping)

  /** Common-neighbor link prediction: top-k NON-adjacent pairs by
    * neighborhood Jaccard, two-path enumeration capped to sub-hub
    * intermediates (`hubCap` bounds the join blow-up at cap·|E|). */
  def linkPredict(edges: DataFrame, k: Int = operators.Graph.LinkPredTopK,
                  hubCap: Int = operators.Graph.LinkPredHubCap): DataFrame =
    operators.Graph.linkPredictOf(edges, k, hubCap)

  /** Newman modularity Q of a labeling `(a, lbl)` over a directed
    * arc frame (both arcs) → 1 row (n_arcs, n_communities,
    * largest_comm, q). Evaluates [[labelPropagation]]'s output:
    * Q > 0 means the partition beats chance. */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame =
    operators.Graph.modularityOf(edges, labels)

  /** Degree assortativity r over a directed arc frame (both arcs):
    * do hubs pair with hubs (r > 0) or the periphery (r < 0)?
    * NaN on a degree-regular graph (zero variance). */
  def assortativity(edges: DataFrame): DataFrame =
    operators.Graph.assortativityOf(edges)

  /** Global transitivity 3T/W and mean local clustering coefficient
    * over a directed arc frame (both arcs); degree-oriented wedge
    * enumeration, hub-safe. */
  def clusteringCoeff(edges: DataFrame): DataFrame =
    operators.Graph.clusteringCoeffOf(edges)

  /** Weighted PageRank over `(src, dst, wt)` arcs + nodes `(a)`:
    * contributions split along edge weight (r·w/W(u)); same
    * per-iteration plan and rounding contract as [[pagerank]]. */
  def pagerankWeighted(edges: DataFrame, nodes: DataFrame,
                       iters: Int = 5, d: Double = 0.85): DataFrame =
    operators.Graph.pagerankWeightedOf(edges, nodes, iters, d)

  // -- similarity over (vec_id, embedding) frames ------------------

  /** Unit-normalize embeddings (cache if reused). */
  def normalize(embeddings: DataFrame): DataFrame =
    operators.Similarity.normalizeOf(embeddings)

  /** Exact cosine top-k of the first `numProbes` ids vs the corpus. */
  def knn(embeddings: DataFrame, numProbes: Int = 5, k: Int = 10): DataFrame =
    operators.Similarity.knnExactOf(embeddings, numProbes, k)

  /** Two-stage ANN: int8 scalar-quantized corpus scan (top k·refine
    * by integer dot product), exact cosine re-rank of the survivors. */
  def knnQuantized(embeddings: DataFrame, numProbes: Int = 5, k: Int = 10,
                   refine: Int = 4): DataFrame =
    operators.Similarity.knnSqOf(embeddings, numProbes, k, refine)

  /** Train PQ sub-codebooks (8 subspaces × 16 Lloyd's centroids over
    * disjoint 8-dim slices) on a 64-dim embedding frame — the
    * compression half of the ANN ladder; pair with [[knnCompressed]]. */
  def trainPq(embeddings: DataFrame): Seq[Seq[operators.Clustering.Centroid]] =
    operators.Similarity.trainPqOf(
      operators.Similarity.normalizeOf(embeddings))

  /** ADC search with caller-trained PQ codebooks: candidates score by
    * code lookup-table sum — the corpus scan reads 8 small ints per
    * vector, never the vectors. */
  def knnCompressed(embeddings: DataFrame,
                    books: Seq[Seq[operators.Clustering.Centroid]],
                    numProbes: Int = 20, k: Int = 5): DataFrame =
    operators.Similarity.knnPqOf(embeddings, books, numProbes, k)

  // -- clustering over (vec_id, embedding) frames ------------------

  /** Distributed Lloyd's k-means over raw embeddings; returns the
    * trained centroid matrix (k·d doubles). */
  def trainKmeans(embeddings: DataFrame, k: Int = operators.Clustering.K,
                  iters: Int = operators.Clustering.Iters)
      : Seq[operators.Clustering.Centroid] =
    operators.Clustering.trainKmeansOf(
      operators.Similarity.normalizeOf(embeddings), k, iters)

  /** Build-once half of the persisted IVF index: train elsewhere
    * ([[trainKmeans]]), then write centroids + cell-partitioned
    * inverted lists as a parquet layout under `dir`. */
  def writeIvfIndex(embeddings: DataFrame,
                    model: Seq[operators.Clustering.Centroid],
                    dir: String): Unit =
    operators.Similarity.writeIvfIndex(normalize(embeddings), model, dir)

  /** Query-many half: serve cosine top-k from a mounted index
    * directory — never retrains, never reads the raw corpus. */
  def knnFromIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                   numProbes: Int = 20, k: Int = 5,
                   nprobe: Int = operators.Similarity.IvfNProbe): DataFrame =
    operators.Similarity.knnIvfServe(spark, dir, numProbes, k, nprobe)

  /** Lloyd's objective (mean squared distance to assigned centroid)
    * of a model over a corpus — for training/monitoring loops. */
  def kmeansObjective(embeddings: DataFrame,
                      model: Seq[operators.Clustering.Centroid]): Double =
    operators.Clustering.wcssOf(
      operators.Similarity.normalizeOf(embeddings), model)

  /** SemDeDup-style semantic near-dup pairs, candidates scoped to
    * shared k-means cells of `model`. Cells above `cellCap` members
    * are hash-sub-bucketed in the verify self-join, so one hot cell
    * never becomes one skewed join key. */
  def semanticDedupPairs(embeddings: DataFrame,
                         model: Seq[operators.Clustering.Centroid],
                         threshold: Double = 0.4,
                         cellCap: Int = operators.Clustering.CellJoinCap)
      : DataFrame =
    operators.Clustering.semDedupOf(
      operators.Similarity.normalizeOf(embeddings), model, threshold, cellCap)

  /** End-to-end semantic dedup with corpus-scaled k: counts the
    * corpus, trains k = [[operators.Clustering.kFor]](n) cells
    * (≈ n / 256, the capacity rule SemDeDup needs at scale — k is
    * not a constant), then scopes pairs to shared cells. */
  def semanticDedupAuto(embeddings: DataFrame,
                        threshold: Double = 0.4): DataFrame = {
    val e = operators.Similarity.normalizeOf(embeddings)
    val k = operators.Clustering.kFor(e.count())
    operators.Clustering.semDedupOf(
      e, operators.Clustering.trainKmeansOf(e, k), threshold)
  }

  // -- streaming transforms (apply to batch or watermarked stream) --

  def tumblingHourly(events: DataFrame): DataFrame =
    streaming.EventStreams.tumblingHourly(events)

  def slidingHourly(events: DataFrame): DataFrame =
    streaming.EventStreams.slidingHourly(events)

  def sessionCounts(events: DataFrame): DataFrame =
    streaming.EventStreams.sessionCounts(events)

  /** Daily distinct-user KMV sketch — bounded ≤ k-long state per
    * window on batch OR watermarked stream; sketch contents are
    * engine-neutral (md5 hash space), so results replay in plain SQL. */
  def dailyUsersKmv(events: DataFrame, k: Int = 64): DataFrame =
    streaming.EventStreams.dailyUsersKmv(events, k)

  /** Tumbling daily p25/50/75/90 of event `value` from a bounded
    * (hash, value)-pair sample — ≤ s pairs of state per open window
    * on batch OR watermarked stream, replayable in plain SQL. */
  def dailyValueQuantiles(events: DataFrame, s: Int = 64): DataFrame =
    streaming.EventStreams.dailyValueQuantiles(events, s)

  /** Stream-stream (or batch) click→purchase attribution pairs. */
  def attributionPairs(clicks: DataFrame, purchases: DataFrame): DataFrame =
    streaming.EventStreams.attributionPairs(clicks, purchases)

  /** Per-user funnel stages (view → click → purchase, first-after
    * semantics) — batch pass. */
  def funnelStages(events: org.apache.spark.sql.Dataset[streaming.FunnelEvent])
      : org.apache.spark.sql.Dataset[streaming.FunnelStageRow] =
    streaming.EventStreams.funnelStagesBatch(events)

  /** The same funnel over a stream: custom-state tracker, emits each
    * user's current stage per micro-batch (Update mode). */
  def funnelStagesStream(events: org.apache.spark.sql.Dataset[streaming.FunnelEvent])
      : org.apache.spark.sql.Dataset[streaming.FunnelStageRow] =
    streaming.EventStreams.funnelStagesStream(events)

  /** Ingest-time sequence packing over a `(doc_id, lang, n_tokens)`
    * document stream: O(1) per-language cursor state assigns each doc
    * its context-window bin; final on emission (Append mode). */
  def packStream(docs: org.apache.spark.sql.Dataset[streaming.PackDoc],
                 ctx: Int = 512): org.apache.spark.sql.Dataset[streaming.PackAssign] =
    streaming.EventStreams.packStream(docs, ctx)

  /** [[packStream]] at production parallelism: cursor state keyed
    * (lang, shard = doc_id % shards), so concurrent cursors scale
    * with langs × shards; bins never span shards. */
  def packStreamSharded(docs: org.apache.spark.sql.Dataset[streaming.PackDoc],
                        ctx: Int = 512, shards: Int = 4)
  : org.apache.spark.sql.Dataset[streaming.PackAssignShard] =
    streaming.EventStreams.packStreamSharded(docs, ctx, shards)

  // -- custom whole-operator tier ----------------------------------

  /** Per-key top-k via the native heap operator
    * ([[graft.plans.TopKPerKey]]) — partial+final bounded heaps, no
    * per-partition sort. `order` takes `col.desc` / `col.asc`.
    *
    * Memory contract: each exec task holds one k-row heap per
    * DISTINCT key in its partition — O(keys·k) rows — tracked
    * against `spark.graft.topKPerKey.spillBytes` (default 128 MiB).
    * Past the budget the heap map spills to key-sorted run files and
    * is streamed back through a k-way merge, so high key cardinality
    * degrades to sequential disk I/O instead of OOM (spill count and
    * bytes surface as SQL metrics on the exec node). */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                 k: Int): DataFrame =
    org.apache.spark.sql.GraftSqlBridge.topKPerKey(df, keys, order, k)
}
