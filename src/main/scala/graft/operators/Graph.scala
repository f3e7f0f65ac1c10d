package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the co-actor graph the reference only ever
  * renders (`Code/movie_graph.erl` / `actor_graph.erl` draw it;
  * nothing computes on it). Connected components already power the
  * dedup clusterer ([[Dedup.nearDupClusters]]); this adds PageRank,
  * the canonical iterative bulk-synchronous computation.
  *
  * Scale posture: each iteration is ONE shuffle — an equi-join of the
  * edge list with the current ranks on `src` (degree is pre-joined
  * into the edge list once), then a partial+final sum on `dst`. No
  * adjacency matrix, no driver-side state beyond the loop counter;
  * the rank frame stays distributed and `localCheckpoint` truncates
  * the 5-iteration lineage. Determinism discipline (the k-means
  * precedent): ranks round to 8 decimals after every update, so the
  * whole run replays as chained CTEs in the oracle and both engines
  * agree bit-for-bit at the driver's %.9g compare.
  */
object Graph {

  // same keyed session cache the dedup/similarity operators use: the
  // edge list is re-read by every iteration of every call, so it is
  // built once per (session, input) and reused — not once per call
  private val frameCache = new graft.util.FrameCache()

  private def cached(stage: String, df: DataFrame): DataFrame =
    frameCache.getOrElseUpdate(df.sparkSession,
      graft.util.FrameCache.key(stage, df))(df.cache())

  /** Distinct directed co-actor edges (a→b and b→a both present) and
    * the all-nodes frame. The edges come from the MATERIALIZED
    * bucketed table ([[Tables.coActorEdgesBucketed]], round-10): the
    * explode → self-join → distinct derivation is a corpus shuffle
    * paid once at build time, after which every graph query — in this
    * session or any later one — reads a src-bucketed parquet layout
    * (no exchange on the edge side for src-keyed work). The scan is
    * additionally session-cached here so the five PageRank iterations
    * don't re-read parquet. Nodes still derive from the movies view
    * (isolated actors have no edges but keep their teleport mass). */
  private[graft] def coActorEdges(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val edges = cached("coactor-edges",
      Tables.coActorEdgesBucketed(spark, sfDir).select($"src", $"dst"))
    val nodes = cached("coactor-nodes", Tables.movies(spark, sfDir)
      .select(explode($"actors").as("a")).distinct())
    (edges, nodes)
  }

  /** [[coActorEdges]] with NUMERIC ids — the hash/compare type every
    * numeric graph kernel wants (actor ids are stringified part
    * keys). ONE session-cached frame shared by triangle counting,
    * clustering coefficients, k-hop, and assortativity, instead of
    * each entry re-deriving its own cast copy.
    *
    * Ids come out as the NARROWEST integral type the corpus admits —
    * int when every actor id fits (one memoized min/max aggregate,
    * [[actorIdsFitInt]]), long otherwise. The round-14 sf10 ablation
    * measured the edge exchanges byte-proportional to id width, so
    * the halving transfers to every consumer of this frame; round 15
    * extends the same decision to [[weightedEdges]]/[[longNodes]] so
    * the whole iterative family (cc, lpa, kcore, khop, modularity,
    * and all three pagerank walks) shuffles narrow ids too. */
  private[graft] def coActorEdgesLong(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = graphIdType(spark, sfDir)
    cached("coactor-edges-long", coActorEdges(spark, sfDir)._1
      .select($"src".cast(t).as("src"), $"dst".cast(t).as("dst")))
  }

  /** True iff every actor id in the corpus fits in an INT — decided
    * ONCE per (session, corpus version) by a min/max aggregate over
    * the node frame (every graph edge frame draws its endpoints from
    * this set, so the node bound covers them all). min/max directly,
    * never max(abs(id)): under non-ANSI eval abs(Long.MinValue) stays
    * negative and would let a Long.MinValue id slip past the guard
    * into a wrapping int cast (round-14 ADVICE). Narrowing is a
    * measured runtime decision, never a correctness assumption — a
    * corpus with ids past 2³¹ keeps longs. */
  private val fitsIntMemo = new graft.util.BoundedMemo[Boolean](64)

  private def actorIdsFitInt(spark: SparkSession, sfDir: String): Boolean = {
    import spark.implicits._
    val nodes = longNodesRaw(spark, sfDir)
    fitsIntMemo.getOrElseUpdate(
      graft.util.FrameCache.key("ids-fit-int", nodes), {
        val row = nodes.agg(min($"a"), max($"a")).head()
        !row.isNullAt(0) &&
          row.getLong(0) > Int.MinValue.toLong &&
          row.getLong(1) < Int.MaxValue.toLong
      })
  }

  /** The SQL type name graph id columns are cast to — "int" when the
    * corpus fits, else "long". One decision per corpus, shared by
    * every numeric edge/node builder below. */
  private def graphIdType(spark: SparkSession, sfDir: String): String =
    if (actorIdsFitInt(spark, sfDir)) "int" else "long"

  /** Narrows `(src, dst)` long node ids to INT when every id fits —
    * the triangle family's big intermediate is the edge stream with
    * adjacency ARRAYS attached (one exchange of Σ outdeg elements per
    * side), so element width is shuffle bytes 1:1: int ids halve the
    * exchange. Checked at runtime against the actual data (one cheap
    * MAX aggregate on the session-cached edge frame), so a corpus
    * whose keys exceed 2³¹ keeps longs — the narrowing is a measured
    * optimization, never a correctness assumption. Non-long frames
    * (string-id fixtures) pass through untouched. */
  private val narrowMemo = new graft.util.BoundedMemo[Boolean](64)

  private def narrowIds(edges: DataFrame): DataFrame = {
    import edges.sparkSession.implicits._
    val isLong = edges.schema.fields.take(2).forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (!isLong) edges
    else {
      // the fits-int decision costs one MAX action over the edge
      // frame — memoized per (plan, content) so the triangle and
      // coefficient entries (and repeated bench passes) pay it once
      // min/max directly — max(abs(id)) would let Long.MinValue slip
      // past the guard (abs stays negative under non-ANSI eval) and
      // wrap to 0 in the int cast (round-14 ADVICE)
      val fitsInt = narrowMemo.getOrElseUpdate(
        graft.util.FrameCache.key("narrow-ids", edges), {
          val r = edges.agg(
            least(min($"src"), min($"dst")),
            greatest(max($"src"), max($"dst"))).head()
          !r.isNullAt(0) &&
            r.getLong(0) > Int.MinValue.toLong &&
            r.getLong(1) < Int.MaxValue.toLong
        })
      if (!fitsInt) edges
      else edges.select($"src".cast("int").as("src"),
        $"dst".cast("int").as("dst"))
    }
  }

  /** Undirected degree frame `(src, d)` over a both-arcs edge frame —
    * session-cached (keyed by the edge frame's own plan hash), so the
    * triangle / clustering-coefficient / assortativity trio derives
    * it once per session, not once per query. */
  private def cachedDeg(edges: DataFrame): DataFrame = {
    import edges.sparkSession.implicits._
    cached("graph-deg", edges.groupBy($"src").agg(count(lit(1)).as("d")))
  }

  /** Degree orientation of a both-arcs edge frame: every undirected
    * edge kept once, pointing from its lower-(degree, id) endpoint to
    * the higher — the power-law-safe wedge apex bound (out-degrees ≤
    * √(2|E|) on any graph). ONE construction (and session-cache
    * entry) shared by [[triangleCountOf]] and [[clusteringCoeffOf]];
    * the degree frame it consumes is the shared [[cachedDeg]]. */
  private def orientedEdges(edges: DataFrame): DataFrame = {
    import edges.sparkSession.implicits._
    val deg = cachedDeg(edges)
    cached("tri-oriented", edges
      .join(deg.select($"src", $"d".as("ds")), "src")
      .join(deg.select($"src".as("dst"), $"d".as("dd")), "dst")
      .filter($"ds" < $"dd" || ($"ds" === $"dd" && $"src" < $"dst"))
      .select($"src", $"dst"))
  }

  /** Out-neighbor adjacency lists of the oriented frame — the build
    * side of the triangle-intersection join, ONE construction shared
    * by the triangle and clustering-coefficient entries.
    *
    * Deliberately NOT session-cached (round-12 sf1 lesson): caching
    * the array-typed frame materializes + columnar-compresses every
    * adjacency list and blocks both whole-stage fusion of the
    * aggregate into its joins and Spark's EXCHANGE REUSE — the two
    * join sides are textually identical aggregates, so the planner
    * already computes the shuffle once and reads it twice. With the
    * cache the sf1 triangle went 4.9 s → 12.8 s and the coefficient
    * 5.7 s → 28.9 s; uncached, both sides reuse one exchange and the
    * arrays never round-trip through the block store. */
  private def orientedAdj(oriented: DataFrame): DataFrame = {
    import oriented.sparkSession.implicits._
    // array_sort: one ~outdeg-element sort per VERTEX buys the
    // per-EDGE intersections below a zero-allocation two-pointer
    // merge ([[graft.functions.SortedIntersectCount]]) instead of
    // array_intersect's per-row hash set — measured 142 s -> 65 s
    // for the sf10 triangle intersection stage
    oriented.groupBy($"src").agg(array_sort(collect_list($"dst")).as("nbrs"))
  }

  /** Layout/content card of the materialized co-actor edge table —
    * the `src_coactor_edges` catalog entry. One row: edge count,
    * distinct sources, max out-degree, and the count of asymmetric
    * edges (an arc whose reverse is missing — MUST be 0, the
    * undirected-graph integrity invariant the build contract
    * promises). All four are integer aggregates; the degree
    * aggregate runs bucket-local on the src-bucketed layout. */
  def coActorEdgeSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.coActorEdgesBucketed(spark, sfDir)
    val base = e.agg(count(lit(1)).as("n_edges"),
      countDistinct($"src").as("n_src"))
    val mx = e.groupBy($"src").agg(count(lit(1)).as("d"))
      .agg(max($"d").as("max_out_deg"))
    // an edge is asymmetric iff its mirror is absent, and e is
    // DISTINCT (src,dst) with src≠dst, so each unordered pair
    // {src,dst} carries 1 or 2 directed rows — asym_edges = #pairs
    // with exactly one. The previous left-anti self-join on
    // (src,dst)=(dst,src) made Catalyst BROADCAST the corpus-sized
    // edge list (sf0.1 plan: BroadcastExchange under the anti-join —
    // unbounded at scale, and the sf1 entry paid 6.7 s building it);
    // the canonical-pair aggregate exchanges the same rows once with
    // no broadcast and no sort.
    val asym = e.select(
        least($"src", $"dst").as("lo"), greatest($"src", $"dst").as("hi"))
      .groupBy($"lo", $"hi").agg(count(lit(1)).as("c"))
      .filter($"c" === 1)
      .agg(count(lit(1)).as("asym_edges"))
    base.crossJoin(mx).crossJoin(asym) // three 1-row aggregates
  }

  val coActorEdgeSummarySql: String =
    s"""WITH movies AS MATERIALIZED (${Tables.moviesSql}),
       |am AS MATERIALIZED (SELECT id, unnest(actors) AS a FROM movies),
       |e AS (SELECT DISTINCT x.a AS src, y.a AS dst
       |      FROM am x JOIN am y ON x.id = y.id AND x.a <> y.a)
       |SELECT (SELECT COUNT(*) FROM e) AS n_edges,
       |  (SELECT COUNT(DISTINCT src) FROM e) AS n_src,
       |  (SELECT CAST(MAX(d) AS BIGINT) FROM
       |     (SELECT COUNT(*) AS d FROM e GROUP BY src)) AS max_out_deg,
       |  (SELECT COUNT(*) FROM e f WHERE NOT EXISTS
       |     (SELECT 1 FROM e r WHERE r.src = f.dst AND r.dst = f.src))
       |    AS asym_edges""".stripMargin

  /** PageRank over the co-actor graph: `iters` synchronous updates of
    * r'(v) = (1−d)/N + d·(Σ_{u→v} r(u)/deg(u) + m/N) where m is the
    * dangling mass Σ_{deg(u)=0} r(u), top-20 by final rank. The
    * dangling term is the standard correction: without it the mass of
    * out-degree-0 nodes silently drains each update, and Σr decays —
    * negligible on a toy graph, rank-skewing at scale. With it Σr = 1
    * every iteration (modulo the 8-decimal rounding contract), which
    * the mass-conservation spec asserts. */
  def pagerankActors(spark: SparkSession, sfDir: String,
                     iters: Int = 5, d: Double = 0.85, k: Int = 20): DataFrame = {
    import spark.implicits._
    // corpus-narrowed numeric ids through every iteration — the five
    // rank-broadcast joins and dst-sums hash/compare 4-byte keys
    // instead of variable-width strings; the string id surface (and
    // its tie-break collation) reappears only on the final k rows
    pagerankOf(coActorEdgesLong(spark, sfDir), longNodes(spark, sfDir),
        iters, d)
      .select($"a".cast("string").as("actor"), round($"r", 6).as("rank"))
      .orderBy($"rank".desc, $"actor")
      .limit(k)
  }

  /** [[pagerankActors]] over any distinct directed edge frame
    * `(src, dst)` plus the full node frame `(a)` (nodes with no
    * edges keep the teleport mass). Returns `(a, r)` with `r`
    * rounded to 8 decimals — the deterministic-replay contract.
    *
    * `eps > 0` turns on the ε-convergence tier: the loop exits as
    * soon as the per-iteration L1 rank delta Σ|r−r'| falls below
    * `eps` — at scale, iterations dominate PageRank cost and a
    * converged graph should not pay `iters − t_converged` more
    * shuffles. The delta is ONE more scalar aggregate off the two
    * rank frames the iteration already materialized (a bounded
    * driver double per iteration, never corpus rows). `eps = 0`
    * (the default, and what the oracle-checked query uses) keeps
    * the fixed-iteration replay contract bit-for-bit. */
  def pagerankOf(edges: DataFrame, nodes0: DataFrame,
                 iters: Int = 5, d: Double = 0.85,
                 eps: Double = 0.0): DataFrame =
    pagerankWithStats(edges, nodes0, iters, d, eps)._1

  /** [[pagerankOf]] plus the number of iterations actually run —
    * the observable the convergence spec pins. */
  private[graft] def pagerankWithStats(edges: DataFrame, nodes0: DataFrame,
                                       iters: Int = 5, d: Double = 0.85,
                                       eps: Double = 0.0): (DataFrame, Int) = {
    val spark = edges.sparkSession
    import spark.implicits._
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    // the two frames every iteration re-reads are cached ONCE per
    // (session, input); the (small) rank frame broadcasts into the
    // edge join instead of shuffling the edges five times
    val edgesDeg = cached("pagerank-edges", edges.join(deg, "src"))
    val nodes = cached("pagerank-nodes", nodes0)
    val n = nodes.count()
    // nodes with no inbound edge keep the bare teleport mass on EVERY
    // iteration — a static set, computed once, unioned in for free
    // (replacing a per-iteration nodes-side join + broadcast)
    val noInbound = cached("pagerank-noin",
      nodes.join(edgesDeg.select($"dst"), nodes("a") === $"dst", "left_anti"))
    // dangling = no OUT-edges; on the symmetric co-actor graph this
    // coincides with noInbound (isolated actors), but the operator is
    // generic over any directed edge frame so the two sets are kept
    // distinct
    val dangling = cached("pagerank-dangling",
      nodes.join(edgesDeg.select($"src"), nodes("a") === $"src", "left_anti"))
    var ranks = nodes.select($"a", round(lit(1.0) / n, 8).as("r"))
    // the dangling-mass term makes each iteration consume the
    // previous rank frame TWICE (the scalar aggregate + the
    // contribution join): left lazy, that recursive double reference
    // recomputes level i-1 twice, i-2 four times — 2^iters total. A
    // per-iteration localCheckpoint (the GraphX discipline) bounds
    // each level to ONE materialization of an O(|V|) frame and keeps
    // the logical plan constant-size; the superseded checkpoint is
    // released as soon as its successor is materialized
    var prevCkpt: DataFrame = null
    // ranksCkpted: the ε-tier checkpoints the NEW frame each round
    // (the delta aggregate consumes it anyway) — the next loop head
    // must not checkpoint it a second time
    var ranksCkpted = false
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      val prev = if (ranksCkpted) ranks else ranks.localCheckpoint()
      if (prevCkpt != null && !(prevCkpt eq prev)) prevCkpt.unpersist(blocking = false)
      prevCkpt = prev
      // dangling mass this iteration: ONE scalar row, re-entering the
      // update as a broadcast-NLJ cross join — no per-node state, no
      // driver round-trip
      val m = dangling.join(prev, Seq("a"))
        .agg(coalesce(sum($"r"), lit(0.0)).as("m"))
      // ranks are node-cardinality (≪ edges): broadcast them so the
      // edge list is never shuffled — per iteration the only exchange
      // is the partial+final sum on dst. Capacity tier (n is already
      // counted): past ~1M nodes the hint is dropped and Catalyst/AQE
      // pick the sort-merge or runtime-broadcast route on actual sizes
      val contribs = edgesDeg
        .join(graft.util.Broadcasting.maybeBroadcast(prev, n),
          edgesDeg("src") === prev("a"))
        .select($"dst", ($"r" / $"deg").as("c"))
        .groupBy($"dst").agg(sum($"c").as("s"))
      val next = contribs.select($"dst".as("a"), $"s")
        .unionByName(noInbound.select($"a", lit(0.0).as("s")))
        .crossJoin(m)
        .select($"a",
          round(lit(1 - d) / n + lit(d) * ($"s" + $"m" / n), 8).as("r"))
      if (eps > 0) {
        val cur = next.localCheckpoint()
        // L1 delta vs the previous ranks: an |V|-row join collapsing
        // to one driver double — the convergence witness
        val delta = cur.join(prev.select($"a", $"r".as("rp")), Seq("a"))
          .agg(coalesce(sum(abs($"r" - $"rp")), lit(0.0)))
          .head().getDouble(0)
        prev.unpersist(blocking = false)
        prevCkpt = cur
        ranks = cur
        ranksCkpted = true
        if (delta < eps) converged = true
      } else {
        ranks = next
        ranksCkpted = false
      }
      it += 1
    }
    (ranks, it)
  }

  /** Personalized PageRank from a deterministic single-seed set (the
    * lexicographically smallest actor id): teleport goes to the SEED,
    * not uniformly — the "what is related to X" serving query behind
    * related-item feeds and local community detection, where global
    * PageRank answers "what is important overall". Dangling mass
    * returns to the seed as well, so total mass stays 1.
    *
    * Same per-iteration shape and determinism contract as
    * [[pagerankOf]] (one tier-gated rank-broadcast edge join + one
    * partial+final sum per iteration, 8-dp in-loop rounding,
    * localCheckpoint against the recursive double reference), and the
    * frames it shares with global PageRank (degree-joined edges,
    * nodes, dangling set) resolve to the SAME session-cache entries.
    * This variant carries the full node frame for oracle-replay
    * parity; at 100 TB a single-seed PPR would keep only the nonzero
    * frontier (which grows hop-by-hop from the seed), an
    * interface-compatible sparsification. */
  def pprActors(spark: SparkSession, sfDir: String,
                iters: Int = 5, d: Double = 0.85, k: Int = 20): DataFrame = {
    import spark.implicits._
    // the seed stays the LEXICOGRAPHIC min over the string id
    // surface (the published oracle contract predates the numeric
    // narrowing), cast to the narrowed type the iterations run on —
    // a numeric MIN would pick a different actor whenever string and
    // numeric order disagree ("10" < "9")
    val seed = cached("ppr-seed", coActorEdges(spark, sfDir)._2
      .agg(min($"a").cast(graphIdType(spark, sfDir)).as("a")))
    pprOf(coActorEdgesLong(spark, sfDir), longNodes(spark, sfDir),
        seed, iters, d)
      .select($"a".cast("string").as("actor"), round($"r", 6).as("rank"))
      .orderBy($"rank".desc, $"actor")
      .limit(k)
  }

  /** [[pprActors]] over any distinct directed edge frame `(src,
    * dst)`, node frame `(a)`, and seed frame `(a)` (teleport mass
    * splits uniformly over the seeds). Returns `(a, r)` at 8 dp.
    *
    * `eps > 0` turns on the same ε-convergence tier as
    * [[pagerankOf]] (round-10 verdict item 5: PPR is the #2 heaviest
    * catalog query and ran fixed iterations unconditionally): exit
    * as soon as the per-iteration L1 delta falls below `eps`, one
    * driver double per iteration. `eps = 0` keeps the fixed-iteration
    * oracle-replay contract bit-for-bit. */
  def pprOf(edges: DataFrame, nodes0: DataFrame,
            seeds: DataFrame, iters: Int = 5,
            d: Double = 0.85, eps: Double = 0.0): DataFrame =
    pprWithStats(edges, nodes0, seeds, iters, d, eps)._1

  /** [[pprOf]] plus the number of iterations actually run. */
  private[graft] def pprWithStats(edges: DataFrame, nodes0: DataFrame,
                                  seeds: DataFrame, iters: Int = 5,
                                  d: Double = 0.85,
                                  eps: Double = 0.0): (DataFrame, Int) = {
    val spark = edges.sparkSession
    import spark.implicits._
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    val edgesDeg = cached("pagerank-edges", edges.join(deg, "src"))
    val nodes = cached("pagerank-nodes", nodes0)
    val n = nodes.count()
    val nS = seeds.count().toDouble
    val dangling = cached("pagerank-dangling",
      nodes.join(edgesDeg.select($"src"), nodes("a") === $"src", "left_anti"))
    // teleport vector: 1 on seeds, 0 elsewhere — node-cardinality,
    // computed once, re-entering every iteration
    val tv = cached("ppr-tv",
      nodes.join(seeds.select($"a", lit(1.0).as("t")), Seq("a"), "left")
        .select($"a", coalesce($"t", lit(0.0)).as("t")))
    var ranks = tv.select($"a", round($"t" / nS, 8).as("r"))
    var prevCkpt: DataFrame = null
    var ranksCkpted = false
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      val prev = if (ranksCkpted) ranks else ranks.localCheckpoint()
      if (prevCkpt != null && !(prevCkpt eq prev)) prevCkpt.unpersist(blocking = false)
      prevCkpt = prev
      val m = dangling.join(prev, Seq("a"))
        .agg(coalesce(sum($"r"), lit(0.0)).as("m"))
      val contribs = edgesDeg
        .join(graft.util.Broadcasting.maybeBroadcast(prev, n),
          edgesDeg("src") === prev("a"))
        .select($"dst", ($"r" / $"deg").as("c"))
        .groupBy($"dst").agg(sum($"c").as("s"))
      val next = tv
        .join(contribs.select($"dst".as("a"), $"s"), Seq("a"), "left")
        .crossJoin(m)
        .select($"a",
          round(lit(1 - d) * $"t" / nS
            + lit(d) * (coalesce($"s", lit(0.0)) + $"m" * $"t" / nS), 8).as("r"))
      if (eps > 0) {
        val cur = next.localCheckpoint()
        val delta = cur.join(prev.select($"a", $"r".as("rp")), Seq("a"))
          .agg(coalesce(sum(abs($"r" - $"rp")), lit(0.0)))
          .head().getDouble(0)
        prev.unpersist(blocking = false)
        prevCkpt = cur
        ranks = cur
        ranksCkpted = true
        if (delta < eps) converged = true
      } else {
        ranks = next
        ranksCkpted = false
      }
      it += 1
    }
    (ranks, it)
  }

  /** Oracle: exact chained-CTE replay of [[pprOf]]'s single-seed run
    * — seed = MIN(a), so |S| = 1 and the /|S| factors are IEEE
    * identities the SQL omits. */
  def pprActorsSql(iters: Int = 5, d: Double = 0.85, k: Int = 20): String = {
    val head =
      s"""WITH movies AS MATERIALIZED (${Tables.moviesSql}),
         |sel AS MATERIALIZED (SELECT id, unnest(actors) AS a FROM movies),
         |edges AS MATERIALIZED (SELECT DISTINCT x.a AS src, y.a AS dst
         |          FROM sel x JOIN sel y ON x.id = y.id AND x.a <> y.a),
         |nodes AS MATERIALIZED (SELECT DISTINCT a FROM sel),
         |ed AS MATERIALIZED (SELECT src, dst, deg FROM edges
         |       JOIN (SELECT src AS s2, COUNT(*) AS deg
         |             FROM edges GROUP BY src) ON src = s2),
         |dangling AS MATERIALIZED (SELECT a FROM nodes
         |             WHERE a NOT IN (SELECT src FROM edges)),
         |tv AS MATERIALIZED (SELECT a, CASE WHEN a = (SELECT MIN(a) FROM nodes)
         |                      THEN 1.0e0 ELSE 0.0e0 END AS t FROM nodes),
         |r0 AS (SELECT a, ROUND(t, 8) AS r FROM tv)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""m$i AS MATERIALIZED (
         |  SELECT COALESCE(SUM(r), 0.0e0) AS m FROM r${i - 1}
         |  WHERE a IN (SELECT a FROM dangling)),
         |r$i AS MATERIALIZED (
         |  SELECT tv.a,
         |    ROUND(${1 - d}e0 * tv.t
         |          + ${d}e0 * (COALESCE(s.c, 0.0e0)
         |                      + (SELECT m FROM m$i) * tv.t),
         |          8) AS r
         |  FROM tv LEFT JOIN (
         |    SELECT ed.dst AS a, SUM(p.r / ed.deg) AS c
         |    FROM ed JOIN r${i - 1} p ON ed.src = p.a
         |    GROUP BY ed.dst) s USING (a))""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"""$head$steps
       |SELECT a AS actor, ROUND(r, 6) AS rank
       |FROM r$iters ORDER BY rank DESC, actor LIMIT $k""".stripMargin
  }

  /** Triangle count on the co-actor graph via degree orientation:
    * each undirected edge points from its lower-(degree, id) endpoint
    * to the higher, so every wedge is enumerated at exactly one apex
    * and the wedge count is Σ out-deg(v)² with out-degrees bounded by
    * √(2·|E|) on ANY graph — the standard trick that keeps a
    * power-law hub from exploding the self-join (a hub of degree 10⁶
    * contributes wedges only where it is the SMALLER endpoint).
    * Returns one row: nodes, undirected edges, triangles. */
  def triangleCount(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // actor ids are stringified part keys: hash/compare the wedge
    // stream (the big intermediate) as longs, not strings — via the
    // shared session-cached cast frame
    triangleCountOf(coActorEdgesLong(spark, sfDir),
      longNodes(spark, sfDir))
  }

  /** [[triangleCount]] over any directed edge frame `(src, dst)`
    * holding BOTH arcs of each undirected edge, plus the node frame
    * `(a)`. */
  def triangleCountOf(edges: DataFrame, nodes: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val oriented = orientedEdges(narrowIds(edges))
    val nE = oriented.count()
    // ONE algorithm, capacity-tiered JOIN STRATEGY (round-11 sf1
    // lesson): adjacency intersection — tri = Σ over oriented edges
    // (u,v) of |N⁺(u) ∩ N⁺(v)|. In the acyclic degree orientation
    // every triangle has one source, one middle, one sink; only the
    // source→middle edge sees the sink in both out-neighborhoods, so
    // each triangle is counted exactly once. The wedge formulation
    // that used to be the over-cap tier shuffled Σ outdeg² ROWS —
    // one row per wedge through two exchanges — and measured 25×
    // linear at a 10× step; intersecting packed adjacency arrays
    // moves Σ outdeg longs instead (√(2|E|)-bounded per row by the
    // orientation), so past the broadcast cap the SAME plan simply
    // degrades from broadcast-hash to shuffled-hash joins of the
    // |E|-row adjacency table. Measured 51.8 s → 6.1 s at sf1
    // (5.2× the sf0.1 wall at a 10× data step).
    val adj = orientedAdj(oriented)
    val adjU = graft.util.Broadcasting.maybeBroadcast(
      adj.select($"src", $"nbrs".as("nu")), nE)
    val adjV = graft.util.Broadcasting.maybeBroadcast(
      adj.select($"src".as("dst"), $"nbrs".as("nv")), nE)
    val tri = oriented
      .join(adjU, Seq("src"))
      .join(adjV, Seq("dst"), "left")
      .select(when($"nv".isNull, lit(0L))
        .otherwise(graft.functions.GraphExpressions
          .sorted_intersect_count($"nu", $"nv")).as("c"))
      .agg(coalesce(sum($"c"), lit(0L))).head().getLong(0)
    val nV = nodes.count()
    Seq((nV, nE, tri)).toDF("n_nodes", "n_edges", "n_triangles")
  }

  /** k-hop BFS reachability histogram from the lowest-id actor:
    * minimum hop distance over the co-actor graph, reported as
    * `(hop, n_actors)` for every reached level 0..`hops`. The seed
    * is a 1-row aggregate (`MIN(a)`), never a driver-side literal,
    * so the whole query stays declarative.
    *
    * Scale posture (100 TB): classic frontier iteration — per hop
    * ONE equi-join of the edge list with the current frontier (the
    * frontier broadcasts only under the capacity tier; a saturated
    * frontier on a small-diameter social graph is corpus-proportional
    * and falls back to the shuffled route) and one anti-join against
    * the visited set, both on the node key. The visited set is
    * node-cardinality, stays distributed, and is `localCheckpoint`ed
    * each hop so the recursive double reference (anti-join + union)
    * costs one materialization per level, not 2^hops. The per-hop
    * frontier count the tier needs doubles as the early-exit test on
    * an exhausted component. */
  def khopActors(spark: SparkSession, sfDir: String, hops: Int = 3): DataFrame = {
    import spark.implicits._
    val e = coActorEdgesLong(spark, sfDir)
    // seed from the SAME narrowed node frame, so the frontier joins
    // never re-widen the edge keys with an implicit cast
    val seed = longNodes(spark, sfDir).agg(min($"a").as("a"))
    khopOf(e, seed, hops)
      .groupBy($"hop")
      .agg(count(lit(1)).as("n_actors"))
      .orderBy($"hop")
  }

  /** [[khopActors]] over any directed edge frame `(src, dst)` and a
    * seed frame `(a)` (one or more source nodes). Returns `(a, hop)`
    * with the MINIMUM hop per reached node. */
  def khopOf(edges: DataFrame, seed: DataFrame, hops: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    require(hops >= 0, s"hop count must be >= 0, got $hops")
    val e = cached("khop-edges", edges)
    var dist = seed.select($"a", lit(0L).as("hop")).localCheckpoint()
    var prevCkpt: DataFrame = dist
    var frontierRows = -1L // unknown until the first count below
    var hop = 1L
    while (hop <= hops && frontierRows != 0L) {
      val frontier = dist.filter($"hop" === (hop - 1L)).select($"a")
      // one bounded driver long per hop: feeds the broadcast tier AND
      // terminates the loop when the component is exhausted (skipping
      // `hops - diameter` empty joins)
      frontierRows = frontier.count()
      if (frontierRows != 0L) {
        val next = e
          .join(graft.util.Broadcasting.maybeBroadcast(frontier, frontierRows),
            e("src") === frontier("a"))
          .select($"dst".as("a")).distinct()
          .join(dist, Seq("a"), "left_anti")
          .select($"a", lit(hop).as("hop"))
        dist = dist.unionByName(next).localCheckpoint()
        prevCkpt.unpersist(blocking = false)
        prevCkpt = dist
      }
      hop += 1
    }
    dist
  }

  def khopActorsSql(hops: Int = 3): String = {
    val head =
      s"""WITH movies AS MATERIALIZED (${Tables.moviesSql}),
         |sel AS MATERIALIZED (SELECT id, unnest(actors) AS a FROM movies),
         |edges AS MATERIALIZED (SELECT DISTINCT CAST(x.a AS BIGINT) AS src,
         |                 CAST(y.a AS BIGINT) AS dst
         |          FROM sel x JOIN sel y ON x.id = y.id AND x.a <> y.a),
         |nodes AS MATERIALIZED (SELECT DISTINCT CAST(a AS BIGINT) AS a FROM sel),
         |d0 AS (SELECT MIN(a) AS a, 0 AS hop FROM nodes)""".stripMargin
    val steps = (1 to hops).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT a, hop FROM d${i - 1}
         |  UNION ALL
         |  SELECT a, $i AS hop FROM (
         |    SELECT DISTINCT e.dst AS a FROM edges e
         |    JOIN d${i - 1} f ON e.src = f.a AND f.hop = ${i - 1}
         |    WHERE e.dst NOT IN (SELECT a FROM d${i - 1})))""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"""$head$steps
       |SELECT CAST(hop AS BIGINT) AS hop, COUNT(*) AS n_actors
       |FROM d$hops GROUP BY hop ORDER BY hop""".stripMargin
  }

  val triangleCountSql: String =
    s"""WITH movies AS MATERIALIZED (${Tables.moviesSql}),
       |sel AS MATERIALIZED (SELECT id, unnest(actors) AS a FROM movies),
       |edges AS MATERIALIZED (SELECT DISTINCT x.a AS src, y.a AS dst
       |          FROM sel x JOIN sel y ON x.id = y.id AND x.a <> y.a),
       |nodes AS MATERIALIZED (SELECT DISTINCT a FROM sel),
       |deg AS MATERIALIZED (SELECT src AS v, COUNT(*) AS deg FROM edges GROUP BY src),
       |oriented AS MATERIALIZED (
       |  SELECT e.src, e.dst FROM edges e
       |  JOIN deg s ON e.src = s.v JOIN deg t ON e.dst = t.v
       |  WHERE s.deg < t.deg OR (s.deg = t.deg AND e.src < e.dst)),
       |wedges AS (
       |  SELECT LEAST(e1.dst, e2.dst) AS a, GREATEST(e1.dst, e2.dst) AS b
       |  FROM oriented e1 JOIN oriented e2 ON e1.src = e2.src
       |  WHERE e1.dst < e2.dst),
       |closing AS (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       |            FROM oriented)
       |SELECT (SELECT COUNT(*) FROM nodes) AS n_nodes,
       |       (SELECT COUNT(*) FROM oriented) AS n_edges,
       |       (SELECT COUNT(*) FROM wedges w JOIN closing c
       |          ON w.a = c.a AND w.b = c.b) AS n_triangles""".stripMargin

  def pagerankActorsSql(iters: Int = 5, d: Double = 0.85, k: Int = 20): String = {
    val head =
      s"""WITH movies AS MATERIALIZED (${Tables.moviesSql}),
         |sel AS MATERIALIZED (SELECT id, unnest(actors) AS a FROM movies),
         |edges AS MATERIALIZED (SELECT DISTINCT x.a AS src, y.a AS dst
         |          FROM sel x JOIN sel y ON x.id = y.id AND x.a <> y.a),
         |nodes AS MATERIALIZED (SELECT DISTINCT a FROM sel),
         |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
         |ed AS MATERIALIZED (SELECT src, dst, deg FROM edges
         |       JOIN (SELECT src AS s2, COUNT(*) AS deg
         |             FROM edges GROUP BY src) ON src = s2),
         |dangling AS MATERIALIZED (SELECT a FROM nodes
         |             WHERE a NOT IN (SELECT src FROM edges)),
         |r0 AS (SELECT a, ROUND(1.0e0 / (SELECT n FROM nn), 8) AS r FROM nodes)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""m$i AS MATERIALIZED (
         |  SELECT COALESCE(SUM(r), 0.0e0) AS m FROM r${i - 1}
         |  WHERE a IN (SELECT a FROM dangling)),
         |r$i AS MATERIALIZED (
         |  SELECT nd.a,
         |    ROUND(${1 - d}e0 / (SELECT n FROM nn)
         |          + ${d}e0 * (COALESCE(s.c, 0.0e0)
         |                      + (SELECT m FROM m$i) / (SELECT n FROM nn)),
         |          8) AS r
         |  FROM nodes nd LEFT JOIN (
         |    SELECT ed.dst AS a, SUM(p.r / ed.deg) AS c
         |    FROM ed JOIN r${i - 1} p ON ed.src = p.a
         |    GROUP BY ed.dst) s USING (a))""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"""$head$steps
       |SELECT a AS actor, ROUND(r, 6) AS rank
       |FROM r$iters ORDER BY rank DESC, actor LIMIT $k""".stripMargin
  }

  // ---------------------------------------------------------------
  // rel_pagerank_weighted — collaboration-weighted importance
  // ---------------------------------------------------------------

  /** Weighted PageRank over the collaboration graph: contributions
    * split along edge WEIGHT (shared-movie count) instead of evenly
    * — r'(v) = (1−d)/N + d·(Σ_{u→v} r(u)·w(uv)/W(u) + m/N) with
    * W(u) the out-weight sum. The ranking repeat collaborations
    * deserve: an actor bound to a tight troupe routes its mass into
    * the troupe where the unweighted walk leaks it evenly across
    * one-off co-appearances. The `wt` column ships in the
    * materialized bucketed edge table, so the weighted variant costs
    * the SAME per-iteration plan as [[pagerankOf]] (one tier-gated
    * rank-broadcast edge join, one partial+final sum on dst, 8-dp
    * in-loop rounding, localCheckpoint against the recursive double
    * reference) — no second edge derivation. */
  def pagerankWeightedActors(spark: SparkSession, sfDir: String,
                             iters: Int = 5, d: Double = 0.85,
                             k: Int = 20): DataFrame = {
    import spark.implicits._
    // same narrowing as the unweighted walk: ids at the corpus'
    // narrowest type, wt untouched, string surface restored on the
    // final k rows only
    val t = graphIdType(spark, sfDir)
    val edges = cached("coactor-edges-w",
      Tables.coActorEdgesBucketed(spark, sfDir)
        .select($"src".cast(t).as("src"), $"dst".cast(t).as("dst"), $"wt"))
    pagerankWeightedOf(edges, longNodes(spark, sfDir), iters, d)
      .select($"a".cast("string").as("actor"), round($"r", 6).as("rank"))
      .orderBy($"rank".desc, $"actor")
      .limit(k)
  }

  /** [[pagerankWeightedActors]] over any `(src, dst, wt)` arc frame
    * plus the full node frame `(a)`. `eps > 0` turns on the same
    * ε-convergence tier as [[pagerankOf]] (round-10 verdict item 5);
    * `eps = 0` keeps the fixed-iteration oracle-replay contract. */
  private[graft] def pagerankWeightedOf(edges: DataFrame, nodes0: DataFrame,
                                        iters: Int = 5, d: Double = 0.85,
                                        eps: Double = 0.0): DataFrame =
    pagerankWeightedWithStats(edges, nodes0, iters, d, eps)._1

  /** [[pagerankWeightedOf]] plus the number of iterations run. */
  private[graft] def pagerankWeightedWithStats(
      edges: DataFrame, nodes0: DataFrame, iters: Int = 5,
      d: Double = 0.85, eps: Double = 0.0): (DataFrame, Int) = {
    val spark = edges.sparkSession
    import spark.implicits._
    val wdeg = edges.groupBy($"src").agg(sum($"wt").as("wdeg"))
    val edgesW = cached("pagerankw-edges", edges.join(wdeg, "src"))
    val nodes = cached("pagerank-nodes", nodes0)
    val n = nodes.count()
    val noInbound = cached("pagerankw-noin",
      nodes.join(edgesW.select($"dst"), nodes("a") === $"dst", "left_anti"))
    val dangling = cached("pagerankw-dangling",
      nodes.join(edgesW.select($"src"), nodes("a") === $"src", "left_anti"))
    var ranks = nodes.select($"a", round(lit(1.0) / n, 8).as("r"))
    var prevCkpt: DataFrame = null
    var ranksCkpted = false
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      val prev = if (ranksCkpted) ranks else ranks.localCheckpoint()
      if (prevCkpt != null && !(prevCkpt eq prev)) prevCkpt.unpersist(blocking = false)
      prevCkpt = prev
      val m = dangling.join(prev, Seq("a"))
        .agg(coalesce(sum($"r"), lit(0.0)).as("m"))
      val contribs = edgesW
        .join(graft.util.Broadcasting.maybeBroadcast(prev, n),
          edgesW("src") === prev("a"))
        .select($"dst", ($"r" * $"wt" / $"wdeg").as("c"))
        .groupBy($"dst").agg(sum($"c").as("s"))
      val next = contribs.select($"dst".as("a"), $"s")
        .unionByName(noInbound.select($"a", lit(0.0).as("s")))
        .crossJoin(m) // 1-row dangling mass
        .select($"a",
          round(lit(1 - d) / n + lit(d) * ($"s" + $"m" / n), 8).as("r"))
      if (eps > 0) {
        val cur = next.localCheckpoint()
        val delta = cur.join(prev.select($"a", $"r".as("rp")), Seq("a"))
          .agg(coalesce(sum(abs($"r" - $"rp")), lit(0.0)))
          .head().getDouble(0)
        prev.unpersist(blocking = false)
        prevCkpt = cur
        ranks = cur
        ranksCkpted = true
        if (delta < eps) converged = true
      } else {
        ranks = next
        ranksCkpted = false
      }
      it += 1
    }
    (ranks, it)
  }

  def pagerankWeightedActorsSql(iters: Int = 5, d: Double = 0.85,
                                k: Int = 20): String = {
    val head =
      s"""WITH movies AS MATERIALIZED (${Tables.moviesSql}),
         |sel AS MATERIALIZED (SELECT id, unnest(actors) AS a FROM movies),
         |edges AS MATERIALIZED (SELECT x.a AS src, y.a AS dst,
         |            CAST(COUNT(*) AS BIGINT) AS wt
         |          FROM sel x JOIN sel y ON x.id = y.id AND x.a <> y.a
         |          GROUP BY 1, 2),
         |nodes AS MATERIALIZED (SELECT DISTINCT a FROM sel),
         |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
         |ed AS MATERIALIZED (SELECT src, dst, wt, wdeg FROM edges
         |       JOIN (SELECT src AS s2, CAST(SUM(wt) AS BIGINT) AS wdeg
         |             FROM edges GROUP BY src) ON src = s2),
         |dangling AS MATERIALIZED (SELECT a FROM nodes
         |             WHERE a NOT IN (SELECT src FROM edges)),
         |r0 AS (SELECT a, ROUND(1.0e0 / (SELECT n FROM nn), 8) AS r FROM nodes)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""m$i AS MATERIALIZED (
         |  SELECT COALESCE(SUM(r), 0.0e0) AS m FROM r${i - 1}
         |  WHERE a IN (SELECT a FROM dangling)),
         |r$i AS MATERIALIZED (
         |  SELECT nd.a,
         |    ROUND(${1 - d}e0 / (SELECT n FROM nn)
         |          + ${d}e0 * (COALESCE(s.c, 0.0e0)
         |                      + (SELECT m FROM m$i) / (SELECT n FROM nn)),
         |          8) AS r
         |  FROM nodes nd LEFT JOIN (
         |    SELECT ed.dst AS a, SUM(p.r * ed.wt / ed.wdeg) AS c
         |    FROM ed JOIN r${i - 1} p ON ed.src = p.a
         |    GROUP BY ed.dst) s USING (a))""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"""$head$steps
       |SELECT a AS actor, ROUND(r, 6) AS rank
       |FROM r$iters ORDER BY rank DESC, actor LIMIT $k""".stripMargin
  }

  // ---------------------------------------------------------------
  // rel_graph_cc / rel_graph_kcore — component and core structure of
  // the weight-thresholded collaboration graph
  // ---------------------------------------------------------------

  /** Tuning shared with the oracles. The raw co-actor graph is a
    * single dense component (every part co-occurs with every popular
    * part somewhere), so component/core structure only appears on the
    * REPEAT-collaboration graph: edges kept when the pair co-occurs
    * in ≥ [[GraphWeightMin]] movies — the weight ships in the
    * materialized edge table, so the threshold is a bucket-local
    * filter, not a re-derivation. MaxRounds bounds both iterations;
    * the operators require convergence within it (loud failure beats
    * a silent oracle mismatch) and the oracles unroll exactly that
    * many rounds (post-fixpoint rounds are no-ops, so early Spark
    * convergence stays equal). Measured at sf0.01: CC fixpoint in 10
    * rounds, k=3 peel in 10 — 20 is 2× headroom. */
  val GraphWeightMin = 2
  val GraphMaxRounds = 20
  val KCoreK = 3

  /** Weight-thresholded directed edges (both arcs), actor ids
    * numeric (label MIN must be numeric: the string min of
    * stringified part keys would order "10" < "2") — int when the
    * corpus fits ([[graphIdType]]), so the per-round label joins of
    * cc/lpa/kcore shuffle half the key bytes. */
  private def weightedEdges(spark: SparkSession, sfDir: String, minW: Int): DataFrame = {
    import spark.implicits._
    val t = graphIdType(spark, sfDir)
    cached(s"wedges-$minW", Tables.coActorEdgesBucketed(spark, sfDir)
      .filter($"wt" >= minW)
      .select($"src".cast(t).as("src"), $"dst".cast(t).as("dst")))
  }

  /** All actor ids as longs — the pre-narrowing frame the fits-int
    * decision aggregates over (so the decision itself never depends
    * on the narrowing it gates). */
  private def longNodesRaw(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    cached("coactor-nodes-long", Tables.movies(spark, sfDir)
      .select(explode($"actors").as("s"))
      .select($"s".cast("long").as("a")).distinct())
  }

  /** All actor ids, numeric, at the corpus' [[graphIdType]] — the
    * node frame every iterative kernel seeds labels/ranks from; its
    * id type always matches the edge frames above so no join ever
    * re-widens the keys with an implicit cast. */
  private def longNodes(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val raw = longNodesRaw(spark, sfDir)
    if (actorIdsFitInt(spark, sfDir))
      cached("coactor-nodes-narrow", raw.select($"a".cast("int").as("a")))
    else raw
  }

  /** Connected components by synchronous min-label propagation:
    * label(v) ← min(label(v), min over in-neighbors), iterated to
    * fixpoint. Output is the component-size census `(comp_size,
    * n_comps)` — isolated actors show up as size-1 components (the
    * node frame is the full actor set, not just edge endpoints).
    *
    * Scale posture: per round ONE equi-join of the edge list with the
    * node-cardinality label frame (tier-gated broadcast — the edge
    * side never shuffles under the tier) and one partial+final MIN on
    * the node key; the convergence witness is a single driver long
    * (count of changed labels). localCheckpoint per round keeps the
    * plan constant-size (the pagerank discipline). Rounds scale with
    * component diameter — the right shape for short-diameter
    * collaboration graphs; a 100-TB graph with adversarial diameter
    * would move to the large-star/small-star contraction (O(log n)
    * rounds), which this operator's interface admits unchanged. */
  def connectedComponents(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    ccOf(weightedEdges(spark, sfDir, GraphWeightMin), longNodes(spark, sfDir),
      GraphMaxRounds)
      .groupBy($"lbl").agg(count(lit(1)).as("comp_size"))
      .groupBy($"comp_size").agg(count(lit(1)).as("n_comps"))
      .orderBy($"comp_size")
  }

  /** [[connectedComponents]] over any directed edge frame `(src,
    * dst)` (both arcs present) and node frame `(a)`; returns `(a,
    * lbl)` with `lbl` = min node id of the component. */
  private[graft] def ccOf(edges: DataFrame, nodes: DataFrame,
                          maxRounds: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = cached("cc-edges", edges)
    val n = nodes.count()
    var labels = nodes.select($"a", $"a".as("lbl")).localCheckpoint()
    var prevCkpt = labels
    var changed = -1L
    var it = 0
    while (changed != 0L && it < maxRounds) {
      // min over in-neighbor labels, LEFT-joined back onto the label
      // frame — the oracle's LEAST/COALESCE formulation, which lets
      // the round CARRY the old label through the checkpoint: the
      // convergence witness is then a filter-count SCAN of the frame
      // the round materialized anyway, not a second |V|-row join job
      // per round (measured ~2× the per-round wall at bench scale)
      val msgs = e
        .join(graft.util.Broadcasting.maybeBroadcast(labels, n),
          e("src") === labels("a"))
        .groupBy($"dst").agg(min($"lbl").as("ml"))
      // (measured: tier-broadcasting msgs for this carry join costs
      // MORE at bench scale than the exchange it saves — ~50 ms of
      // per-round broadcast build × ~11 rounds, cc 2.85 → 3.4 s
      // sf0.1 — so the carry join stays a plain equi-join and the
      // broadcast decision is left to Catalyst/AQE)
      val next = labels.select($"a", $"lbl".as("old"))
        .join(msgs.select($"dst".as("a"), $"ml"), Seq("a"), "left")
        .select($"a", least($"old", coalesce($"ml", $"old")).as("lbl"), $"old")
        .localCheckpoint()
      changed = next.filter($"lbl" =!= $"old").count()
      prevCkpt.unpersist(blocking = false)
      prevCkpt = next
      labels = next.select($"a", $"lbl")
      it += 1
    }
    require(changed == 0L,
      s"connected components did not converge within $maxRounds rounds")
    labels
  }

  def connectedComponentsSql(minW: Int = GraphWeightMin,
                             rounds: Int = GraphMaxRounds): String = {
    val head =
      s"""WITH movies AS MATERIALIZED (${Tables.moviesSql}),
         |sel AS MATERIALIZED (SELECT id, unnest(actors) AS a FROM movies),
         |e AS MATERIALIZED (
         |      SELECT CAST(x.a AS BIGINT) AS src, CAST(y.a AS BIGINT) AS dst
         |      FROM sel x JOIN sel y ON x.id = y.id AND x.a <> y.a
         |      GROUP BY 1, 2 HAVING COUNT(*) >= $minW),
         |nodes AS MATERIALIZED (SELECT DISTINCT CAST(a AS BIGINT) AS a FROM sel),
         |l0 AS (SELECT a, a AS lbl FROM nodes)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""l$i AS MATERIALIZED (
         |  SELECT n.a, LEAST(n.lbl, COALESCE(m.ml, n.lbl)) AS lbl
         |  FROM l${i - 1} n LEFT JOIN (
         |    SELECT e.dst AS a, MIN(p.lbl) AS ml
         |    FROM e JOIN l${i - 1} p ON e.src = p.a GROUP BY e.dst) m USING (a))""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"""$head$steps
       |SELECT comp_size, COUNT(*) AS n_comps
       |FROM (SELECT lbl, COUNT(*) AS comp_size FROM l$rounds GROUP BY lbl)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC '14) — the O(log n)-round upgrade path
    * [[connectedComponents]]'s scaladoc names for adversarial-diameter
    * graphs. Same output contract (component-size census, isolates
    * kept), so the SAME min-label oracle checks it.
    *
    * Per alternation: large-star attaches every node's LARGER
    * neighbors to the minimum of its closed neighborhood; small-star
    * attaches the node and its SMALLER neighbors to the minimum of
    * those. Both are one partial+final MIN on the node key plus one
    * equi-join of the edge frame with that node-cardinality min frame
    * (tier-gated broadcast) — no collect_list neighborhoods, so a
    * 100-TB-graph hub node never materializes its adjacency in one
    * task. Edges stay canonical (src > dst) by construction, which
    * halves the carried frame vs the both-arcs min-label loop. Round
    * count is O(log n) alternations vs label propagation's O(diameter)
    * — on a length-d chain the min-label loop pays d rounds where this
    * pays ~log d (spec-pinned). Convergence witness: the symmetric
    * difference of consecutive edge frames, a driver long; fixpoint is
    * the star forest centered at component minima. localCheckpoint per
    * alternation bounds the recursive plan (the pagerank discipline). */
  def connectedComponentsContract(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    ccContractOf(weightedEdges(spark, sfDir, GraphWeightMin),
      longNodes(spark, sfDir), GraphMaxRounds)
      .groupBy($"lbl").agg(count(lit(1)).as("comp_size"))
      .groupBy($"comp_size").agg(count(lit(1)).as("n_comps"))
      .orderBy($"comp_size")
  }

  /** [[connectedComponentsContract]]'s loop over any directed edge
    * frame (both arcs present) and node frame `(a)`: returns `(a,
    * lbl)` with `lbl` = min node id of the component — the same
    * contract as [[ccOf]], by a different route. */
  private[graft] def ccContractOf(edges: DataFrame, nodes: DataFrame,
                                  maxRounds: Int): DataFrame =
    ccContractRounds(edges, nodes, maxRounds)._1

  private[graft] def ccContractRounds(edges: DataFrame, nodes: DataFrame,
                                      maxRounds: Int): (DataFrame, Int) = {
    val spark = edges.sparkSession
    import spark.implicits._
    // canonical big→small arcs: the both-arcs input carries each
    // undirected edge twice; keep the (src > dst) orientation once
    var e = edges.filter($"src" > $"dst").select($"src", $"dst")
      .distinct().localCheckpoint()
    val nU = nodes.count() // tier bound for the min-frame broadcasts
    var eCnt = e.count() // carried: this round's |A| is last round's |B|
    var changed = -1L
    var it = 0
    while (changed != 0L && it < maxRounds) {
      // large-star over the full (symmetrized) neighborhood
      val both = e.unionByName(e.select($"dst".as("src"), $"src".as("dst")))
      val mins = both.groupBy($"src").agg(min($"dst").as("mn"))
        .select($"src".as("u"), least($"src", $"mn").as("m"))
      val large = both
        .join(graft.util.Broadcasting.maybeBroadcast(mins, nU),
          both("src") === mins("u"))
        .filter($"dst" > $"src") // larger neighbors v: emit v → m, v > u ≥ m
        .select($"dst".as("src"), $"m".as("dst"))
        .distinct()
      // small-star over the (already canonical) large-star output
      val mins2 = large.groupBy($"src").agg(min($"dst").as("m"))
        .select($"src".as("u"), $"m")
      val gated2 = graft.util.Broadcasting.maybeBroadcast(mins2, nU)
      val small = large
        .join(gated2, large("src") === mins2("u"))
        .select($"dst".as("src"), $"m".as("dst")) // smaller neighbors v → m
        .unionByName(mins2.select($"u".as("src"), $"m".as("dst"))) // u itself → m
        .filter($"src" =!= $"dst")
        .distinct()
        .localCheckpoint()
      // convergence witness: symmetric difference of consecutive edge
      // sets. Both sides are distinct, so |AΔB| = |A| + |B| − 2|A∩B|
      // — ONE equi-join job plus one scan of the frame just
      // checkpointed (|A| is carried from the previous round's |B|,
      // saving a third count job per alternation), where the two
      // except() forms each paid a full two-sided shuffle per
      // alternation
      val inter = small.join(e, Seq("src", "dst")).count()
      val sCnt = small.count()
      changed = sCnt + eCnt - 2 * inter
      eCnt = sCnt
      e.unpersist(blocking = false)
      e = small
      it += 1
    }
    require(changed == 0L,
      s"contraction components did not converge within $maxRounds alternations")
    // fixpoint is a star forest: every non-center appears exactly once
    // as src, centers only as dst, isolates not at all
    val member = e.select($"src".as("a"), $"dst".as("lbl"))
    val ctr = e.select($"dst".as("a"), $"dst".as("lbl")).distinct()
    val covered = member.select($"a").unionByName(ctr.select($"a"))
    val iso = nodes.join(covered, Seq("a"), "left_anti")
      .select($"a", $"a".as("lbl"))
    (member.unionByName(ctr).unionByName(iso), it)
  }

  /** Fixed round budget for synchronous label propagation: LPA is
    * run for exactly this many rounds on BOTH engines (no fixpoint
    * requirement — synchronous LPA can legally 2-cycle on bipartite
    * structure, so a convergence gate would be wrong; a fixed,
    * unrolled round count is the deterministic contract instead). */
  val LpaRounds = 4

  /** Community detection by synchronous label propagation (Raghavan
    * et al. 2007) over the weight-thresholded collaboration graph:
    * every node adopts the most frequent label among its in-neighbors
    * each round (ties broken by MIN label; nodes with no in-neighbors
    * keep their own), for exactly [[LpaRounds]] rounds. Where
    * [[connectedComponents]] answers "what is reachable", LPA splits
    * dense regions *within* a component — the community census over
    * the same graph. Output is the community-size histogram
    * `(comm_size, n_comms)`.
    *
    * Determinism: synchronous updates + the min tie-break make every
    * round a pure function of the previous labels, so the oracle
    * unrolls the exact round count as chained CTEs and both engines
    * agree bit-for-bit — the asynchronous/randomized LPA variants
    * trade that away for faster mixing.
    *
    * Scale posture: per round one tier-gated broadcast join of the
    * edge list with the node-cardinality label frame, then
    * partial+final counts on (dst, lbl), a max per dst, and the
    * argmin-of-argmax filter — all keyed aggregates, no
    * collect_list of neighborhoods, driver holds only the loop
    * counter. localCheckpoint per round (the pagerank discipline). */
  def lpaCommunities(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    lpaOf(weightedEdges(spark, sfDir, GraphWeightMin),
      longNodes(spark, sfDir), LpaRounds)
      .groupBy($"lbl").agg(count(lit(1)).as("comm_size"))
      .groupBy($"comm_size").agg(count(lit(1)).as("n_comms"))
      .orderBy($"comm_size")
  }

  /** [[lpaCommunities]]' loop over any directed edge frame `(src,
    * dst)` (both arcs present) and node frame `(a)`: returns `(a,
    * lbl)` after exactly `rounds` synchronous rounds. */
  def lpaOf(edges: DataFrame, nodes: DataFrame, rounds: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = cached("lpa-edges", edges)
    val n = nodes.count()
    var labels = nodes.select($"a", $"a".as("lbl")).localCheckpoint()
    var it = 0
    while (it < rounds) {
      val cnt = e
        .join(graft.util.Broadcasting.maybeBroadcast(labels, n),
          e("src") === labels("a"))
        .groupBy($"dst", $"lbl").agg(count(lit(1)).as("c"))
      // argmax with min-label tie-break as ONE MAX aggregate: the
      // highest count and, within it, the smallest label. Replaces
      // the round-15 shape cnt → per-dst max → equi-join back →
      // filter c=mx → min(lbl), which re-exchanged the per-(dst,lbl)
      // count frame and paid a join per round for what is a second
      // aggregate over the same key (guide §2.4: two operations
      // keyed the same way share one partitioning; measured sf0.1
      // rel_graph_lpa 2.42 → 1.75 s, modularity/entity_clusters
      // inherit). Oracle-identical: the SQL mirror's MAX() OVER
      // (PARTITION BY dst) + c = mx + MIN(lbl) selects exactly this
      // (count, label) pair.
      //
      // In the int-narrowed regime the (c, -lbl) order key is PACKED
      // into one long — (c << 32) | (IntMax − lbl), exact for the
      // whole int label range (IntMax − lbl ∈ [0, 2³²) is monotone
      // decreasing in lbl and never carries into the count word;
      // c ≤ |V| < 2³¹ keeps the sum under 2⁶³) — so the aggregate
      // stays a
      // HashAggregate with map-side partials; a struct order key
      // falls to SortAggregate (struct buffers are not
      // hash-aggregable), sorting the corpus-keyed count frame every
      // round. Long-id corpora (ids past 2³¹, where no packing is
      // possible) take the struct route.
      val isIntLbl = cnt.schema("lbl").dataType ==
        org.apache.spark.sql.types.IntegerType
      val best =
        if (isIntLbl)
          cnt.groupBy($"dst")
            .agg(max(shiftleft($"c", 32) +
              (lit(Int.MaxValue.toLong) - $"lbl")).as("p"))
            .select($"dst",
              (lit(Int.MaxValue.toLong) - $"p".bitwiseAND(lit(0xffffffffL)))
                .cast("int").as("nl"))
        else
          cnt.groupBy($"dst")
            .agg(max(struct($"c", (-$"lbl").as("neg"))).as("m"))
            .select($"dst", (-$"m.neg").as("nl"))
      val next = labels
        .join(best.select($"dst".as("a"), $"nl"), Seq("a"), "left")
        .select($"a", coalesce($"nl", $"lbl").as("lbl"))
        .localCheckpoint()
      labels.unpersist(blocking = false)
      labels = next
      it += 1
    }
    labels
  }

  /** Shared CTE prefix replaying [[lpaOf]]'s synchronous rounds —
    * `e` (thresholded arcs), `nodes`, and `l<rounds>` as `(a, lbl)`.
    * Feeds both the census oracle and the modularity oracle. */
  private def lpaCtes(minW: Int, rounds: Int): String = {
    val head =
      s"""movies AS MATERIALIZED (${Tables.moviesSql}),
         |sel AS MATERIALIZED (SELECT id, unnest(actors) AS a FROM movies),
         |e AS MATERIALIZED (
         |      SELECT CAST(x.a AS BIGINT) AS src, CAST(y.a AS BIGINT) AS dst
         |      FROM sel x JOIN sel y ON x.id = y.id AND x.a <> y.a
         |      GROUP BY 1, 2 HAVING COUNT(*) >= $minW),
         |nodes AS MATERIALIZED (SELECT DISTINCT CAST(a AS BIGINT) AS a FROM sel),
         |l0 AS (SELECT a, a AS lbl FROM nodes)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""c$i AS MATERIALIZED (
         |  SELECT e.dst AS a, p.lbl, COUNT(*) AS c
         |  FROM e JOIN l${i - 1} p ON e.src = p.a GROUP BY 1, 2),
         |b$i AS (
         |  SELECT a, MIN(lbl) AS nl FROM (
         |    SELECT a, lbl, c, MAX(c) OVER (PARTITION BY a) AS mx FROM c$i)
         |  WHERE c = mx GROUP BY a),
         |l$i AS MATERIALIZED (
         |  SELECT l.a, COALESCE(b.nl, l.lbl) AS lbl
         |  FROM l${i - 1} l LEFT JOIN b$i b USING (a))""".stripMargin
    }.mkString(",\n", ",\n", "")
    head + steps
  }

  def lpaCommunitiesSql(minW: Int = GraphWeightMin,
                        rounds: Int = LpaRounds): String =
    s"""WITH ${lpaCtes(minW, rounds)}
       |SELECT comm_size, COUNT(*) AS n_comms
       |FROM (SELECT lbl, COUNT(*) AS comm_size FROM l$rounds GROUP BY lbl)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  // rel_graph_modularity — partition-quality score of the LPA run
  // ---------------------------------------------------------------

  /** Newman modularity of the LPA partition — the evaluation rung of
    * the community ladder (CC answers reachability, LPA proposes
    * communities, Q says whether the proposal beats chance):
    *
    *   Q = Σ_c e_c/m  −  Σ_c (d_c/m)²
    *
    * over the directed-symmetric arc list (m = arc count = 2×edges,
    * e_c = intra-community arcs, d_c = community degree sum — the
    * directed formulation equals the textbook 2m form exactly).
    * One row: arc count, community count, largest community, and Q.
    *
    * Determinism: e_c, d_c, m are exact integers; Q is computed as
    * the single division (Σe_c·m − Σd_c²) / m² of two exact BIGINTs
    * — one correctly-rounded IEEE op, bit-identical cross-engine, no
    * round() anywhere. Overflow bound: m² must fit BIGINT, i.e.
    * m < 3·10⁹ arcs — beyond that route the two totals through
    * DECIMAL(38,0) (the [[Relational.tCloseness]] bound precedent).
    *
    * Scale: labels come from the shared [[lpaOf]] loop (tier-gated
    * joins, localCheckpoint); scoring adds two label equi-joins on
    * the arc list, a src-keyed degree aggregate, and three
    * keyed partial+final sums — nothing driver-side but the 1-row
    * card. */
  def graphModularity(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = weightedEdges(spark, sfDir, GraphWeightMin)
    val labels = lpaOf(edges, longNodes(spark, sfDir), LpaRounds)
    modularityOf(edges, labels)
  }

  /** [[graphModularity]] over any directed arc frame `(src, dst)`
    * and label frame `(a, lbl)` covering every arc endpoint. */
  private[graft] def modularityOf(edges: DataFrame,
                                  labels: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // lbl STAYS LONG here even when node ids are int-narrowed, and
    // that is a measured requirement, not a leftover: the e_in join's
    // condition merges `ls = ld` with `dst = dst`, and when BOTH keys
    // are int Spark packs them into one bigint broadcast key
    // (`dst<<32 | lbl`) whose LOW 32 bits are the label — a
    // few-distinct-values column — so the LongToUnsafeRowMap behind
    // the broadcast degenerates on key collisions: 8.3 s to build a
    // 200k-row relation vs 0.24 s with an unpackable (int, bigint)
    // key pair (round-15 probe, sf1). Label width is not exchange
    // volume here (the label frame is |V|-rows and broadcast), so the
    // long costs nothing the narrowing was buying.
    val lab = labels.select($"a", $"lbl".cast("long").as("lbl"))
      .localCheckpoint()
    // The scoring joins pair the CORPUS-sized arc list with the
    // NODE-sized label frame: say which side broadcasts, through the
    // same capacity tier every other kernel here uses, instead of
    // leaving it to size estimates. Round-15 lesson: the estimate for
    // the cached arc frame is the bucketed scan's bytes scaled by
    // projected row width, and the int-narrowed ids halved that —
    // dropping the arc frame under the broadcast threshold, so
    // Catalyst could BROADCAST THE EDGES (unbounded at corpus scale)
    // and stream the labels. An explicit tier-gated hint on the
    // label side is scale-correct at any id width: labels are
    // |V|-rows, arcs never ship.
    val nL = lab.count()
    def labB(cols: DataFrame): DataFrame =
      graft.util.Broadcasting.maybeBroadcast(cols, nL)
    val el = edges
      .join(labB(lab.select($"a".as("src"), $"lbl".as("ls"))), "src")
      .join(labB(lab.select($"a".as("dst"), $"lbl".as("ld"))), "dst")
    val eIn = el.filter($"ls" === $"ld")
      .groupBy($"ls".as("lbl")).agg(count(lit(1)).as("e_in"))
    val dTot = edges.groupBy($"src").agg(count(lit(1)).as("d"))
      .join(labB(lab.select($"a".as("src"), $"lbl")), "src")
      .groupBy($"lbl").agg(sum($"d").as("d_tot"))
    val m = edges.agg(count(lit(1)).as("m"))
    val comm = lab.groupBy($"lbl").agg(count(lit(1)).as("cs"))
      .agg(count(lit(1)).as("n_communities"), max($"cs").as("largest_comm"))
    val se = eIn.agg(coalesce(sum($"e_in"), lit(0L)).as("se"))
    val sd2 = dTot.agg(coalesce(sum($"d_tot" * $"d_tot"), lit(0L)).as("sd2"))
    m.crossJoin(comm).crossJoin(se).crossJoin(sd2) // four 1-row aggregates
      .select($"m".as("n_arcs"), $"n_communities", $"largest_comm",
        (($"se" * $"m" - $"sd2").cast("double") /
          ($"m" * $"m").cast("double")).as("q"))
  }

  def graphModularitySql(minW: Int = GraphWeightMin,
                         rounds: Int = LpaRounds): String =
    s"""WITH ${lpaCtes(minW, rounds)},
       |ein AS (SELECT p.lbl, CAST(COUNT(*) AS BIGINT) AS e_in
       |        FROM e JOIN l$rounds p ON e.src = p.a
       |               JOIN l$rounds q ON e.dst = q.a AND p.lbl = q.lbl
       |        GROUP BY 1),
       |deg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS d
       |        FROM e GROUP BY 1),
       |dt AS (SELECT p.lbl, CAST(SUM(d.d) AS BIGINT) AS d_tot
       |       FROM deg d JOIN l$rounds p ON d.src = p.a GROUP BY 1),
       |agg AS (SELECT
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS m,
       |  (SELECT CAST(COUNT(DISTINCT lbl) AS BIGINT) FROM l$rounds)
       |    AS n_communities,
       |  (SELECT CAST(MAX(cs) AS BIGINT) FROM
       |     (SELECT COUNT(*) AS cs FROM l$rounds GROUP BY lbl))
       |    AS largest_comm,
       |  CAST(COALESCE((SELECT SUM(e_in) FROM ein), 0) AS BIGINT) AS se,
       |  CAST(COALESCE((SELECT SUM(d_tot * d_tot) FROM dt), 0) AS BIGINT)
       |    AS sd2)
       |SELECT m AS n_arcs, n_communities, largest_comm,
       |  CAST(se * m - sd2 AS DOUBLE) / CAST(m * m AS DOUBLE) AS q
       |FROM agg""".stripMargin

  /** k-core of the repeat-collaboration graph: iteratively peel
    * nodes of remaining degree < k until the fixpoint; one summary
    * row `(n_nodes, n_core_nodes, n_core_edges, min_core_deg)` —
    * `min_core_deg ≥ k` (or 0 on an empty core) is the coreness
    * certificate carried in the result itself.
    *
    * Scale posture: per round one partial+final degree aggregate on
    * the bucketing key plus two anti-joins against the (small, and
    * shrinking) peeled-node frame — tier-gated broadcast, so the
    * surviving edge list never shuffles; the round count is the peel
    * depth, bounded by the degeneracy ordering (10 measured at
    * sf0.01). localCheckpoint per round; convergence witness is the
    * peeled count the round computes anyway. */
  def kcoreSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val core = kcoreOf(weightedEdges(spark, sfDir, GraphWeightMin),
      KCoreK, GraphMaxRounds)
    val nNodes = longNodes(spark, sfDir)
      .agg(count(lit(1)).as("n_nodes"))
    val coreNodes = core.agg(
      countDistinct($"src").as("n_core_nodes"),
      count(lit(1)).as("n_core_edges"))
    val minDeg = core.groupBy($"src").agg(count(lit(1)).as("d"))
      .agg(coalesce(min($"d"), lit(0L)).as("min_core_deg"))
    nNodes.crossJoin(coreNodes).crossJoin(minDeg) // three 1-row aggregates
  }

  /** [[kcoreSummary]]'s loop over any directed edge frame (both arcs
    * present): returns the surviving edge frame. */
  private[graft] def kcoreOf(edges: DataFrame, k: Int, maxRounds: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    var e = edges.localCheckpoint()
    var removed = -1L
    var it = 0
    while (removed != 0L && it < maxRounds) {
      val bad = e.groupBy($"src").agg(count(lit(1)).as("d"))
        .filter($"d" < k).select($"src".as("b"))
      removed = bad.count()
      if (removed != 0L) {
        val gated = graft.util.Broadcasting.maybeBroadcast(bad, removed)
        val next = e
          .join(gated, e("src") === $"b", "left_anti")
          .join(gated, e("dst") === $"b", "left_anti")
          .localCheckpoint()
        e.unpersist(blocking = false)
        e = next
      }
      it += 1
    }
    require(removed == 0L, s"$k-core peel did not converge within $maxRounds rounds")
    e
  }

  // ---------------------------------------------------------------
  // rel_graph_link_predict — common-neighbor link prediction
  // ---------------------------------------------------------------

  /** Intermediate-hub degree cap for two-path enumeration. */
  val LinkPredHubCap = 64

  /** Report the `k` strongest predicted links. */
  val LinkPredTopK = 20

  /** Link prediction over the co-actor graph: for every NON-adjacent
    * pair (a < b) score the missing edge by neighborhood Jaccard
    * |N(a)∩N(b)| / |N(a)∪N(b)| and report the top
    * [[LinkPredTopK]] — "which two actors who never appeared
    * together share the most collaborators". The common-neighbor
    * count enumerates two-paths a←z→b, the classic quadratic hazard:
    * a single hub of degree d contributes C(d,2) candidate pairs, so
    * the enumeration is capped to intermediates with
    * deg(z) ≤ [[LinkPredHubCap]] (the Adamic-Adar rationale made
    * hard: a z shared by everyone carries ~no signal, weighted
    * 1/log deg there, dropped here), bounding the join output by
    * cap·|E| — the standard production blocking for
    * friend-of-friend candidate generation. Union sizes use FULL
    * degrees, so the capped score is a documented lower bound of the
    * uncapped Jaccard (exact whenever every common neighbor is
    * sub-hub, which the spec pins on a fixture).
    *
    * Scale: degree frame and two-path join are src-keyed — bucket-
    * local on the materialized edge layout; the hub gate is a
    * semi-join BEFORE the two-path join (cap bounds the join INPUT,
    * not post-hoc output); non-adjacency is one anti-join; top-k is
    * TakeOrdered. Exact integer counts; the score is scaled-integer
    * floor division, bit-identical cross-engine. */
  def linkPredict(spark: SparkSession, sfDir: String,
                  k: Int = LinkPredTopK,
                  hubCap: Int = LinkPredHubCap): DataFrame = {
    import spark.implicits._
    // the two-path join's wedge stream (Σ sub-hub d² rows keyed by
    // the candidate pair) is the operator's big exchange — run it on
    // the corpus-narrowed numeric ids every other kernel shares, and
    // restore the string surface on the final k rows. Pairs are
    // canonicalized (and k-boundary ties broken) in NUMERIC id order,
    // matching [[linkPredictSql]]'s casts.
    linkPredictOf(coActorEdgesLong(spark, sfDir), k, hubCap)
      .select($"a".cast("string").as("a"), $"b".cast("string").as("b"),
        $"cn", $"jaccard")
  }

  /** [[linkPredict]] over any distinct directed symmetric edge frame
    * `(src, dst)`. */
  private[graft] def linkPredictOf(edges: DataFrame, k: Int,
                                   hubCap: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val deg = cached("linkpred-deg",
      edges.groupBy($"src").agg(count(lit(1)).as("d")))
    val zok = deg.filter($"d" <= hubCap).select($"src")
    val e1 = edges.join(zok, "src")
    val tp = e1.select($"src".as("z"), $"dst".as("a"))
      .join(e1.select($"src".as("z"), $"dst".as("b")), Seq("z"))
      .filter($"a" < $"b")
      .groupBy($"a", $"b").agg(count(lit(1)).as("cn"))
    tp.join(edges, tp("a") === edges("src") && tp("b") === edges("dst"),
        "left_anti")
      .join(deg.select($"src".as("a"), $"d".as("da")), "a")
      .join(deg.select($"src".as("b"), $"d".as("db")), "b")
      // scaled-integer floor division (the dataSkewReport precedent):
      // round() after a double divide is engine-divergent on
      // half-boundary rationals like cn/(da+db-cn)
      .select($"a", $"b", $"cn",
        (expr("CAST((cn * 1000000) DIV (da + db - cn) AS BIGINT)")
          .cast("double") / 1000000.0).as("jaccard"))
      .orderBy($"jaccard".desc, $"a", $"b")
      .limit(k)
  }

  def linkPredictSql(k: Int = LinkPredTopK,
                     hubCap: Int = LinkPredHubCap): String =
    s"""WITH movies AS MATERIALIZED (${Tables.moviesSql}),
       |am AS MATERIALIZED (SELECT id, unnest(actors) AS a FROM movies),
       |e AS MATERIALIZED (
       |  SELECT DISTINCT x.a AS src, y.a AS dst
       |  FROM am x JOIN am y ON x.id = y.id AND x.a <> y.a),
       |deg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS d
       |        FROM e GROUP BY src),
       |e1 AS (SELECT e.src, e.dst FROM e
       |       JOIN deg ON deg.src = e.src AND deg.d <= $hubCap),
       |tp AS (SELECT p.dst AS a, q.dst AS b, CAST(COUNT(*) AS BIGINT) AS cn
       |       FROM e1 p JOIN e1 q ON p.src = q.src
       |         AND CAST(p.dst AS BIGINT) < CAST(q.dst AS BIGINT)
       |       GROUP BY 1, 2),
       |na AS (SELECT tp.a, tp.b, tp.cn FROM tp
       |       WHERE NOT EXISTS (SELECT 1 FROM e
       |                         WHERE e.src = tp.a AND e.dst = tp.b))
       |SELECT na.a, na.b, na.cn,
       |  CAST((na.cn * 1000000) // (d1.d + d2.d - na.cn) AS DOUBLE)
       |    / 1000000.0 AS jaccard
       |FROM na JOIN deg d1 ON d1.src = na.a
       |        JOIN deg d2 ON d2.src = na.b
       |ORDER BY jaccard DESC, CAST(a AS BIGINT), CAST(b AS BIGINT)
       |LIMIT $k""".stripMargin

  // ---------------------------------------------------------------
  // rel_graph_assortativity — degree-mixing coefficient
  // ---------------------------------------------------------------

  /** Degree assortativity of the co-actor graph: the Pearson
    * correlation of (deg(src), deg(dst)) over every arc —
    * Newman's r, the one-number answer to "do hubs collaborate with
    * hubs (r > 0, social-network mixing) or with the periphery
    * (r < 0, technological/star mixing)". On the both-arcs
    * representation the two marginals are identical by symmetry
    * (Σx = Σy, Σx² = Σy² — a spec invariant), and r reduces to the
    * textbook undirected coefficient.
    *
    * Determinism: all six moments (m, Σx, Σy, Σxy, Σx², Σy²) are
    * exact BIGINT sums of integer degrees; r is ONE
    * fixed-parenthesization double chain over them (+,−,×,÷,sqrt —
    * all correctly-rounded IEEE, bit-identical cross-engine, no
    * rounding step). On a degree-regular graph the variance is zero
    * and r is NaN in BOTH engines (undefined by the definition,
    * surfaced rather than masked — the zero denominator is CASE-
    * guarded because ANSI Spark raises on it where DuckDB would
    * not). Overflow bound:
    * Σxy ≤ maxdeg²·|E| must fit BIGINT — past ~10¹⁸ route the
    * moment sums through DECIMAL(38,0).
    *
    * Scale: the degree frame is one src-keyed aggregate
    * (bucket-local on the materialized layout); each arc picks up
    * its endpoint degrees via two equi-joins; the moments are ONE
    * partial+final aggregate. Driver sees six longs. */
  def graphAssortativity(spark: SparkSession, sfDir: String): DataFrame =
    // long ids: r depends only on degrees, so the cast changes no
    // output value — but the two degree equi-joins hash longs instead
    // of strings, and the degree frame is the session-shared one
    assortativityOf(coActorEdgesLong(spark, sfDir))

  /** [[graphAssortativity]] over any directed arc frame
    * `(src, dst)`. */
  private[graft] def assortativityOf(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val deg = cachedDeg(edges)
    // same posture as modularityOf: the degree frame is the
    // node-sized side — tier-broadcast it explicitly so size
    // estimates can never elect to broadcast the arc list instead
    // (deg is cached, so the bound count is one cheap scan)
    val nD = deg.count()
    edges
      .join(graft.util.Broadcasting.maybeBroadcast(
        deg.select($"src", $"d".as("dx")), nD), "src")
      .join(graft.util.Broadcasting.maybeBroadcast(
        deg.select($"src".as("dst"), $"d".as("dy")), nD), "dst")
      .agg(count(lit(1)).as("m"),
        sum($"dx").as("sx"), sum($"dy").as("sy"),
        sum($"dx" * $"dy").as("sxy"),
        sum($"dx" * $"dx").as("sxx"),
        sum($"dy" * $"dy").as("syy"))
      .select($"m", $"sx", $"sy", expr(AssortativityExpr).as("r"))
  }

  /** The r chain — ONE text shared by the Spark `expr` and the
    * oracle so the double arithmetic associates identically. */
  private val AssortativityExpr: String =
    """(CASE WHEN sqrt((CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |          * (CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) = 0.0
      |  THEN CAST('NaN' AS DOUBLE)
      |  ELSE (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |   / sqrt((CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |          * (CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
      |  END)""".stripMargin

  def graphAssortativitySql(): String =
    s"""WITH movies AS MATERIALIZED (${Tables.moviesSql}),
       |am AS MATERIALIZED (SELECT id, unnest(actors) AS a FROM movies),
       |e AS MATERIALIZED (
       |  SELECT DISTINCT x.a AS src, y.a AS dst
       |  FROM am x JOIN am y ON x.id = y.id AND x.a <> y.a),
       |deg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS d
       |        FROM e GROUP BY src),
       |mom AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
       |    CAST(SUM(dx.d) AS BIGINT) AS sx,
       |    CAST(SUM(dy.d) AS BIGINT) AS sy,
       |    CAST(SUM(dx.d * dy.d) AS BIGINT) AS sxy,
       |    CAST(SUM(dx.d * dx.d) AS BIGINT) AS sxx,
       |    CAST(SUM(dy.d * dy.d) AS BIGINT) AS syy
       |  FROM e JOIN deg dx ON dx.src = e.src
       |         JOIN deg dy ON dy.src = e.dst)
       |SELECT m, sx, sy, $AssortativityExpr AS r
       |FROM mom""".stripMargin

  def kcoreSummarySql(k: Int = KCoreK, minW: Int = GraphWeightMin,
                      rounds: Int = GraphMaxRounds): String = {
    val head =
      s"""WITH movies AS MATERIALIZED (${Tables.moviesSql}),
         |sel AS MATERIALIZED (SELECT id, unnest(actors) AS a FROM movies),
         |e0 AS MATERIALIZED (
         |       SELECT CAST(x.a AS BIGINT) AS src, CAST(y.a AS BIGINT) AS dst
         |       FROM sel x JOIN sel y ON x.id = y.id AND x.a <> y.a
         |       GROUP BY 1, 2 HAVING COUNT(*) >= $minW),
         |nodes AS (SELECT DISTINCT CAST(a AS BIGINT) AS a FROM sel)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""e$i AS MATERIALIZED (
         |  SELECT e.src, e.dst FROM e${i - 1} e
         |  JOIN (SELECT src FROM e${i - 1} GROUP BY src
         |        HAVING COUNT(*) >= $k) s ON e.src = s.src
         |  JOIN (SELECT src FROM e${i - 1} GROUP BY src
         |        HAVING COUNT(*) >= $k) t ON e.dst = t.src)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"""$head$steps
       |SELECT (SELECT COUNT(*) FROM nodes) AS n_nodes,
       |  (SELECT COUNT(DISTINCT src) FROM e$rounds) AS n_core_nodes,
       |  (SELECT COUNT(*) FROM e$rounds) AS n_core_edges,
       |  (SELECT CAST(COALESCE(MIN(d), 0) AS BIGINT) FROM
       |     (SELECT COUNT(*) AS d FROM e$rounds GROUP BY src)) AS min_core_deg""".stripMargin
  }

  // ---------------------------------------------------------------
  // rel_graph_clustering_coeff — transitivity + mean local CC
  // ---------------------------------------------------------------

  /** Clustering coefficients of the co-actor graph: global
    * transitivity 3·triangles/wedges and the mean LOCAL coefficient
    * c(v) = t(v) / C(d(v), 2) over vertices with degree ≥ 2 — the
    * two standard "how clique-like is this network" readouts (they
    * genuinely differ: transitivity weights hubs by their wedge
    * count, the local mean weights every vertex equally).
    *
    * Triangle enumeration reuses the degree-oriented wedge plan
    * [[triangleCountOf]] proved out (same session-cache key, so the
    * oriented edge list is shared when both queries run): every
    * wedge enumerates at its unique orientation source, closes via
    * one canonical-pair equi-join, and each triangle surfaces
    * exactly once — then explodes to its 3 vertices for the local
    * counts. Out-degrees are bounded by √(2|E|), so the wedge
    * stream is Σ out-deg(v)² — the power-law-safe bound.
    *
    * Determinism: wedges Σ d(d−1)/2, per-vertex triangle counts,
    * and Σt = 3·triangles are all exact BIGINTs; transitivity is
    * ONE shared-text double division (CASE-guarded: wedge-free →
    * NaN); each local coefficient floor-scales to the 1e-6 grid
    * BEFORE the mean (double averaging would be order-dependent)
    * and the mean is one floor division. Driver sees four scalars.
    */
  def graphClusteringCoeff(spark: SparkSession, sfDir: String): DataFrame =
    clusteringCoeffOf(coActorEdgesLong(spark, sfDir))

  /** [[graphClusteringCoeff]] over any directed arc frame
    * `(src, dst)` holding BOTH arcs of each undirected edge. */
  private[graft] def clusteringCoeffOf(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // narrow FIRST so the degree/orientation/adjacency frames (and
    // their session-cache keys) are shared with triangleCountOf
    val edgesN = narrowIds(edges)
    val deg = cachedDeg(edgesN)
    // identical construction (and cache key) to triangleCountOf's
    // orientation, so the two queries share one cached frame —
    // likewise the degree frame and the adjacency build side below
    val oriented = orientedEdges(edgesN)
    // ONE triangle enumeration, capacity-tiered JOIN STRATEGY (the
    // round-11 triangleCountOf rewrite, carried here): for oriented
    // (u,v), every w ∈ N⁺(u) ∩ N⁺(v) closes exactly one triangle
    // (u = source, v = middle, w = sink in the acyclic orientation);
    // the explode emits |triangles| rows. Past the broadcast cap the
    // SAME plan degrades to shuffled-hash joins of the |E|-row
    // adjacency table — the retired wedge tier shuffled one row per
    // wedge (Σ outdeg² rows) and measured 25× linear at a 10× step.
    val nE = oriented.count()
    val adj = orientedAdj(oriented)
    // inner joins: an edge whose endpoint has no out-neighbors
    // closes no triangle — dropping it early is correct and keeps
    // the plan type-generic (no hardcoded empty-array type)
    val triVerts = oriented
      .join(graft.util.Broadcasting.maybeBroadcast(
        adj.select($"src", $"nbrs".as("nu")), nE), Seq("src"))
      .join(graft.util.Broadcasting.maybeBroadcast(
        adj.select($"src".as("dst"), $"nbrs".as("nv")), nE), Seq("dst"))
      .select($"src".as("v"), $"dst".as("a"),
        explode(graft.functions.GraphExpressions
          .sorted_intersect($"nu", $"nv")).as("b"))
      .select(explode(array($"v", $"a", $"b")).as("u"))
    val tv = triVerts.groupBy($"u").agg(count(lit(1)).as("t"))
    // every triangle vertex has degree >= 2, so the d>=2 frame sees
    // the full triangle mass: sum(t) over it is exactly 3*triangles
    val locals = deg.filter($"d" >= 2L)
      .select($"src".as("v2"), $"d")
      .join(tv, $"v2" === $"u", "left")
      .select($"d", coalesce($"t", lit(0L)).as("t"))
      .select($"d", $"t", expr("t * 2000000 DIV (d * (d - 1))").as("cc6"))
    val wAgg = deg.agg(
      coalesce(sum(expr("d * (d - 1) DIV 2")), lit(0L)).as("w"))
    val lAgg = locals.agg(count(lit(1)).as("n2"),
      coalesce(sum($"t"), lit(0L)).as("t3"),
      coalesce(sum($"cc6"), lit(0L)).as("s6"))
    wAgg.crossJoin(lAgg).select( // two 1-row aggregates
      $"w".as("n_wedges"),
      expr("t3 DIV 3").as("n_triangles"),
      expr(TransitivityExpr).as("transitivity"),
      expr("""CASE WHEN n2 = 0 THEN CAST('NaN' AS DOUBLE)
             |ELSE CAST(s6 DIV n2 AS DOUBLE) / 1000000.0 END"""
        .stripMargin).as("avg_local_cc"))
  }

  /** Transitivity chain — ONE text shared by the Spark `expr` and
    * the oracle (t3 = 3·triangles, so this IS 3T/W). */
  private val TransitivityExpr: String =
    """(CASE WHEN w = 0 THEN CAST('NaN' AS DOUBLE)
      |  ELSE CAST(t3 AS DOUBLE) / CAST(w AS DOUBLE) END)""".stripMargin

  def graphClusteringCoeffSql(): String =
    s"""WITH movies AS MATERIALIZED (${Tables.moviesSql}),
       |am AS MATERIALIZED (SELECT id, unnest(actors) AS a FROM movies),
       |e AS MATERIALIZED (
       |  SELECT DISTINCT CAST(x.a AS BIGINT) AS src, CAST(y.a AS BIGINT) AS dst
       |  FROM am x JOIN am y ON x.id = y.id AND x.a <> y.a),
       |deg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS d
       |        FROM e GROUP BY src),
       |o AS MATERIALIZED (
       |  SELECT e.src, e.dst FROM e
       |  JOIN deg dx ON dx.src = e.src JOIN deg dy ON dy.src = e.dst
       |  WHERE dx.d < dy.d OR (dx.d = dy.d AND e.src < e.dst)),
       |tri AS (
       |  SELECT unnest([wg.v, wg.a, wg.b]) AS u
       |  FROM (SELECT e1.src AS v, LEAST(e1.dst, e2.dst) AS a,
       |               GREATEST(e1.dst, e2.dst) AS b
       |        FROM o e1 JOIN o e2
       |          ON e1.src = e2.src AND e1.dst < e2.dst) wg
       |  JOIN (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       |        FROM o) c ON wg.a = c.a AND wg.b = c.b),
       |tv AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS t FROM tri GROUP BY u),
       |loc AS (
       |  SELECT d.d, COALESCE(tv.t, 0) AS t,
       |    COALESCE(tv.t, 0) * 2000000 // (d.d * (d.d - 1)) AS cc6
       |  FROM deg d LEFT JOIN tv ON tv.u = d.src WHERE d.d >= 2),
       |agg AS (SELECT
       |  (SELECT CAST(COALESCE(SUM(d * (d - 1) // 2), 0) AS BIGINT)
       |   FROM deg) AS w,
       |  CAST(COUNT(*) AS BIGINT) AS n2,
       |  CAST(COALESCE(SUM(t), 0) AS BIGINT) AS t3,
       |  CAST(COALESCE(SUM(cc6), 0) AS BIGINT) AS s6 FROM loc)
       |SELECT w AS n_wedges, t3 // 3 AS n_triangles,
       |  $TransitivityExpr AS transitivity,
       |  CASE WHEN n2 = 0 THEN CAST('NaN' AS DOUBLE)
       |       ELSE CAST(s6 // n2 AS DOUBLE) / 1000000.0 END AS avg_local_cc
       |FROM agg""".stripMargin
}
