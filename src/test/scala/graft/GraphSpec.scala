package graft

import graft.operators.{Graph, Relational}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite with SparkSpec {

  test("pagerank ranks are positive, mass-conserved, and deterministic") {
    import spark.implicits._
    val top = Graph.pagerankActors(spark, sf).as[(String, Double)].collect()
    assert(top.length == 20)
    assert(top.forall(_._2 > 0))
    // synchronous updates: rank is sorted non-increasing in the output
    assert(top.map(_._2).toSeq == top.map(_._2).toSeq.sortBy(-_))
    // dangling-mass redistribution: Σr = 1 after every iteration,
    // modulo the rounding contract (8 decimals in-loop, 6 on output —
    // a ±5e-7·N presentation residue). Re-run the full frame (not the
    // top-20) for the sum.
    val again = Graph.pagerankActors(spark, sf, k = Int.MaxValue)
      .as[(String, Double)].collect()
    val mass = again.map(_._2).sum
    assert(math.abs(mass - 1.0) < 1e-3, s"rank mass $mass not conserved")
    // same inputs, same ranks — the fixed-point arithmetic is pinned
    assert(again.sortBy(_._1).take(20).toSeq ==
      Graph.pagerankActors(spark, sf, k = Int.MaxValue)
        .as[(String, Double)].collect().sortBy(_._1).take(20).toSeq)
  }

  test("weighted pagerank: unit weights reduce to the plain walk, corpus mass conserved") {
    import spark.implicits._
    // on a unit-weight graph the weighted update IS the unweighted
    // one (wt/W(u) == 1/deg(u)) — bit-for-bit under the shared 8-dp
    // rounding contract
    val und = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val nodes = (1L to 5L).toDF("a") // node 5 isolated: teleport-only
    val unit = edges.withColumn("wt", lit(1L))
    val w = Graph.pagerankWeightedOf(unit, nodes)
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    val u = Graph.pagerankOf(edges, nodes)
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(w == u, s"unit-weight walk diverged:\n$w\n$u")
    // skewed weights steer mass: double every 3->4 arc weight and
    // node 4 must outrank its unit-weight self
    val skewed = unit.withColumn("wt",
      when($"src" === 3L && $"dst" === 4L, lit(9L)).otherwise($"wt"))
    val s = Graph.pagerankWeightedOf(skewed, nodes)
      .as[(Long, Double)].collect().toMap
    assert(s(4L) > u.toMap.apply(4L), s"weight skew did not raise node 4: $s")
    // corpus: mass conservation under the same rounding contract
    val all = Graph.pagerankWeightedActors(spark, sf, k = Int.MaxValue)
      .as[(String, Double)].collect()
    val mass = all.map(_._2).sum
    assert(math.abs(mass - 1.0) < 1e-3, s"weighted rank mass $mass")
  }

  test("graph trio shares ONE cached co-actor edge derivation") {
    // the explode → self-join → distinct edge build is the expensive
    // shared prefix of pagerank/triangles/k-hop: every call must get
    // the SAME cached frames back (the FrameCache returns the stored
    // instance on a hit), so a session pays the derivation once
    val (e1, n1) = Graph.coActorEdges(spark, sf)
    val (e2, n2) = Graph.coActorEdges(spark, sf)
    assert((e1 eq e2) && (n1 eq n2),
      "co-actor edges/nodes rebuilt instead of reused from the session cache")
  }

  test("pagerank ε-tier exits early on a converged graph, same ranks") {
    import spark.implicits._
    // a 2-regular symmetric triangle: the uniform start vector IS the
    // stationary distribution, so the first update is a no-op and the
    // L1 delta is 0 — the ε-tier must stop after iteration 1
    val und = Seq((1, 2), (2, 3), (3, 1))
    val edges = (und ++ und.map(_.swap)).map { case (a, b) => (a.toString, b.toString) }
      .toDF("src", "dst")
    val nodes = Seq("1", "2", "3").toDF("a")
    val (ranks, itersRun) = Graph.pagerankWithStats(edges, nodes,
      iters = 10, eps = 1e-9)
    assert(itersRun == 1, s"converged fixture ran $itersRun iterations")
    val got = ranks.as[(String, Double)].collect().toMap
    assert(got.keySet == Set("1", "2", "3"))
    got.values.foreach(r => assert(math.abs(r - 1.0 / 3) < 1e-6))
    // on the real graph the ε route (stopping at whatever t it
    // converges) equals the fixed-iteration route run for the same t
    val (epsRanks, t) = Graph.pagerankWithStats(
      Graph.coActorEdges(spark, sf)._1, Graph.coActorEdges(spark, sf)._2,
      iters = 8, eps = 1e-4)
    assert(t <= 8)
    val fixed = Graph.pagerankOf(
      Graph.coActorEdges(spark, sf)._1, Graph.coActorEdges(spark, sf)._2,
      iters = t)
    assert(epsRanks.as[(String, Double)].collect().sortBy(_._1).toSeq ==
      fixed.as[(String, Double)].collect().sortBy(_._1).toSeq)
  }

  test("ppr and weighted pagerank ε-tiers: early exit, equal to fixed-iters at the same t") {
    import spark.implicits._
    val (edges, nodes) = (Graph.coActorEdges(spark, sf)._1,
      Graph.coActorEdges(spark, sf)._2)
    val seed = nodes.agg(min($"a").as("a"))
    // ε route stops at some t ≤ iters; the fixed route run for the
    // SAME t must return identical ranks (the pagerank ε contract,
    // extended to the #2/#6 heaviest queries — round-10 item 5)
    val (pprEps, tP) = Graph.pprWithStats(edges, nodes, seed,
      iters = 8, eps = 1e-4)
    assert(tP <= 8 && tP >= 1)
    val pprFixed = Graph.pprOf(edges, nodes, seed, iters = tP)
    assert(pprEps.as[(String, Double)].collect().sortBy(_._1).toSeq ==
      pprFixed.as[(String, Double)].collect().sortBy(_._1).toSeq)
    // weighted: same contract over the weighted arc frame
    val wEdges = graft.sources.Tables.coActorEdgesBucketed(spark, sf)
      .select($"src", $"dst", $"wt")
    val (wEps, tW) = Graph.pagerankWeightedWithStats(wEdges, nodes,
      iters = 8, eps = 1e-4)
    assert(tW <= 8 && tW >= 1)
    val wFixed = Graph.pagerankWeightedOf(wEdges, nodes, iters = tW)
    assert(wEps.as[(String, Double)].collect().sortBy(_._1).toSeq ==
      wFixed.as[(String, Double)].collect().sortBy(_._1).toSeq)
    // a genuinely converged uniform fixture must exit after round 1:
    // 2-regular symmetric triangle with unit weights
    val und = Seq((1, 2), (2, 3), (3, 1))
    val triW = (und ++ und.map(_.swap))
      .map { case (a, b) => (a.toString, b.toString, 1L) }
      .toDF("src", "dst", "wt")
    val tri = triW.select($"src", $"dst")
    val triN = Seq("1", "2", "3").toDF("a")
    assert(Graph.pprWithStats(tri, triN, triN.select($"a"),
      iters = 10, eps = 1e-9)._2 == 1)
    assert(Graph.pagerankWeightedWithStats(triW, triN,
      iters = 10, eps = 1e-9)._2 == 1)
  }

  test("triangle count is exact on a known graph") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles) plus a pendant 5-1 (0 triangles)
    val und = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5))
    val edges = (und ++ und.map(_.swap)).map { case (a, b) => (a.toString, b.toString) }
      .toDF("src", "dst")
    val nodes = (1 to 5).map(_.toString).toDF("a")
    val r = Graph.triangleCountOf(edges, nodes)
      .as[(Long, Long, Long)].head()
    assert(r == ((5L, 7L, 4L)), s"got $r")
  }

  test("khop BFS: min-hop fixture, early exit, and tier-forced route agree") {
    import spark.implicits._
    // diamond 1→{2,3}→4 plus tail 4→5 and isolated 6: node 4 is
    // reachable at hop 2 two ways but must appear ONCE with hop 2
    val und = Seq((1, 2), (1, 3), (2, 4), (3, 4), (4, 5))
    val edges = (und ++ und.map(_.swap)).map { case (a, b) => (a.toLong, b.toLong) }
      .toDF("src", "dst")
    val seed = Seq(1L).toDF("a")
    val got = Graph.khopOf(edges, seed, 3).as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 0L), (2L, 1L), (3L, 1L), (4L, 2L), (5L, 3L)))
    // hops past the eccentricity terminate early and add nothing
    assert(Graph.khopOf(edges, seed, 10).as[(Long, Long)].collect().toSet == got)
    // cap 0 forces the shuffled frontier join; result identical
    spark.conf.set(graft.util.Broadcasting.maxRowsKey, "0")
    try assert(Graph.khopOf(edges, seed, 3).as[(Long, Long)].collect().toSet == got)
    finally spark.conf.unset(graft.util.Broadcasting.maxRowsKey)
  }

  test("connected components: fixture census, isolates kept, tier-forced route agrees") {
    import spark.implicits._
    // components: triangle {1,2,3}, path {4,5} (diameter stresses
    // propagation rounds via 5→4), isolates {6,7}
    val und = Seq((1, 2), (2, 3), (1, 3), (4, 5))
    val edges = (und ++ und.map(_.swap)).map { case (a, b) => (a.toLong, b.toLong) }
      .toDF("src", "dst")
    val nodes = (1L to 7L).toDF("a")
    val labels = Graph.ccOf(edges, nodes, maxRounds = 10)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L,
      6L -> 6L, 7L -> 7L))
    // too few rounds to converge must fail loudly, not return wrong labels
    val longPath = (1 to 6).map(i => (i.toLong, (i + 1).toLong))
    val pathEdges = (longPath ++ longPath.map(_.swap)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Graph.ccOf(pathEdges, (1L to 7L).toDF("a"), maxRounds = 2).count()
    }
    // cap 0 forces the shuffled label join; labels identical
    spark.conf.set(graft.util.Broadcasting.maxRowsKey, "0")
    try assert(Graph.ccOf(edges, nodes, maxRounds = 10)
      .as[(Long, Long)].collect().toMap == labels)
    finally spark.conf.unset(graft.util.Broadcasting.maxRowsKey)
    // corpus census: sizes partition the actor set
    val census = Graph.connectedComponents(spark, sf)
      .as[(Long, Long)].collect().toSeq
    val totalActors = graft.sources.Tables.movies(spark, sf)
      .select(explode($"actors")).distinct().count()
    assert(census.map { case (size, n) => size * n }.sum == totalActors)
  }

  test("int-narrowed ids: iterative kernels agree with the long route; corpus edges narrowed") {
    import spark.implicits._
    // the round-15 narrowing extension: cc/lpa/khop must be id-width
    // agnostic — run each on the SAME fixture with long then int ids
    // and compare results exactly (the SortedIntersectSpec discipline,
    // extended to an iterative op per the round-14 verdict ask)
    val und = Seq((1, 2), (2, 3), (1, 3), (4, 5))
    val edgesL = (und ++ und.map(_.swap))
      .map { case (a, b) => (a.toLong, b.toLong) }.toDF("src", "dst")
    val edgesI = edgesL.select(
      $"src".cast("int").as("src"), $"dst".cast("int").as("dst"))
    val nodesL = (1L to 7L).toDF("a")
    val nodesI = nodesL.select($"a".cast("int").as("a"))

    val ccL = Graph.ccOf(edgesL, nodesL, maxRounds = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val ccI = Graph.ccOf(edgesI, nodesI, maxRounds = 10).collect()
      .map(r => (r.getInt(0).toLong, r.getInt(1).toLong)).toMap
    assert(ccI == ccL)

    val lpaL = Graph.lpaOf(edgesL, nodesL, rounds = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val lpaI = Graph.lpaOf(edgesI, nodesI, rounds = 4).collect()
      .map(r => (r.getInt(0).toLong, r.getInt(1).toLong)).toMap
    assert(lpaI == lpaL)

    val seedL = Seq(1L).toDF("a")
    val khopL = Graph.khopOf(edgesL, seedL, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val khopI = Graph.khopOf(edgesI, seedL.select($"a".cast("int").as("a")), 3)
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1))).toSet
    assert(khopI == khopL)

    // tolerance, not exact Map equality: rank sums accumulate in
    // shuffle-partition order, and int- vs long-key murmur hashes
    // partition differently, so the two runs may differ by an ulp on
    // another partition count / Spark version (round-15 ADVICE)
    val prL = Graph.pagerankOf(edgesL, nodesL, iters = 4).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val prI = Graph.pagerankOf(edgesI, nodesI, iters = 4).collect()
      .map(r => (r.getInt(0).toLong, r.getDouble(1))).toMap
    assert(prI.keySet == prL.keySet)
    prL.foreach { case (a, r) =>
      assert(math.abs(prI(a) - r) <= 1e-12 * math.max(1.0, math.abs(r)),
        s"rank mismatch at node $a: ${prI(a)} vs $r")
    }

    // the corpus decision actually fires: test-sf actor ids are
    // stringified part keys well inside 2^31, so the shared numeric
    // edge frame must come out int-typed
    val corpusTypes = Graph.coActorEdgesLong(spark, sf)
      .schema.fields.map(_.dataType.typeName).toSet
    assert(corpusTypes == Set("integer"),
      s"expected int-narrowed corpus edge ids, got $corpusTypes")
  }

  test("personalized pagerank: exact fixture replay, seed locality on the corpus") {
    import spark.implicits._
    // path 1-2-3-4 plus isolate 5, seeded at "1": teleport and
    // dangling mass go to the seed only
    val und = Seq(("1", "2"), ("2", "3"), ("3", "4"))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val nodes = Seq("1", "2", "3", "4", "5").toDF("a")
    val seed = Seq("1").toDF("a")
    val got = Graph.pprOf(edges, nodes, seed, iters = 5)
      .as[(String, Double)].collect().toMap
    // independent replay: same recursion in plain Scala arrays with
    // the same 8-dp in-loop rounding
    def r8(x: Double) = BigDecimal(x)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    val deg = Map("1" -> 1, "2" -> 2, "3" -> 2, "4" -> 1)
    val adjIn = Map("1" -> Seq("2"), "2" -> Seq("1", "3"),
      "3" -> Seq("2", "4"), "4" -> Seq("3"))
    var r = Map("1" -> 1.0, "2" -> 0.0, "3" -> 0.0, "4" -> 0.0, "5" -> 0.0)
    for (_ <- 1 to 5) {
      val m = r("5") // the only dangling node
      r = r.map { case (v, _) =>
        val c = adjIn.getOrElse(v, Seq.empty).map(u => r(u) / deg(u)).sum
        val t = if (v == "1") 1.0 else 0.0
        v -> r8(0.15 * t + 0.85 * (c + m * t))
      }
    }
    assert(got == r, s"got $got, want $r")
    // locality: unreachable nodes stay at exactly zero, and mass
    // concentrates in the seed's 1-hop ball (note r(2) > r(1) is
    // CORRECT here — a degree-1 seed pushes its whole non-teleport
    // mass to its only neighbor each round)
    assert(got("5") == 0.0)
    assert(got("1") + got("2") > got("3") + got("4"))
    // seed keeps its full teleport floor: r(seed) ≥ 1 − d
    assert(got("1") >= 0.15)
    // corpus: ranks non-negative and the min-id seed is in the top-k
    // (its rank ≥ 0.15 while total mass ≤ 1, so at most 6 nodes can
    // outrank it — a theorem, not a heuristic)
    val top = Graph.pprActors(spark, sf).as[(String, Double)].collect()
    assert(top.length == 20 && top.map(_._2).forall(_ >= 0))
    val minActor = graft.sources.Tables.movies(spark, sf)
      .select(explode($"actors").as("a")).agg(min($"a")).as[String].head()
    assert(top.map(_._1).contains(minActor),
      s"seed $minActor not in top-20: ${top.take(5).toSeq}")
  }

  test("contraction CC: labels match min-label route; O(log n) rounds on a chain") {
    import spark.implicits._
    // same fixture as the min-label test: triangle, path, two isolates
    val und = Seq((1, 2), (2, 3), (1, 3), (4, 5))
    val edges = (und ++ und.map(_.swap)).map { case (a, b) => (a.toLong, b.toLong) }
      .toDF("src", "dst")
    val nodes = (1L to 7L).toDF("a")
    val labels = Graph.ccContractOf(edges, nodes, maxRounds = 10)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L,
      6L -> 6L, 7L -> 7L))
    // the round-complexity separation the operator exists for: a
    // 100-node chain has diameter 99, so min-label propagation CANNOT
    // converge in 12 rounds — contraction must (O(log n) alternations)
    val chain = (1 to 99).map(i => (i.toLong, (i + 1).toLong))
    val chainEdges = (chain ++ chain.map(_.swap)).toDF("src", "dst")
    val chainNodes = (1L to 100L).toDF("a")
    val (chainLabels, rounds) =
      Graph.ccContractRounds(chainEdges, chainNodes, maxRounds = 12)
    assert(chainLabels.as[(Long, Long)].collect().forall(_._2 == 1L))
    assert(rounds <= 12, s"contraction took $rounds alternations on a 100-chain")
    intercept[IllegalArgumentException] {
      Graph.ccOf(chainEdges, chainNodes, maxRounds = 12).count()
    }
    // tier cap 0 forces shuffled min-frame joins; labels identical
    spark.conf.set(graft.util.Broadcasting.maxRowsKey, "0")
    try assert(Graph.ccContractOf(edges, nodes, maxRounds = 10)
      .as[(Long, Long)].collect().toMap == labels)
    finally spark.conf.unset(graft.util.Broadcasting.maxRowsKey)
    // both routes agree on the corpus census — the equivalence that
    // lets rel_graph_cc_contract share the min-label oracle
    val viaContract = Graph.connectedComponentsContract(spark, sf)
      .as[(Long, Long)].collect().toSeq
    val viaLabels = Graph.connectedComponents(spark, sf)
      .as[(Long, Long)].collect().toSeq
    assert(viaContract == viaLabels)
  }

  test("LPA communities: hand-walked sync rounds split the barbell, isolates keep labels") {
    import spark.implicits._
    // two triangles {1,2,3} and {4,5,6} bridged by 3-4, isolate 7:
    // hand-walked synchronous min-tie-break LPA settles at
    // (1,1,1,3,3,3) by round 4 — the bridge does NOT merge the
    // communities, which is exactly the density split CC can't give
    val und = Seq((1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4))
    val edges = (und ++ und.map(_.swap)).map { case (a, b) => (a.toLong, b.toLong) }
      .toDF("src", "dst")
    val nodes = (1L to 7L).toDF("a")
    val labels = Graph.lpaOf(edges, nodes, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L,
      6L -> 3L, 7L -> 7L), s"got $labels")
    // tier cap 0 forces the shuffled label join; labels identical
    spark.conf.set(graft.util.Broadcasting.maxRowsKey, "0")
    try assert(Graph.lpaOf(edges, nodes, rounds = 4)
      .as[(Long, Long)].collect().toMap == labels)
    finally spark.conf.unset(graft.util.Broadcasting.maxRowsKey)
    // corpus census: community sizes partition the actor set, and
    // LPA refines (or equals) the component structure — at least as
    // many communities as components
    val census = Graph.lpaCommunities(spark, sf).as[(Long, Long)].collect()
    val total = graft.sources.Tables.movies(spark, sf)
      .select(explode($"actors")).distinct().count()
    assert(census.map { case (s, n) => s * n }.sum == total)
    val nComms = census.map(_._2).sum
    val nComps = Graph.connectedComponents(spark, sf)
      .as[(Long, Long)].collect().map(_._2).sum
    assert(nComms >= nComps, s"$nComms communities < $nComps components")
  }

  test("k-core: multi-round peel on a fixture, certificate holds on the corpus") {
    import spark.implicits._
    // K4 {1,2,3,4} + chain 4-5-6: peeling 6 (deg 1) drops 5 to deg 1,
    // so round 2 peels 5 — the 3-core is exactly the K4
    val und = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6))
    val edges = (und ++ und.map(_.swap)).map { case (a, b) => (a.toLong, b.toLong) }
      .toDF("src", "dst")
    val core = Graph.kcoreOf(edges, k = 3, maxRounds = 10)
      .as[(Long, Long)].collect().toSet
    val k4 = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
    assert(core == (k4 ++ k4.map(_.swap)).map { case (a, b) => (a.toLong, b.toLong) }.toSet)
    // insufficient rounds fail loudly (chain of pendants needs one
    // round per link: 9-8-...-1 all below k until the end)
    val chain = (1 to 9).map(i => (i.toLong, (i + 1).toLong))
    val chainEdges = (chain ++ chain.map(_.swap)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Graph.kcoreOf(chainEdges, k = 2, maxRounds = 3).count()
    }
    // corpus summary: the result row carries its own coreness certificate
    val row = Graph.kcoreSummary(spark, sf).head()
    val (nc, ne, md) = (row.getLong(row.fieldIndex("n_core_nodes")),
      row.getLong(row.fieldIndex("n_core_edges")),
      row.getLong(row.fieldIndex("min_core_deg")))
    assert(nc == 0L || md >= Graph.KCoreK.toLong, s"core deg $md below k")
    assert((nc == 0L) == (ne == 0L))
  }

  test("khop histogram on the corpus: one seed, contiguous levels") {
    import spark.implicits._
    val rows = Graph.khopActors(spark, sf).as[(Long, Long)].collect().toSeq
    assert(rows.headOption.contains((0L, 1L)), "hop 0 is the single seed")
    assert(rows.map(_._1) == rows.indices.map(_.toLong),
      "reached levels are contiguous from 0")
    assert(rows.forall(_._2 >= 1))
  }

  test("funnel stage counts are monotone and rates consistent") {
    import spark.implicits._
    val row = Relational.eventsFunnel(spark, sf)
      .as[(Long, Long, Long, Double, Double)].head()
    val (nv, nc, np, r1, r2) = row
    assert(nv >= nc && nc >= np && np >= 0)
    assert(math.abs(r1 - nc.toDouble / nv) < 1e-6)
    assert(math.abs(r2 - np.toDouble / nc) < 1e-6)
  }

  test("merge upsert preserves the row-count identity and the U delta") {
    import spark.implicits._
    val base = Tables.orders(spark, sf)
    val nBase = base.count()
    val m = col("o_orderkey") % 100
    val nDel = base.filter(m >= 5 && m < 10).count()
    val nIns = base.filter(m >= 10 && m < 15).count()
    val out = Relational.mergeUpsert(spark, sf)
      .agg(sum($"n_rows"), sum($"n_inserted")).as[(Long, Long)].head()
    assert(out._1 == nBase - nDel + nIns, s"rows ${out._1}")
    assert(out._2 == nIns, s"inserted ${out._2} vs $nIns")
    // updated keys carry exactly +10.00 each: totals differ by
    // 10 * |U| (inserts duplicate their source price, deletes remove)
    val totBase = base.agg(sum(col("o_totalprice").cast("decimal(18,2)")))
      .as[java.math.BigDecimal].head()
    val totU = base.filter(m < 5).count()
    val totDel = base.filter(m >= 5 && m < 10)
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")))
      .as[java.math.BigDecimal].head()
    val totIns = base.filter(m >= 10 && m < 15)
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")))
      .as[java.math.BigDecimal].head()
    val expect = totBase.subtract(totDel).add(totIns)
      .add(new java.math.BigDecimal(10L * totU)).doubleValue()
    val got = Relational.mergeUpsert(spark, sf)
      .agg(sum($"total_price")).as[Double].head()
    assert(math.abs(got - expect) < 1e-4, s"$got vs $expect")
  }

  test("link prediction: square fixture exact, hub cap gates, corpus top-k sane") {
    import spark.implicits._
    // square 1-2-3-4-1: the two diagonals are the only non-adjacent
    // pairs; each shares BOTH its neighbors with the other end, so
    // jaccard = 2/(2+2-2) = 1.0 exactly — and every intermediate has
    // degree 2, sub-hub, so the capped score is the exact Jaccard
    val und = Seq((1, 2), (2, 3), (3, 4), (4, 1))
    val edges = (und ++ und.map(_.swap)).map { case (a, b) => (a.toLong, b.toLong) }
      .toDF("src", "dst")
    val got = Graph.linkPredictOf(edges, k = 10, hubCap = 64)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 3L, 2L, 1.0), (2L, 4L, 2L, 1.0)), s"got $got")
    // hubCap below every degree removes all intermediates -> empty
    assert(Graph.linkPredictOf(edges, k = 10, hubCap = 1).count() == 0)
    // corpus: exactly k rows, scores in (0, 1], and the top pair is
    // genuinely non-adjacent — re-checked against the raw edge list
    val corpus = Graph.linkPredict(spark, sf)
      .as[(String, String, Long, Double)].collect()
    assert(corpus.length == Graph.LinkPredTopK)
    corpus.foreach { case (_, _, cn, j) =>
      assert(cn >= 1 && j > 0.0 && j <= 1.0) }
    val (ta, tb, _, _) = corpus.head
    val e = graft.sources.Tables.coActorEdgesBucketed(spark, sf)
    assert(e.filter($"src" === ta && $"dst" === tb).count() == 0)
  }

  test("modularity: two disjoint triangles score 0.5, trivial partitions bracket, corpus sane") {
    import spark.implicits._
    // textbook fixture: two disjoint triangles, perfectly partitioned
    // -> Q = 12/12 - 2*(6/12)^2 = 0.5
    val und = Seq((1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6))
    val edges = (und ++ und.map(_.swap)).map { case (a, b) => (a.toLong, b.toLong) }
      .toDF("src", "dst")
    val nodes = (1L to 6L).toDF("a")
    val perfect = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L,
      6L -> 4L).toDF("a", "lbl")
    def q(labels: org.apache.spark.sql.DataFrame): Double =
      Graph.modularityOf(edges, labels).as[(Long, Long, Long, Double)]
        .head()._4
    assert(q(perfect) == 0.5)
    // everything-in-one-community: Q = m/m - (m/m)^2 = 0 exactly
    assert(q(nodes.select($"a", lit(1L).as("lbl"))) == 0.0)
    // all-singletons: no intra arcs, Q = -sum (d/m)^2 < 0
    assert(q(nodes.select($"a", $"a".as("lbl"))) < 0.0)
    // corpus card: bounds hold and counts reconcile with the census
    val (arcs, nComms, largest, qc) = Graph.graphModularity(spark, sf)
      .as[(Long, Long, Long, Double)].head()
    assert(arcs > 0 && nComms >= 1 && largest >= 1)
    assert(qc > -0.5 && qc < 1.0)
    val census = Graph.lpaCommunities(spark, sf).as[(Long, Long)].collect()
    assert(nComms == census.map(_._2).sum)
    assert(largest == census.map(_._1).max)
  }

  test("assortativity: perfect star is -1 exactly, corpus marginals symmetric") {
    import spark.implicits._
    // star K1,3: every arc pairs the hub (deg 3) with a leaf (deg 1)
    // -> perfectly disassortative, r = -1 in EXACT arithmetic
    val und = Seq((1, 2), (1, 3), (1, 4))
    val edges = (und ++ und.map(_.swap)).map { case (a, b) => (a.toLong, b.toLong) }
      .toDF("src", "dst")
    val star = Graph.assortativityOf(edges)
      .as[(Long, Long, Long, Double)].head()
    assert(star == ((6L, 12L, 12L, -1.0)), s"got $star")
    // both-arcs representation: marginals identical by symmetry, and
    // the coefficient is a genuine correlation (|r| <= 1)
    val (m, sx, sy, r) = Graph.graphAssortativity(spark, sf)
      .as[(Long, Long, Long, Double)].head()
    assert(m > 0 && sx == sy)
    assert(!r.isNaN && math.abs(r) <= 1.0, s"r out of range: $r")
  }

  test("clustering coeff: triangle, square, star hand-walked; corpus reconciles") {
    import spark.implicits._
    def undirected(es: Seq[(Long, Long)]) =
      (es ++ es.map(_.swap)).toDF("src", "dst")
    def cc(es: Seq[(Long, Long)]) =
      Graph.clusteringCoeffOf(undirected(es))
        .as[(Long, Long, Double, Double)].head()
    // K3: 3 wedges, 1 triangle, transitivity 3*1/3 = 1, local all 1
    assert(cc(Seq(1L -> 2L, 2L -> 3L, 1L -> 3L)) === ((3L, 1L, 1.0, 1.0)))
    // C4: 4 wedges, no triangle — both coefficients exactly 0
    assert(cc(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L)) ===
      ((4L, 0L, 0.0, 0.0)))
    // star K1,3: 3 wedges at the hub, no triangle; only the hub has
    // degree >= 2, so the local mean averages one zero
    assert(cc(Seq(1L -> 2L, 1L -> 3L, 1L -> 4L)) === ((3L, 0L, 0.0, 0.0)))
    // edgeless frame: NaN surfaced for both (0 wedges, 0 eligible)
    val empty = Graph.clusteringCoeffOf(
      Seq.empty[(Long, Long)].toDF("src", "dst"))
      .as[(Long, Long, Double, Double)].head()
    assert(empty._1 == 0L && empty._2 == 0L &&
      empty._3.isNaN && empty._4.isNaN)
    // corpus: triangle count reconciles with the dedicated census,
    // and both coefficients live in [0, 1]
    val (w, t, trans, avg) = Graph.graphClusteringCoeff(spark, sf)
      .as[(Long, Long, Double, Double)].head()
    val (_, _, tCensus) = Graph.triangleCount(spark, sf)
      .as[(Long, Long, Long)].head()
    assert(t == tCensus, s"triangles $t != census $tCensus")
    assert(w > 0 && trans >= 0.0 && trans <= 1.0 && avg >= 0.0 && avg <= 1.0)
  }
}
