package graft

import graft.operators.{Clustering, Relational, Similarity, TimeSeries}
import graft.sources.Ingest
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards for the round-5 join decompositions:
  * the rewrites exist to AVOID a specific bad physical plan, so a
  * silent regression back to it must fail the build, not just slow
  * the bench. */
class PlanShapeSpec extends AnyFunSuite with SparkSpec {

  test("KMV sketch aggregates map-side partial: raw hashes never cross the wire (r10)") {
    val plan = graft.operators.TextAnalytics.approxDistinctKmv(spark, sf)
      .queryExecution.executedPlan.toString
    // TypedImperativeAggregate plans as ObjectHashAggregate with a
    // partial stage BELOW the exchange — each task truncates to k
    // minima before shuffling, so only ≤ k longs per (task, group)
    // travel; without the partial the whole hash stream shuffles
    assert(plan.contains("ObjectHashAggregate"), plan.take(800))
    assert(plan.contains("partial_kminvaluesagg"), plan.take(800))
  }

  test("value-quantile sketch aggregates map-side partial too (r10)") {
    val plan = graft.streaming.EventStreams.eventsValueQuantiles(spark, sf)
      .queryExecution.executedPlan.toString
    // same contract as the KMV pin: each task truncates to s
    // (hash, value) pairs before the shuffle, so per (task, window)
    // only ≤ s pairs travel — never the raw value stream
    assert(plan.contains("ObjectHashAggregate"), plan.take(800))
    assert(plan.contains("partial_kminbyhashagg"), plan.take(800))
  }

  test("range join plans a hash/merge equi-join, never a nested loop") {
    val plan = TimeSeries.rangeJoinWeekly(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"bucket decomposition regressed to a cartesian plan:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"no equi-join on the bucket key:\n$plan")
  }

  test("fuzzy join plans equi-joins only — no cartesian block") {
    val plan = Relational.fuzzyJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"wildcard blocking regressed to a cartesian plan:\n$plan")
  }

  test("bm25 plans array scans — no explode, no corpus-keyed shuffle") {
    val qe = graft.operators.TextAnalytics.bm25(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    // per-term tf is size(filter(...)) in ONE projection: an explode
    // (Generate) would put a corpus×terms intermediate on the wire
    assert(!plan.contains("Generate"),
      s"bm25 regressed to a per-term explode:\n$plan")
    // the only exchange is the 1-row stats aggregate + the broadcast
    // back + the top-k: nothing hash-partitions the corpus
    assert(!plan.contains("hashpartitioning"),
      s"bm25 shuffles the corpus:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"bm25 top-k is not a bounded TakeOrdered:\n$plan")
    // the per-term tf kernel is the codegen'd CountTokenEq — nothing
    // in the physical plan may run as an interpreted CodegenFallback
    // (the HOF filter() form it replaced was one). AQE's
    // AdaptiveSparkPlanExec is a leaf to .collect, so re-plan with
    // AQE off to make the real operator tree traversable — otherwise
    // this assertion inspects one wrapper node and is vacuous
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val staticPlan = graft.operators.TextAnalytics.bm25(spark, sf)
        .queryExecution.executedPlan
      val scanned = staticPlan.collect { case p => p }
      assert(scanned.length > 3, s"plan not traversed:\n$staticPlan")
      val fallbacks = staticPlan.collect { case p =>
        p.expressions.flatMap(_.collect {
          case e: org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback => e
        })
      }.flatten
      assert(fallbacks.isEmpty,
        s"bm25 plan contains interpreted expressions: ${fallbacks.map(_.getClass.getSimpleName).distinct}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("AQE splits the skewed join partition (skew=true) without changing rows") {
    // production thresholds (256 MB / 5× median) can't trip at test
    // scale, so shrink them until the deliberately-hot key 0 (3/4 of
    // lineitem) crosses the bar — then assert the runtime rewrite
    // actually fired AND that it is semantically free
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1024",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1024",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      // keep the SMJ an SMJ: no runtime demotion to broadcast
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // a coalesced single reducer would hide the skew split
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 8 mappers: AQE splits a skewed reduce partition along mapper
      // boundaries, and the single-row-group test parquet scans as
      // one task (nothing to split) without the repartition
      val li = graft.sources.Tables.lineitem(spark, sf).repartition(8)
      val df = Relational.skewJoinAqeOf(li)
      val skewedRows = df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire:\n$plan")
      // same query with the skew rewrite off — identical result set
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val plainRows = Relational.skewJoinAqeOf(li).collect()
      assert(skewedRows.toSeq == plainRows.toSeq,
        "skew-split changed the join result")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("z-order box predicates push down to the parquet scan") {
    import spark.implicits._
    val probe = Ingest.zorderedLineitem(spark, sf)
      .filter($"l_partkey".between(100, 140) && $"l_suppkey".between(2, 6))
    val scan = probe.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }
    assert(scan.nonEmpty, "no file scan in plan")
    val pushed = scan.get.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("l_partkey") && pushed.contains("l_suppkey"),
      s"box filters not pushed: $pushed")
  }

  test("market share: star dims broadcast, part-type filter pushed to the scan") {
    val qe = Relational.marketShare(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
    // the Q8 galaxy is broadcast-hash joins around the streamed fact —
    // at least the part / supplier / nation / region points
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 4,
      s"galaxy points not broadcast:\n$plan")
    // p_type = PROMO reaches the part scan as a pushed filter; the
    // unexecuted AdaptiveSparkPlanExec is childless to collect (the
    // bm25 test's documented gotcha), so re-plan with AQE off
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val scans = Relational.marketShare(spark, sf)
        .queryExecution.executedPlan
        .collect { case s: FileSourceScanExec => s }
      assert(scans.exists(_.metadata.get("PushedFilters")
        .exists(_.contains("EqualTo(p_type,PROMO)"))),
        "part-type filter not pushed to the parquet scan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("rolling chunks: window partitioned by doc, never a global sort") {
    val plan = graft.operators.CorpusQuality.rollingHashChunks(spark, sf)
      .queryExecution.executedPlan.toString
    // the running boundary count partitions by doc_id — a global
    // (empty-partition) window would serialize the corpus on one task
    assert(!plan.contains("Window [") ||
      !plan.contains("windowspecdefinition()"),
      s"global window in the chunker:\n$plan")
    assert(plan.contains("doc_id"), s"doc-keyed window missing:\n$plan")
  }

  test("skew report: top-8 is a bounded TakeOrdered, never a global sort") {
    val plan = Relational.dataSkewReport(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-8 key share is not a bounded top-k:\n$plan")
  }

  test("PCA iteration: one aggregate pass, no shuffle wider than the d-row") {
    // one power-iteration step over the centered frame must plan as a
    // partial+final aggregate (one exchange of a single d-wide row),
    // with no join and no corpus-keyed repartition
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select(transform($"embedding", _.cast("double")).as("cx"))
    val d = 64
    val v = Array.fill(d)(0.125)
    val s = graft.functions.VectorExpressions
      .dot_product($"cx", array(v.map(lit): _*))
    val step = e.withColumn("s", s)
      .agg(sum($"s" * element_at($"cx", 1)).as("w1"),
        (2 to d).map(k => sum($"s" * element_at($"cx", k)).as(s"w$k")): _*)
    val plan = step.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"PCA step must not join:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"PCA step is not a partial+final aggregate:\n$plan")
  }

  test("CMS builds plan map-side partial counts; probe join broadcasts the sketch (r10)") {
    val plan = graft.operators.TextAnalytics.countMinReplay(spark, sf)
      .queryExecution.executedPlan.toString
    // cell counts are a plain partial+final count on (salt, cell):
    // per task at most depth*width rows cross the wire
    assert("partial_count".r.findAllIn(plan).size >= 1, plan.take(900))
    // the ≤ depth·width sketch is the BROADCAST side of the probe join
    assert(plan.contains("BroadcastHashJoin"), plan.take(900))
    assert(!plan.contains("CartesianProduct"))
  }

  test("inverted index rides the native bounded-heap top-k, no window sort (r10)") {
    val plan = graft.operators.TextAnalytics.invertedIndex(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"),
      s"posting cap must use the native heap plan:\n${plan.take(900)}")
    // the df-capped posting build must not fall back to a per-term
    // global Window (rank-over-sort materializes every posting)
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window "),
      plan.take(900))
  }

  test("CC round: edges never shuffle under the tier — labels broadcast (r10)") {
    import spark.implicits._
    // one propagation round over a fixture edge frame: the edge side
    // must join against a BROADCAST label frame (tier on), and the
    // new-label reduction is a partial+final MIN on the node key
    val und = Seq((1, 2), (2, 3), (1, 3), (4, 5))
    val edges = (und ++ und.map(_.swap)).map { case (a, b) => (a.toLong, b.toLong) }
      .toDF("src", "dst")
    val labels = (1L to 5L).toDF("a").select($"a", $"a".as("lbl"))
    val msgs = edges
      .join(graft.util.Broadcasting.maybeBroadcast(labels, 5L),
        edges("src") === labels("a"))
      .select($"dst".as("a"), $"lbl")
    val next = labels.unionByName(msgs).groupBy($"a")
      .agg(org.apache.spark.sql.functions.min($"lbl").as("lbl"))
    val plan = next.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"label join must broadcast under the tier:\n${plan.take(900)}")
    assert("partial_min".r.findAllIn(plan).size >= 1, plan.take(900))
  }

  test("seasonal decompose: effect table broadcasts back; daily collapse precedes the window (r10)") {
    val qe = TimeSeries.seasonalDecompose(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    // the 7-row weekday-effect join must broadcast, not shuffle the
    // daily frame a second time
    assert(plan.contains("BroadcastHashJoin"), plan.take(900))
    // exactly one unpartitioned window pass over the ≤calendar-days
    // frame (trend); the raw order stream collapses via aggregate first
    assert("Window".r.findAllIn(plan).size >= 1 &&
      "partial_sum".r.findAllIn(plan).size >= 1, plan.take(900))
  }

  test("link predict: equi-joins only, hub gate precedes the two-path join (r10)") {
    val qe = graft.operators.Graph.linkPredict(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"link prediction regressed to a cartesian plan:\n$plan")
    // the hub cap must bound the JOIN INPUT: the optimized plan joins
    // degree-filtered edge sides on z, not raw edges post-filtered
    val opt = qe.optimizedPlan.toString
    assert(opt.contains("(d <= 64)") || opt.contains("(d#") ||
      plan.contains("d <= 64"),
      s"hub-degree gate missing from the plan:\n$opt")
  }

  test("PQ/semdedup hash joins carry no packable int-int key (r16 packed-key audit)") {
    // Spark packs an all-integral ≤8-byte equi-key list into ONE long
    // whose broadcast map slots on the LOW word; a few-distinct-values
    // low word (PQ's 16-valued `code`, semdedup's mostly-zero `blk`)
    // collapses the map into a handful of chains (the round-15
    // modularity degeneracy, 8.3 s → 0.24 s when unpacked). The fixed
    // joins key on a dense self-packed int (PQ: m·K + code) or keep
    // one key wide (semdedup: long cell + int blk) — assert no hash
    // join in their plans has a packable multi-int key list.
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec}
    import org.apache.spark.sql.catalyst.expressions.Expression
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    def bits(e: Expression): Option[Int] = e.dataType match {
      case ByteType => Some(8); case ShortType => Some(16)
      case IntegerType => Some(32); case LongType => Some(64); case _ => None
    }
    def packable(keys: Seq[Expression]): Boolean =
      keys.length > 1 && keys.forall(bits(_).isDefined) &&
        keys.flatMap(bits).sum <= 64
    for ((name, df) <- Seq(
      "llm_knn_pq" -> Similarity.knnPq(spark, sf),
      "llm_pq_error" -> Similarity.pqError(spark, sf),
      "llm_semdedup_atscale" -> Clustering.semDedupAtScale(spark, sf))) {
      df.collect()
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
        p +: (p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
          case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => walk(r.child)
          case _ => p.children.flatMap(walk)
        })
      val bad = walk(df.queryExecution.executedPlan).collect {
        case j: BroadcastHashJoinExec if packable(j.leftKeys) => j
        case j: ShuffledHashJoinExec if packable(j.leftKeys) => j
      }
      assert(bad.isEmpty,
        s"$name: hash join with packable int-int key list:\n${bad.map(_.verboseString(2)).mkString("\n")}")
    }
  }

  // an adaptive plan's toString repeats the tree under "== Initial
  // Plan =="; scan counts must only see the final section
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize the adaptive plan before inspecting
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("chi-square: the corpus aggregates once — grid branches read the checkpoint (r10)") {
    val plan = finalPlan(Relational.chiSquare(spark, sf))
    // the R×C grid references the observed aggregate three times
    // (distinct a, distinct b, left join); at 100 TB those MUST share
    // one scan (the checkpointed aggregate), not re-scan per branch
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 0,
      s"grid branches re-scan the corpus ($scans scans):\n$plan")
    assert(plan.contains("ExistingRDD") || plan.contains("Scan Existing"),
      s"checkpointed observed table missing:\n${plan.take(1500)}")
  }

  test("gini: one corpus scan; the window sorts the customer aggregate (r10)") {
    val df = Relational.giniRevenue(spark, sf)
    val plan = finalPlan(df)
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected one orders scan, got $scans:\n$plan")
    // the global sort feeding row_number must sit ABOVE the custkey
    // aggregate (dim-sized input), i.e. the plan aggregates before
    // any single-partition exchange
    val aggIdx = plan.indexOf("HashAggregate")
    val spIdx = plan.indexOf("SinglePartition")
    assert(aggIdx >= 0 && spIdx >= 0 && spIdx < plan.lastIndexOf("HashAggregate"),
      s"window input is not the aggregate:\n$plan")
  }

  test("discount forecast: predicates push to the scan, no join, one aggregate (r10)") {
    val df = Relational.forecastDiscount(spark, sf)
    val plan = finalPlan(df)
    // the query's value at 100 TB IS the pushdown: ship-date and
    // quantity predicates must reach the parquet reader
    // (sparkPlan, not executedPlan: the unexecuted adaptive wrapper
    // is childless, so collectLeaves sees no scans — the
    // columnProfile precedent)
    val scan = df.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }
    assert(scan.isDefined, "no parquet scan found")
    val pushed = scan.get.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("l_shipdate") && pushed.contains("l_quantity"),
      s"predicates not pushed: $pushed")
    assert(!plan.contains("Join"), s"Q6 shape must not join:\n${plan.take(800)}")
    // exactly one scan, one partial+final aggregate
    assert("Scan parquet".r.findAllIn(plan).length == 1)
    // the whole pipeline fuses into whole-stage codegen
    assert(plan.contains("*("), s"no codegen span:\n${plan.take(800)}")
  }

  test("duplicate payments: equi-join on (customer, amount), never a cartesian (r10)") {
    val plan = finalPlan(Relational.duplicatePayments(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"amount-keyed self-join regressed to a cartesian:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"no equi-join on the (customer, cents) key:\n${plan.take(1500)}")
  }

  test("referential integrity: dims broadcast their anti-joins (r10)") {
    val plan = finalPlan(Relational.referentialIntegrity(spark, sf))
    // every edge is an anti-join; the five dimension parents must
    // arrive broadcast (the two fact-fact edges may shuffle)
    val anti = "LeftAnti".r.findAllIn(plan).length
    assert(anti >= 7, s"expected 7 anti-joins, saw $anti:\n${plan.take(2000)}")
    val bAnti = "BroadcastHashJoin [^\n]*LeftAnti".r.findAllIn(plan).length
    assert(bAnti >= 5, s"dimension anti-joins not broadcast ($bAnti):\n${plan.take(2000)}")
  }
}
