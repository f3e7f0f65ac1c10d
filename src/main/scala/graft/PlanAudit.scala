package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (round-15 verdict item 3): enumerate hash joins whose
  * equi-key list Spark PACKS into one long — more than one key, all
  * integral, total width ≤ 8 bytes ([[org.apache.spark.sql.execution.joins.HashJoin]]
  * `rewriteKeyExpr`). A packed key whose LOW word is a
  * few-distinct-values column collapses the LongToUnsafeRowMap
  * behind a broadcast (the round-15 modularity finding: 8.3 s → 0.24 s
  * by keeping one key wide, Graph.scala modularityOf). This audit
  * runs every catalog query at a small sf, walks the FINAL adaptive
  * plan, and for every packed-key hash join reports the key
  * expressions and their types — the human then bounds the low-word
  * distinct count for each hit (keys pack in order; the LAST key
  * lands in the LOW bits). */
object PackedKeyAudit {
  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
  import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec}
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

  private def flatten(p: SparkPlan): Seq[SparkPlan] =
    p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case r: ReusedExchangeExec => flatten(r.child)
      case _ => p.children.flatMap(flatten)
    })

  private def integralBits(e: Expression): Option[Int] = e.dataType match {
    case ByteType => Some(8); case ShortType => Some(16)
    case IntegerType => Some(32); case LongType => Some(64); case _ => None
  }

  /** keys that HashJoin.rewriteKeyExpr would pack into ONE long */
  private def packed(keys: Seq[Expression]): Boolean =
    keys.length > 1 && keys.forall(integralBits(_).isDefined) &&
      keys.flatMap(integralBits).sum <= 64

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    var hits = 0
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val joins = flatten(df.queryExecution.executedPlan).collect {
          case j: BroadcastHashJoinExec if packed(j.leftKeys) =>
            ("broadcast", j.leftKeys, j.rightKeys)
          case j: ShuffledHashJoinExec if packed(j.leftKeys) =>
            ("shuffled-hash", j.leftKeys, j.rightKeys)
        }
        joins.foreach { case (kind, lk, rk) =>
          hits += 1
          println(s"PACKED $n [$kind] left=${lk.map(k =>
            s"${k.sql}:${k.dataType.simpleString}").mkString(", ")} right=${
            rk.map(k => s"${k.sql}:${k.dataType.simpleString}").mkString(", ")}")
        }
      } catch { case e: Throwable =>
        println(s"ERROR $n: ${e.getMessage.linesIterator.next()}")
      }
    }
    println(s"packed-key hash joins: $hits")
    spark.stop()
  }
}

/** Dev tool: work-volume census for the scale sweeps (the
  * BENCH_sf10_r14 discipline) — arcs/nodes/max-degree/Σdeg² for the
  * full co-actor graph and the weight-thresholded graph the
  * iterative family runs on, so wall-clock ratios sit next to
  * measured WORK ratios in the committed artifact. */
object GraphCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def census(name: String, e: org.apache.spark.sql.DataFrame): Unit = {
      val deg = e.groupBy($"src").agg(count(lit(1)).as("d"))
      val r = deg.agg(sum($"d").as("arcs"), count(lit(1)).as("nodes"),
        max($"d").as("maxdeg"), sum($"d" * $"d").as("sumdeg2")).head()
      println(s"""CENSUS {"graph":"$name","sf":"$sfDir","arcs":${r.getLong(0)},"nodes":${r.getLong(1)},"max_degree":${r.getLong(2)},"sum_deg2":${r.getLong(3)}}""")
    }
    val full = graft.sources.Tables.coActorEdgesBucketed(spark, sfDir)
    census("full", full.select($"src", $"dst"))
    census("weighted_wt2", full
      .filter($"wt" >= graft.operators.Graph.GraphWeightMin)
      .select($"src", $"dst"))
    spark.stop()
  }
}

/** Dev tool: the iterative kernels checkpoint each round, so the
  * final query explain cannot show the per-round plan shape. This
  * main rebuilds ONE LPA round over the real corpus edge frame in
  * both the round-15 shape (count → per-dst max → equi-join back →
  * filter c = mx → min) and the round-16 shape (one ordered-struct
  * MAX aggregate) and prints both formatted plans — the plan-diff
  * evidence for the argmax collapse that `explain` on the declared
  * query cannot produce. */
object LpaRoundPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.coActorEdgesBucketed(spark, sfDir)
      .filter($"wt" >= graft.operators.Graph.GraphWeightMin)
      .select($"src".cast("int").as("src"), $"dst".cast("int").as("dst"))
    val labels = graft.sources.Tables.movies(spark, sfDir)
      .select(explode($"actors").as("s"))
      .select($"s".cast("int").as("a")).distinct()
      .select($"a", $"a".as("lbl"))
    val cnt = e.join(labels, e("src") === labels("a"))
      .groupBy($"dst", $"lbl").agg(count(lit(1)).as("c"))
    println("===== lpa_round (r15 shape: max + join-back + filter + min) =====")
    val mx = cnt.groupBy($"dst").agg(max($"c").as("mx"))
    cnt.join(mx, "dst").filter($"c" === $"mx")
      .groupBy($"dst").agg(min($"lbl").as("nl"))
      .explain("formatted")
    println("===== lpa_round (r16 shape: one packed-long max) =====")
    cnt.groupBy($"dst")
      .agg(max(shiftleft($"c", 32) +
        (lit(Int.MaxValue.toLong) - $"lbl")).as("p"))
      .select($"dst",
        (lit(Int.MaxValue.toLong) - $"p".bitwiseAND(lit(0xffffffffL)))
          .cast("int").as("nl"))
      .explain("formatted")
    spark.stop()
  }
}

/** Dev tool: print formatted physical plans of selected queries for
  * the scale audit (shuffle count, pushdown, codegen spans). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "llm_dedup_minhash", "llm_knn_exact", "llm_text_stats")
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
