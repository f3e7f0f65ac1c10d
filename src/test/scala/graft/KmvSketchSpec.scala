package graft

import graft.functions.KMinValues._
import graft.operators.TextAnalytics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the KMV distinct-count sketch (round 10): sketch contents
  * are a pure function of the input VALUE SET (partitioning- and
  * order-invariant), the estimator is exact below capacity and
  * ~1/√k accurate above it, and the catalog query's estimate agrees
  * with the exact distinct within the published band. */
class KmvSketchSpec extends AnyFunSuite with SparkSpec {

  test("sketch equals the k smallest distinct values, any partitioning") {
    import spark.implicits._
    // 0..999 shuffled, each value twice — distinct minima are 0..31
    val vals = scala.util.Random.shuffle((0 until 1000) ++ (0 until 1000))
      .map(_.toLong)
    val expected = (0L until 32L).toSeq
    for (parts <- Seq(1, 3, 8)) {
      val got = vals.toDF("h").repartition(parts)
        .agg(k_min_values($"h", 32).as("kmv"))
        .select($"kmv").as[Seq[Long]].head()
      assert(got == expected, s"parts=$parts")
    }
  }

  test("below capacity the sketch IS the distinct set and the estimate is exact") {
    import spark.implicits._
    val df = Seq(5L, 7L, 5L, 9L, 7L).toDF("h")
      .agg(k_min_values($"h", 32).as("kmv"))
      .select($"kmv", kmvEstimate($"kmv", 32).as("est"))
    val (kmv, est) = df.as[(Seq[Long], Long)].head()
    assert(kmv == Seq(5L, 7L, 9L))
    assert(est == 3L)
  }

  test("null hashes are skipped; empty input gives an empty sketch") {
    import spark.implicits._
    val got = Seq(Some(3L), None, Some(8L)).toDF("h")
      .agg(k_min_values($"h", 16).as("kmv"))
      .select($"kmv").as[Seq[Long]].head()
    assert(got == Seq(3L, 8L))
    val empty = Seq.empty[Long].toDF("h")
      .agg(k_min_values($"h", 16).as("kmv"))
      .select($"kmv", kmvEstimate($"kmv", 16).as("est"))
      .as[(Seq[Long], Long)].head()
    assert(empty._1.isEmpty && empty._2 == 0L)
  }

  test("estimator lands within ~3/sqrt(k) of the exact distinct on uniform hashes") {
    import spark.implicits._
    val k = 256
    // md5-family hashes over 20k distinct strings: uniform on [0, 2^32)
    val est = spark.range(20000)
      .select(graft.functions.Hashing.md5i32($"id".cast("string"), 0).as("h"))
      .agg(k_min_values($"h", k).as("kmv"))
      .select(kmvEstimate($"kmv", k).as("est")).as[Long].head()
    val err = math.abs(est - 20000L) / 20000.0
    assert(err <= 3.0 / math.sqrt(k),
      s"KMV estimate $est vs 20000 exact: err $err")
  }

  test("merging per-group sketches equals the direct global sketch") {
    import spark.implicits._
    val k = 64
    // 8 groups × overlapping value ranges — plenty of cross-group dups
    val df = spark.range(5000)
      .select(($"id" % 8).as("g"),
        graft.functions.Hashing.md5i32(($"id" % 1200).cast("string"), 0).as("h"))
    val merged = df.groupBy($"g").agg(k_min_values($"h", k).as("kmv"))
      .select(explode($"kmv").as("h"))
      .agg(k_min_values($"h", k).as("kmv")).as[Seq[Long]].head()
    val direct = df.agg(k_min_values($"h", k).as("kmv")).as[Seq[Long]].head()
    assert(merged == direct)
    assert(merged.length == k)
  }

  test("catalog query: merged corpus estimate is in band, n_groups matches") {
    import spark.implicits._
    val Seq((nGroups, nKept, kthMin, est)) =
      TextAnalytics.approxDistinctKmvMerged(spark, sf)
        .as[(Long, Long, Option[Long], Long)].collect().toSeq
    val (nLangs, exact) = graft.sources.Tables.documents(spark, sf)
      .select($"lang", explode(graft.functions.TextAnalysis.shingles(
        graft.functions.TextAnalysis.tokens($"text"), 3)).as("sh"))
      .select($"lang", graft.functions.Hashing.md5i32($"sh", 0).as("h"))
      .agg(count_distinct($"lang"), count_distinct($"h"))
      .as[(Long, Long)].head()
    assert(nGroups == nLangs)
    if (exact < 256) { assert(kthMin.isEmpty && est == exact && nKept == exact) }
    else {
      assert(nKept == 256L && kthMin.nonEmpty)
      val err = math.abs(est - exact) / exact.toDouble
      assert(err <= 3.0 / math.sqrt(256.0), s"merged est $est vs $exact exact")
    }
  }

  test("source overlap algebra: a verbatim copy estimates full overlap, disjoint near zero") {
    import spark.implicits._
    val base = graft.sources.Tables.documents(spark, sf)
      .filter($"source" === "src0").select($"source", $"text")
    // copyX = src0 verbatim under a new label → union sketch == src0's
    // sketch, inclusion-exclusion gives inter == est, permille == 1000
    val docs = base
      .union(base.select(lit("copyX").as("source"), $"text"))
      .union(graft.sources.Tables.documents(spark, sf)
        .filter($"source" === "src1").select($"source", $"text"))
    val rows = graft.operators.TextAnalytics.kmvSourceOverlapOf(docs)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val (_, _, ea, eb, eu, ei, pm) = rows(("copyX", "src0"))
    assert(ea == eb && eu == ea && ei == ea && pm == 1000L,
      s"verbatim copy: $ea $eb $eu $ei $pm")
    // src0 vs src1 are different synthetic sources — far from identical
    val (_, _, _, _, _, _, pm01) = rows(("src0", "src1"))
    assert(pm01 < 900L, s"distinct sources overlap_permille=$pm01")
  }

  test("catalog query: n_kept matches exact distinct-hash counts, estimate in band") {
    import spark.implicits._
    val got = TextAnalytics.approxDistinctKmv(spark, sf)
      .as[(String, Long, Option[Long], Long)].collect()
    assert(got.nonEmpty)
    val exact = graft.sources.Tables.documents(spark, sf)
      .select($"lang", explode(graft.functions.TextAnalysis.shingles(
        graft.functions.TextAnalysis.tokens($"text"), 3)).as("sh"))
      .select($"lang", graft.functions.Hashing.md5i32($"sh", 0).as("h"))
      .groupBy($"lang").agg(count_distinct($"h").as("nd"))
      .as[(String, Long)].collect().toMap
    got.foreach { case (lang, nKept, kthMin, est) =>
      val nd = exact(lang)
      assert(nKept == math.min(nd, 256L), s"$lang n_kept")
      if (nd < 256) {
        assert(kthMin.isEmpty && est == nd, s"$lang exact regime")
      } else {
        assert(kthMin.nonEmpty, s"$lang kth_min missing at capacity")
        val err = math.abs(est - nd) / nd.toDouble
        assert(err <= 3.0 / math.sqrt(256.0), s"$lang: est $est vs $nd (err $err)")
      }
    }
  }

  test("quantile sketch: truncating sample tracks exact quantiles; layout-invariant") {
    import spark.implicits._
    val s = 32 // < every per-lang group size, so the sampling path is real
    val docs = graft.sources.Tables.documents(spark, sf)
    val est = graft.operators.TextAnalytics.quantileSketchOf(docs, s)
      .as[(String, Long, Long, Long)].collect()
    assert(est.nonEmpty)
    assert(est.forall(_._3 == s),
      s"expected every stratum at capacity: ${est.filter(_._3 != s).toSeq}")
    // each estimate's exact empirical CDF must sit near its target p:
    // 3σ of the sample quantile (σ = √(p(1−p)/m)) + 1/m discretization
    val all = docs.select($"lang", $"n_chars").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    est.foreach { case (lang, p, m, v) =>
      val xs = all(lang)
      val cdf = xs.count(_ <= v).toDouble / xs.length
      val pf = p / 100.0
      val tol = 3 * math.sqrt(pf * (1 - pf) / m) + 1.0 / m
      assert(math.abs(cdf - pf) <= tol, s"$lang p$p: est=$v cdf=$cdf tol=$tol")
    }
    // bottom-s-by-hash is associative: partition layout cannot change
    // the retained sample, hence not the estimates either
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.operators.TextAnalytics.quantileSketchOf(d, s)
        .collect().map(_.toSeq).toSeq
    assert(run(docs.repartition(1)) == run(docs.repartition(13)))
  }

  test("merged per-group quantile samples equal the direct global sample") {
    import spark.implicits._
    // direct global bottom-s sample of the same (hash, doc) keys the
    // merge query unions — any global minimum is inside its own
    // group's bottom-s, so the two routes must retain identical rows
    // and hence identical quantile estimates
    val s = 64
    val merged = graft.operators.TextAnalytics
      .quantileSketchMerged(spark, sf, s)
      .as[(Long, Long, Long)].collect().toSeq
    val d = graft.sources.Tables.documents(spark, sf)
    val keyed = d.select($"doc_id", $"n_chars",
      graft.functions.Hashing.md5i32($"doc_id".cast("string"), 23).as("h"))
    val direct = keyed
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1)).orderBy($"h".asc, $"doc_id".asc)).cast("long"))
      .filter($"rk" <= s)
      .withColumn("vr", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1)).orderBy($"n_chars".asc, $"doc_id".asc)).cast("long"))
      .withColumn("m", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(lit(1))))
      .crossJoin(Seq(25, 50, 75, 90).toDF("p"))
      .filter($"vr" === expr("(m * p + 99) div 100"))
      .select($"p".cast("long"), $"m", $"n_chars")
      .orderBy($"p")
      .as[(Long, Long, Long)].collect().toSeq
    assert(merged == direct, s"merged $merged vs direct $direct")
    assert(merged.length == 4 && merged.forall(_._2 == s))
  }
}
