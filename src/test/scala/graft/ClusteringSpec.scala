package graft

import graft.operators.{Clustering, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClusteringSpec extends AnyFunSuite with SparkSpec {

  private lazy val e = Similarity.normalizeOf(
    graft.sources.Tables.embeddings(spark, sf))

  test("k-means: Lloyd's objective is non-increasing across iterations") {
    val w0 = Clustering.wcssOf(e, Clustering.trainKmeansOf(e, iters = 0))
    val w1 = Clustering.wcssOf(e, Clustering.trainKmeansOf(e, iters = 1))
    val w3 = Clustering.wcssOf(e, Clustering.trainKmeansOf(e, iters = 3))
    // exact Lloyd's is monotone; 6-dp rounding can wiggle the tail
    assert(w1 <= w0 + 1e-4, s"iter1 $w1 vs init $w0")
    assert(w3 <= w1 + 1e-4, s"iter3 $w3 vs iter1 $w1")
    assert(w3 < w0, s"training never improved: $w3 vs $w0")
  }

  test("llm_kmeans: every cell has full dims and sizes sum to the corpus") {
    import spark.implicits._
    val out = Clustering.kmeans(spark, sf).cache()
    val corpus = e.count()
    val cells = out.select($"cell").distinct().as[Int].collect().sorted
    assert(cells.nonEmpty && cells.forall(c => c >= 0 && c < Clustering.K))
    // one row per (cell, dim)
    assert(out.count() == cells.length.toLong * Clustering.Dims)
    val sizeSum = out.select($"cell", $"n_members").distinct()
      .agg(sum($"n_members")).head().getLong(0)
    assert(sizeSum == corpus, s"member counts $sizeSum != corpus $corpus")
    out.unpersist()
  }

  test("semDedup: pairs are same-cell, ordered, and above threshold") {
    import spark.implicits._
    val thr = 0.4
    val pairs = Clustering.semDedup(spark, sf, thr).collect()
    assert(pairs.nonEmpty, "no semantic near-dup pairs at test scale")
    assert(pairs.forall(r => r.getLong(1) < r.getLong(2)))
    assert(pairs.forall(_.getDouble(3) >= thr))
    // verify one pair's cosine against an independent computation
    val p = pairs.head
    val vs = e.filter($"vec_id".isin(p.getLong(1), p.getLong(2)))
      .orderBy($"vec_id").as[(Long, Seq[Double])].collect()
    val cos = vs(0)._2.zip(vs(1)._2).map { case (a, b) => a * b }.sum
    assert(math.abs(cos - p.getDouble(3)) < 1e-5)
  }

  test("broadcast-join cell assignment == literal argmax assignment") {
    import spark.implicits._
    // the k > AssignLiteralMaxK tier must make the identical
    // choices (round-6 scores, ties to lowest cell) as the map-side
    // literal path it replaces
    val model = Clustering.trainKmeansOf(e, k = 8, iters = 1)
    val lit = Clustering.withCell(e, model)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    val joined = Clustering.withCellJoin(e, model)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    assert(lit.size == joined.size && lit.nonEmpty)
    assert(lit == joined, "assignment tiers disagree")
  }

  test("semDedup sub-bucketing: pair set unchanged, join keys bounded") {
    import spark.implicits._
    val model = Clustering.trainKmeansOf(e, k = 4, iters = 1)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    val plain  = key(Clustering.semDedupOf(e, model, 0.3, cellCap = 1 << 30))
    val capped = key(Clustering.semDedupOf(e, model, 0.3, cellCap = 8))
    assert(plain.nonEmpty, "no pairs at test scale")
    assert(capped == plain, "sub-bucketing changed the pair set")
    // the physical guarantee: with cap c, no (cell, blk) build group
    // exceeds ~c (hash split is even in expectation; allow 3x slack)
    val assigned = Clustering.withCell(e, model)
    val sizes = assigned.groupBy($"cell").agg(count(lit(1)).as("csz"))
    val maxBlk = assigned.join(broadcast(sizes), "cell")
      .withColumn("g", ceil($"csz".cast("double") / 8.0).cast("int"))
      .withColumn("blk", pmod(hash($"vec_id"), $"g"))
      .groupBy($"cell", $"blk").agg(count(lit(1)).as("n"))
      .agg(max($"n")).head().getLong(0)
    assert(maxBlk <= 24, s"a sub-bucket holds $maxBlk rows for cap 8")
  }

  test("semDedup at k=64 on sf0.1: green pairs with scaled cell count") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    val big = Similarity.normalizeOf(graft.sources.Tables.embeddings(spark, dir))
    val model = Clustering.trainKmeansOf(big, k = 64, iters = Clustering.Iters)
    assert(model.size > 32, s"only ${model.size} cells survived training")
    val pairs = Clustering.semDedupOf(big, model, 0.4).cache()
    val n = pairs.count()
    assert(n > 0, "no pairs at sf0.1 with k=64")
    val bad = pairs.filter($"vec_a" >= $"vec_b" || $"cosine" < 0.4).count()
    assert(bad == 0)
    // spot-check one pair against an independent dot product
    val p = pairs.head()
    val vs = big.filter($"vec_id".isin(p.getLong(1), p.getLong(2)))
      .orderBy($"vec_id").as[(Long, Seq[Double])].collect()
    val cos = vs(0)._2.zip(vs(1)._2).map { case (a, b) => a * b }.sum
    assert(math.abs(cos - p.getDouble(3)) < 1e-5)
    pairs.unpersist()
  }

  test("kFor: capacity sizing rule is ceil(n/target) clamped to [1, maxK]") {
    assert(Clustering.kFor(0) == 1)
    assert(Clustering.kFor(1) == 1)
    assert(Clustering.kFor(256) == 1)
    assert(Clustering.kFor(257) == 2)
    assert(Clustering.kFor(2000) == 8)
    assert(Clustering.kFor(20000) == 79)
    assert(Clustering.kFor(Long.MaxValue / 2) == (1 << 16), "maxK clamp")
    // the at-scale path crosses into the broadcast-join assignment
    // tier once kFor(n) exceeds the literal-argmax codegen budget
    assert(Clustering.kFor(64L * 256 + 1) > Clustering.AssignLiteralMaxK)
  }

  test("semDedupAtScale: kFor-sized model, pair invariants, matches direct run") {
    import spark.implicits._
    val thr = 0.4
    val n = e.count()
    val k = Clustering.kFor(n)
    assert(k != Clustering.K,
      s"test corpus sizes kFor to the demo k=$k — differential is vacuous")
    val pairs = Clustering.semDedupAtScale(spark, sf, thr).cache()
    val rows = pairs.collect()
    assert(rows.nonEmpty, "no at-scale semantic near-dup pairs at test scale")
    assert(rows.forall(r => r.getLong(1) < r.getLong(2)))
    assert(rows.forall(_.getDouble(3) >= thr))
    // the trained model really is kFor-sized (empty cells may drop)
    val model = Clustering.kmeansModel(spark, sf, k)
    assert(model.size <= k && model.nonEmpty)
    assert(rows.map(_.getInt(0)).forall(c => c >= 0 && c < k))
    // bit-identical to an explicit semDedupOf run at the same k
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_a", $"vec_b", $"cosine")
        .as[(Long, Long, Double)].collect().toSet
    assert(key(pairs) == key(Clustering.semDedupOf(e, model, thr)))
    pairs.unpersist()
  }

  test("IVF over trained k-means centroids achieves reasonable recall") {
    import spark.implicits._
    val k = 5
    def top(df: org.apache.spark.sql.DataFrame) =
      df.filter($"probe_id" === 0L).select($"neighbor_id").as[Long].collect().toSet
    val exact = top(Similarity.knnExact(spark, sf, numProbes = 1, k = k))
    val ivf = top(Similarity.knnIvfKmeans(spark, sf, numProbes = 1, k = k))
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.2, s"k-means IVF recall $recall vs exact top-$k")
  }

  test("cell purity replays from the model's own assignments") {
    import spark.implicits._
    val got = Clustering.kmeansPurity(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty)
    // replay off the same cached model and assignment path
    val model = Clustering.kmeansModel(spark, sf)
    val labels = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label".cast("long")).as[(Long, Long)].collect().toMap
    val assigned = Clustering.withCell(
      Similarity.normalizeOf(graft.sources.Tables.embeddings(spark, sf)), model)
      .select($"vec_id", $"cell").as[(Long, Int)].collect()
    val want = assigned.groupBy(_._2).map { case (cell, vs) =>
      val byLb = vs.map(v => labels(v._1))
        .groupBy(identity).view.mapValues(_.size).toSeq
        .sortBy { case (lb, n) => (-n, lb) }
      val (mlb, mn) = byLb.head
      (cell.toLong, vs.length.toLong, mlb, mn.toLong,
        math.rint(mn.toDouble / vs.length * 1e6) / 1e6)
    }.toSeq.sortBy(_._1)
    assert(got == want)
    // every vector is in exactly one cell; purity is a valid fraction
    assert(got.map(_._2).sum == assigned.length)
    got.foreach { case (_, n, _, m, p) =>
      assert(m <= n && p > 0.0 && p <= 1.0)
    }
  }

  test("k-center: greedy separation property and coverage radius hold") {
    import spark.implicits._
    val rows = Clustering.kcenterSelect(spark, sf)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.length == Clustering.KCenterK)
    assert(rows.map(_._1).toSeq == (0L until Clustering.KCenterK.toLong))
    assert(rows.map(_._2).distinct.length == rows.length, "duplicate picks")
    val radius = rows.head._3
    assert(rows.forall(_._3 == radius) && radius >= 0.0 && radius <= 2.0)
    // farthest-point guarantee: the selected exemplars are pairwise
    // at least the coverage radius apart (1 - cosine distance)
    val ids = rows.map(_._2).toSet
    val vecs = Graft.normalize(graft.sources.Tables.embeddings(spark, sf))
      .select($"vec_id", $"v").as[(Long, Seq[Double])].collect()
      .filter(v => ids(v._1)).map(v => v._1 -> v._2.toArray).toMap
    val pairs = for {
      a <- ids.toSeq; b <- ids.toSeq if a < b
    } yield 1.0 - vecs(a).zip(vecs(b)).map { case (x, y) => x * y }.sum
    pairs.foreach(d =>
      assert(d >= radius - 1e-6, s"selected pair closer ($d) than radius $radius"))
    // deterministic across runs
    assert(rows.toSeq == Clustering.kcenterSelect(spark, sf)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq)
  }
}
