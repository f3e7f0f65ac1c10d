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
}
