package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Cross-validation of independent near-dup pipelines at 10x the
  * other specs' scale (sf0.1, 5000 docs): MinHash-LSH (probabilistic
  * candidates, Jaccard >= 0.8 verify) and inverted-index n-gram
  * Jaccard (exhaustive candidates via shared shingles) must find the
  * SAME pair set at the same threshold — two disjoint code paths
  * agreeing is the scale-up recall check brute force can't give us
  * (12.5M pairs). */
class CrossScaleSpec extends AnyFunSuite with SparkSpec {
  test("MinHash-LSH pairs == exhaustive n-gram pairs at sf0.1, threshold 0.8") {
    val dir = "/root/testdata/sf0.1"
    val lsh = Dedup.minHashNearDups(spark, dir, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ngram = Dedup.ngramJaccardPairs(spark, dir, threshold = 0.8, dfCap = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == ngram, s"missed=${ngram.diff(lsh).size} extra=${lsh.diff(ngram).size}")
    assert(lsh.nonEmpty)
  }

  test("semDedup pairs ⊆ exact cosine pairs at sf0.1, with bounded recall") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    val thr = 0.4
    val sem = graft.operators.Clustering.semDedup(spark, dir, thr)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // brute force all ~2M id pairs once at test scale (2k vectors) —
    // the ground truth the cluster-scoped candidates are judged by
    val e = graft.operators.Similarity.normalizeOf(
      graft.sources.Tables.embeddings(spark, dir)).cache()
    val cos = graft.functions.VectorExpressions
      .dot_product(col("a.v"), col("b.v"))
    val exact = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .filter(round(cos, 6) >= thr)
      .select(col("a.vec_id"), col("b.vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    e.unpersist()
    // precision 1.0: every emitted pair is a true near-dup (cosine is
    // verified exactly, candidates only bound WHICH pairs are seen)
    assert(sem.subsetOf(exact), s"false positives: ${sem.diff(exact).take(3)}")
    // recall is the cluster-scoping trade (cross-cell pairs unseen);
    // with k=8 cells over 10 latent labels it must stay material
    val recall = sem.size.toDouble / exact.size
    assert(recall >= 0.25, s"semdedup recall $recall at sf0.1")
  }
}
