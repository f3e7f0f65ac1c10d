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
}
