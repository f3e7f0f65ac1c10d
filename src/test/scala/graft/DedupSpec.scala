package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite with SparkSpec {

  test("exactDedupGroups keeps min-id survivor and counts group sizes") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "x"))
      .toDF("doc_id", "text")
    val g = Dedup.exactDedupGroups(df, $"text", $"doc_id")
      .orderBy($"survivor_id").collect()
    assert(g.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((1L, 3L), (3L, 1L)))
  }

  test("bag dedup catches every reversed twin that exact dedup misses") {
    import spark.implicits._
    val (nIn, bagGroups, bagRemoved, exactRemoved, orderOnly) =
      Dedup.dedupBag(spark, sf).as[(Long, Long, Long, Long, Long)].head()
    val docs = graft.sources.Tables.documents(spark, sf)
    val nDocs = docs.count()
    val nTwins = docs.filter($"doc_id" % 10 === 0).count()
    assert(nIn == nDocs + nTwins)
    // a reversed token sequence is a DIFFERENT string (none of these
    // documents are palindromic word soups) but the SAME bag: the
    // planted twins are invisible to exact dedup and fully visible
    // to the bag fingerprint
    assert(orderOnly >= nTwins,
      s"bag gap $orderOnly below the $nTwins planted twins " +
        s"(bag $bagRemoved, exact $exactRemoved)")
    assert(bagRemoved >= nTwins, s"bag missed planted twins: $bagRemoved < $nTwins")
    assert(bagGroups == nIn - bagRemoved, "groups + removals must partition")
  }

  test("minhash LSH finds exactly the brute-force near-dup pairs (100% recall here)") {
    import spark.implicits._
    // Brute force ground truth at test scale ONLY (the operator never
    // does this): all-pairs shingle Jaccard >= 0.8.
    val docs = graft.sources.Tables.documents(spark, sf)
    val sets = docs.select($"doc_id",
      array_distinct(graft.functions.TextAnalysis.shingles(
        graft.functions.TextAnalysis.tokens($"text"), 3)).as("shs"))
      .filter(size($"shs") > 0)
    val brute = sets.select($"doc_id".as("a"), $"shs".as("sa"))
      .crossJoin(sets.select($"doc_id".as("b"), $"shs".as("sb")))
      .filter($"a" < $"b")
      .withColumn("inter", size(array_intersect($"sa", $"sb")))
      .withColumn("j", $"inter".cast("double") / (size($"sa") + size($"sb") - $"inter"))
      .filter($"j" >= 0.8)
      .select($"a", $"b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minHashNearDups(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == brute)
    assert(lsh.nonEmpty) // the fixture plants near-dups; empty would mean a broken pipeline
  }

  test("candidate generation is bucket-bounded, not all-pairs") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
    val n = docs.count()
    val sets = docs.select($"doc_id",
      array_distinct(graft.functions.TextAnalysis.shingles(
        graft.functions.TextAnalysis.tokens($"text"), 3)).as("shs"))
      .filter(size($"shs") > 0)
    val buckets = Dedup.bandedBuckets(Dedup.minHashSignatures(sets))
    val nCandidates = buckets.as("x")
      .join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id")).distinct().count()
    // all-pairs would be n*(n-1)/2; buckets must cut that by >10x
    assert(nCandidates * 10 < n * (n - 1) / 2,
      s"candidates $nCandidates not bucket-bounded vs n=$n")
  }

  test("connected components merge transitive near-dup chains") {
    import spark.implicits._
    // chain 1-2-3 plus isolated pair 10-11 → clusters {1,2,3} and {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components: 100-node chain (diameter >> 20) converges exactly") {
    import spark.implicits._
    // pointer doubling must reach the fixpoint in O(log diameter)
    // iterations — the old edge-only propagation would need 100 and
    // previously returned WRONG partial labels silently at maxIter=20
    val pairs = (0L until 100L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 101)
    assert(cc.values.forall(_ == 0L), "every chain node must label to the min id 0")
  }

  test("connected components fail loudly instead of returning partial labels") {
    import spark.implicits._
    // maxIter = 1 cannot converge a 5-node chain — must throw, never
    // hand back labels a downstream dedupApply would silently act on
    val pairs = (0L until 5L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(pairs, maxIter = 1).collect()
    }
  }

  test("simhash approximates the verified near-dup set (bounded errors)") {
    import spark.implicits._
    val sim = Dedup.simHashNearDups(spark, sf)
      .select($"doc_a", $"doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val verified = Dedup.ngramJaccardPairs(spark, sf, threshold = 0.5)
      .select($"doc_a", $"doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // SimHash is a signature-distance heuristic, not a verified
    // operator (that's MinHash+verify): on the planted ~0.98-jaccard
    // pairs it must recover most pairs with few spurious ones.
    val recall = sim.intersect(verified).size.toDouble / verified.size
    assert(recall >= 0.7, s"simhash recall $recall too low")
    assert(sim.diff(verified).size <= 2,
      s"simhash false positives: ${sim.diff(verified)}")
  }

  test("containment catches the short-doc-inside-long-doc dup Jaccard misses") {
    import spark.implicits._
    val quote = "the quick brown fox jumps over the lazy dog tonight"
    val filler = (1 to 60).map(i => s"filler$i word$i extra$i").mkString(" ")
    // doc 7 (HIGH id, SMALL set) is quoted whole inside doc 2
    val docs = Seq(
      (2L, s"$filler $quote $filler"),
      (7L, quote),
      (9L, "an entirely unrelated document about different things altogether")
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup.containmentPairsOf(docs, threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSeq
    // direction: the smaller-set doc is the contained one, id order aside
    assert(got.map(p => (p._1, p._2)) == Seq((7L, 2L)), s"got $got")
    assert(got.head._3 >= 0.99, "full quote → containment ~1")
    // the same pair is invisible to Jaccard at any useful threshold:
    // the long doc's shingles dominate the union
    val j = graft.operators.Dedup.ngramJaccardPairsOf(docs, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(!j.exists(p => p._1 == 2L && p._2 == 7L), s"jaccard found $j")
  }

  test("minhash estimate error: covers the dedup pairs, bounded, accurate where it matters") {
    import spark.implicits._
    val est = graft.operators.Dedup.minHashEstError(spark, sf)
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(est.nonEmpty)
    est.foreach { case (a, b, n, ej, xj, err) =>
      assert(a < b)
      assert(n >= 0 && n <= 16)
      assert(ej == n / 16.0)
      assert(xj >= 0.0 && xj <= 1.0)
      assert(math.abs(err - math.abs(ej - xj)) < 1e-6 + 5e-7)
    }
    // every verified near-dup pair is a candidate pair scored here
    val dups = graft.operators.Dedup.minHashNearDups(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    val scored = est.map(r => (r._1, r._2)).toSet
    dups.foreach { case (a, b, _) => assert(scored((a, b)), s"pair $a,$b unscored") }
    // an identical pair of signatures estimates 1.0; and on the
    // near-identical pairs the buckets select for, the sketch is
    // close on average — 16 components give ±1/16 granularity, so
    // demand mean |err| under 3 components' worth
    val meanErr = est.map(_._6).sum / est.size
    assert(meanErr <= 3.0 / 16.0, s"mean abs err $meanErr")
  }

  test("cross-source dupes: matrix mass equals the pair stream, sources verified") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
    val matrix = Dedup.crossSourceDupesOf(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val pairs = Dedup.minHashNearDupsOf(docs)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(matrix.values.sum == pairs.length.toLong,
      "every near-dup pair lands in exactly one matrix cell")
    // replay the cell assignment driver-side
    val src = docs.select($"doc_id", $"source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = pairs.map { case (a, b) =>
      val (sa, sb) = (src(a), src(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(matrix === expect)
    matrix.keys.foreach { case (lo, hi) => assert(lo <= hi) }
  }

  test("dedup sweep: monotone in the cut, anchored at the production threshold") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
    val rows = Dedup.dedupSweepOf(docs).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Dedup.DedupSweepThresholds)
    val pairs = rows.map(_._2)
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b },
      s"tighter cut cannot keep more pairs: $pairs")
    // the 0.8 grid point equals the production near-dup query
    val prod = Dedup.minHashNearDupsOf(docs).count()
    assert(rows.find(_._1 == 0.8).get._2 == prod)
    rows.foreach { case (_, _, f) => assert(f >= 0.0 && f <= 1.0) }
  }

  test("LSH tuning card: S-curve monotone in bands, exact on an identical pair") {
    import spark.implicits._
    // identical pair → jaccard 1 → every banding catches it with p=1
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val card = Dedup.lshTuningOf(docs)
      .as[(Long, Long, Double, Long, Long, Double)].collect()
    assert(card.length == Dedup.LshGrid.length)
    card.foreach { case (b, r, t, nc, nt, ec) =>
      assert(b * r == 16)
      assert(nc == 1 && nt == 1, s"($b,$r): candidates $nc target $nt")
      assert(ec == 1.0, s"($b,$r): exp_caught $ec for an identical pair")
      assert(t == Dedup.lshThreshold(b.toInt, r.toInt))
    }
    // corpus: more bands (with b·r fixed) can only raise the catch
    // expectation and lower the soft threshold — the S-curve algebra
    val corpus = Dedup.lshTuning(spark, sf)
      .as[(Long, Long, Double, Long, Long, Double)].collect()
      .sortBy(_._1)
    corpus.sliding(2).foreach {
      case Array((_, _, t1, _, n1, e1), (_, _, t2, _, n2, e2)) =>
        assert(t2 < t1 && e2 >= e1 && n2 >= n1)
      case _ =>
    }
  }

  test("square-and-multiply ladder: odd exponents exact, Column and SQL ladders agree") {
    import spark.implicits._
    // the round-10 advice case: n=3 must be c^3, not c^2 — and both
    // ladders must multiply in the identical association for every n,
    // so a future non-power-of-two LshGrid row cannot silently
    // diverge the two engines (they share the recursion, so the
    // differential oracle alone could never catch it)
    def ladder(n: Int): Double =
      if (n == 1) 0.7
      else {
        val h = ladder(n / 2); val sq = h * h
        if (n % 2 == 1) sq * 0.7 else sq
      }
    (1 to 9).foreach { n =>
      val viaCol = spark.range(1)
        .select(Dedup.powIntCol(lit(0.7), n).as("v")).head().getDouble(0)
      val viaSql = spark
        .sql(s"SELECT ${Dedup.powIntSql("CAST(0.7 AS DOUBLE)", n)} AS v")
        .head().getDouble(0)
      assert(viaCol == ladder(n), s"n=$n Column ladder")
      assert(viaSql == ladder(n), s"n=$n SQL ladder")
    }
    intercept[IllegalArgumentException](Dedup.powIntCol(lit(1.0), 0))
    intercept[IllegalArgumentException](Dedup.powIntSql("x", -1))
  }
}
